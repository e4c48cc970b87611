"""Quantum-code integration tests on the reference PCM fixtures.

Mirrors the reference's cross-decoder Monte-Carlo consistency strategy
(reference: python_test/test_qcodes.py:95-234): decode batches of real
HGP/surface-code syndromes with every decoder family at a fixed seed and
check (a) every returned correction reproduces its syndrome, (b) the
logical-error rates sit in sane, mutually consistent windows.

Fixture matrices are loaded from the reference checkout's data files
(python_test/pcms/*.npz — data, not code); tests skip if unavailable.
"""

import os

import numpy as np
import pytest
import scipy.sparse

from ldpc_tpu import BeliefFindDecoder, BpLsdDecoder, BpOsdDecoder

PCMS = "/root/reference/python_test/pcms"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PCMS), reason="reference PCM fixtures not mounted"
)


def _load(name):
    return scipy.sparse.load_npz(os.path.join(PCMS, name)).tocsr()


@pytest.fixture(scope="module")
def hgp_400():
    hx = _load("hx_400_16_6.npz")
    lx = _load("lx_400_16_6.npz")
    rng = np.random.default_rng(149)
    B = 2048
    p = 0.01
    errors = (rng.random((B, hx.shape[1])) < p).astype(np.uint8)
    syndromes = (errors @ hx.T.toarray() % 2).astype(np.uint8)
    return hx, lx, errors, syndromes, p


def _ler(hx, lx, errors, syndromes, decoder):
    out = decoder.decode_batch(syndromes)
    valid = ((out @ hx.T.toarray()) % 2 == syndromes).all(axis=1)
    residual = (errors ^ out) @ lx.T.toarray() % 2
    fails = (residual != 0).any(axis=1)
    return valid, float(fails.mean())


def test_hgp_400_16_6_cross_decoder_consistency(hgp_400):
    hx, lx, errors, syndromes, p = hgp_400
    common = dict(
        error_rate=p,
        max_iter=5,
        bp_method="ms",
        ms_scaling_factor=0.625,
        schedule="parallel",
    )
    results = {}
    osd0 = BpOsdDecoder(hx, osd_method="osd_0", **common)
    valid, results["osd0"] = _ler(hx, lx, errors, syndromes, osd0)
    assert valid.all()  # OSD always returns a syndrome-consistent solution

    osd_cs = BpOsdDecoder(hx, osd_method="osd_cs", osd_order=3, **common)
    valid, results["osd_cs3"] = _ler(hx, lx, errors, syndromes, osd_cs)
    assert valid.all()

    lsd = BpLsdDecoder(hx, lsd_order=0, **common)
    valid, results["lsd0"] = _ler(hx, lx, errors, syndromes, lsd)
    assert valid.all()

    bf = BeliefFindDecoder(hx, uf_method="inversion", **common)
    valid, results["belief_find"] = _ler(hx, lx, errors, syndromes, bf)
    assert valid.all()

    # the reference's published behavior for this workload: all decoders
    # land at a sub-percent LER at p=0.01 (test_qcodes.py:210-234)
    for name, ler in results.items():
        assert ler < 0.02, (name, ler, results)
    # higher-order OSD never does (statistically) worse than OSD-0
    assert results["osd_cs3"] <= results["osd0"] + 0.005, results


def test_surface_code_d5_fixture():
    hx = _load("hx_surface_5.npz")
    rng = np.random.default_rng(7)
    B = 1024
    errors = (rng.random((B, hx.shape[1])) < 0.05).astype(np.uint8)
    syndromes = (errors @ hx.T.toarray() % 2).astype(np.uint8)
    dec = BpOsdDecoder(
        hx,
        error_rate=0.05,
        max_iter=10,
        bp_method="ms",
        ms_scaling_factor=0.625,
        osd_method="osd_0",
    )
    out = dec.decode_batch(syndromes)
    assert ((out @ hx.T.toarray()) % 2 == syndromes).all()


from ldpc_tpu import UnionFindDecoder  # noqa: E402
from ldpc_tpu.codes import surface_code, toric_code  # noqa: E402


def _decoder_matrix(hx, p, max_iter=10):
    """The cross-decoder panel of the reference's big-code sweeps
    (reference: python_test/test_qcodes.py:322-533)."""
    common = dict(
        error_rate=p,
        max_iter=max_iter,
        bp_method="ms",
        ms_scaling_factor=0.625,
        schedule="parallel",
    )
    return {
        "bposd0": BpOsdDecoder(hx, osd_method="osd_0", **common),
        "bplsd0": BpLsdDecoder(hx, lsd_order=0, **common),
        "belief_find": BeliefFindDecoder(hx, uf_method="inversion", **common),
        "uf": UnionFindDecoder(hx, uf_method="inversion"),
    }


@pytest.mark.parametrize("distance", [4, 8, 12])
def test_surface_code_sweep_cross_decoder(distance):
    """Surface-code d-sweep: every decoder family returns syndrome-valid
    corrections and LERs fall in mutually consistent windows
    (reference: python_test/test_qcodes.py:95-234 pattern, scaled)."""
    code = surface_code(distance, compute_logicals=True)
    hx = code.hx
    Hd = np.asarray(hx.todense(), np.uint8)
    lx = np.asarray(code.lx.todense(), np.uint8)
    p = 0.04
    rng = np.random.default_rng(100 + distance)
    B = 256
    errors = (rng.random((B, Hd.shape[1])) < p).astype(np.uint8)
    syndromes = (errors @ Hd.T % 2).astype(np.uint8)

    lers = {}
    for name, dec in _decoder_matrix(hx, p).items():
        out = np.asarray(dec.decode_batch(syndromes)).astype(np.uint8)
        valid = ((out @ Hd.T) % 2 == syndromes).all(axis=1)
        assert valid.all(), (distance, name, int((~valid).sum()))
        fails = (((errors ^ out) @ lx.T % 2) != 0).any(axis=1)
        lers[name] = float(fails.mean())

    # at p=0.04 (below threshold) the BP+postprocessing family decodes
    # the bulk of shots; plain UF (no BP) is allowed to be worse
    for name in ("bposd0", "bplsd0", "belief_find"):
        assert lers[name] < 0.35, (distance, name, lers)
    # and the BP-guided decoders agree with each other within a loose
    # cross-decoder window (they share the same BP front end)
    vals = [lers[k] for k in ("bposd0", "bplsd0", "belief_find")]
    assert max(vals) - min(vals) < 0.15, (distance, lers)


@pytest.mark.parametrize(
    "name,loader",
    [
        ("surface_20", lambda: ("hx_surface_20.npz", "lx_surface_20.npz")),
        ("toric_20", lambda: ("hx_toric_20.npz", "lx_toric_20.npz")),
    ],
)
def test_d20_fixture_cross_decoder(name, loader):
    """The reference's own d=20 fixtures, decoded by the full panel at
    p=0.05 (reference: python_test/test_qcodes.py:322-533)."""
    hx_name, lx_name = loader()
    hx = _load(hx_name)
    Hd = np.asarray(hx.todense(), np.uint8)
    lx = np.asarray(_load(lx_name).todense(), np.uint8)
    p = 0.05
    rng = np.random.default_rng(42)
    B = 128
    errors = (rng.random((B, Hd.shape[1])) < p).astype(np.uint8)
    syndromes = (errors @ Hd.T % 2).astype(np.uint8)

    lers = {}
    for dname, dec in _decoder_matrix(hx, p).items():
        out = np.asarray(dec.decode_batch(syndromes)).astype(np.uint8)
        valid = ((out @ Hd.T) % 2 == syndromes).all(axis=1)
        assert valid.all(), (name, dname, int((~valid).sum()))
        fails = (((errors ^ out) @ lx.T % 2) != 0).any(axis=1)
        lers[dname] = float(fails.mean())
    # d=20 at p=0.05 sits below threshold for BP+OSD-style decoding
    assert lers["bposd0"] < 0.4, (name, lers)
