"""Logical-error-rate parity against the actual reference implementation.

The north-star target requires throughput *at matched LER*
(BASELINE.md). This test decodes the SAME sampled syndromes with the
reference C++ BP+OSD (compiled from the read-only reference headers via
native/bench_baseline.cpp) and with this framework, and asserts the two
logical-error rates agree within combined Monte-Carlo error. Skipped when
the reference tree or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest
import scipy.sparse

from ldpc_tpu import BeliefFindDecoder, BpLsdDecoder, BpOsdDecoder
from ldpc_tpu.codes import surface_code

REF = "/root/reference"
PCMS = os.path.join(REF, "python_test", "pcms")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src_cpp"))
    or shutil.which("g++") is None,
    reason="reference tree or C++ toolchain unavailable",
)


def _build_binary():
    # Single source of truth for compiling the reference driver —
    # bench_baseline.cpp needs the mbp.hpp iterator shim include dir,
    # which only utils/reference_baseline.py knows how to stage.
    from ldpc_tpu.utils import reference_baseline as rb

    path = rb.build_binary()
    if path is None:
        pytest.skip("reference baseline binary failed to build")
    return path


def _reference_decode(
    H,
    channel,
    syndromes,
    max_iter,
    ms_factor,
    osd_method=0,
    osd_order=0,
    decoder="osd",
):
    """Decode with the compiled reference (BP + {osd,lsd,uf-*})."""
    m, n = H.shape
    lines = [f"{m} {n}"]
    lines += [" ".join(map(str, row)) for row in H]
    lines.append(" ".join(f"{p:.10f}" for p in channel))
    lines.append(str(len(syndromes)))
    lines += [" ".join(map(str, s)) for s in syndromes]
    out = subprocess.run(
        [
            _build_binary(),
            str(max_iter),
            str(ms_factor),
            str(osd_method),
            str(osd_order),
            "1",
            decoder,
        ],
        input="\n".join(lines),
        capture_output=True,
        text=True,
        check=True,
        timeout=1800,
    ).stdout.splitlines()
    rows = [
        np.frombuffer(line.encode(), np.uint8) - ord("0")
        for line in out[1:]
        if line
    ]
    return np.stack(rows).astype(np.uint8)


def _assert_ler_parity(ref_fail, our_fail, B, floor=8):
    """Binomial 4-sigma window on the difference of the two estimates."""
    ler_ref, ler_our = ref_fail.mean(), our_fail.mean()
    pbar = (ler_ref + ler_our) / 2
    sigma = np.sqrt(max(2 * pbar * (1 - pbar) / B, 1e-12))
    assert abs(ler_ref - ler_our) <= max(4 * sigma, floor / B), (
        ler_ref,
        ler_our,
    )
    return ler_ref, ler_our


def _logical_fails(errors, decodings, lx):
    return (((errors ^ decodings) @ lx.T % 2) != 0).any(axis=1)


def test_surface_d13_ler_matches_reference():
    code = surface_code(13, compute_logicals=True)
    H = np.asarray(code.hx.todense(), np.uint8)
    lx = np.asarray(code.lx.todense(), np.uint8)
    p, max_iter, alpha = 0.03, 30, 0.625
    rng = np.random.default_rng(42)
    B = 4096
    errors = (rng.random((B, H.shape[1])) < p).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)

    ref = _reference_decode(H, np.full(H.shape[1], p), syndromes, max_iter, alpha)
    assert ((ref @ H.T) % 2 == syndromes).all()
    ref_fail = (((errors ^ ref) @ lx.T % 2) != 0).any(axis=1)

    dec = BpOsdDecoder(
        code.hx,
        error_rate=p,
        max_iter=max_iter,
        bp_method="ms",
        ms_scaling_factor=alpha,
        schedule="parallel",
        osd_method="osd_0",
    )
    ours = dec.decode_batch(syndromes)
    assert ((ours @ H.T) % 2 == syndromes).all()
    our_fail = (((errors ^ ours) @ lx.T % 2) != 0).any(axis=1)

    ler_ref, ler_our = ref_fail.mean(), our_fail.mean()
    # binomial 4-sigma window on the DIFFERENCE of the two estimates
    pbar = (ler_ref + ler_our) / 2
    sigma = np.sqrt(max(2 * pbar * (1 - pbar) / B, 1e-12))
    assert abs(ler_ref - ler_our) <= max(4 * sigma, 8 / B), (
        ler_ref,
        ler_our,
    )
    # the bulk of decodings should be literally identical (same algorithm;
    # the reference runs f64 messages vs our f32, so marginal trajectories
    # diverge on a fraction of the hard cases)
    assert (ref == ours).all(axis=1).mean() > 0.8


def _load_fixture(name):
    path = os.path.join(PCMS, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    return np.asarray(
        scipy.sparse.load_npz(path).todense(), dtype=np.uint8
    )


def _sample(H, p, B, seed):
    rng = np.random.default_rng(seed)
    errors = (rng.random((B, H.shape[1])) < p).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)
    return errors, syndromes


def test_hgp_400_16_6_osd_cs3_ler_matches_reference():
    """BASELINE workload 1: [[400,16,6]] HGP, p=0.01, BP(ms 0.625, 5 it)
    + OSD-CS-3 (reference python_test/test_qcodes.py:95-160)."""
    H = _load_fixture("hx_400_16_6.npz")
    lx = _load_fixture("lx_400_16_6.npz")
    p, max_iter, alpha = 0.01, 5, 0.625
    B = 4096
    errors, syndromes = _sample(H, p, B, seed=149)

    ref = _reference_decode(
        H, np.full(H.shape[1], p), syndromes, max_iter, alpha,
        osd_method=2, osd_order=3,
    )
    assert ((ref @ H.T) % 2 == syndromes).all()

    dec = BpOsdDecoder(
        scipy.sparse.csr_matrix(H), error_rate=p, max_iter=max_iter,
        bp_method="ms", ms_scaling_factor=alpha, schedule="parallel",
        osd_method="osd_cs", osd_order=3,
    )
    ours = dec.decode_batch(syndromes)
    assert ((ours @ H.T) % 2 == syndromes).all()

    _assert_ler_parity(
        _logical_fails(errors, ref, lx),
        _logical_fails(errors, ours, lx),
        B,
    )


def test_hgp_400_16_6_belief_find_ler_matches_reference():
    """BASELINE workload 1, BeliefFind (inversion) variant
    (reference python_test/test_qcodes.py:210-234)."""
    H = _load_fixture("hx_400_16_6.npz")
    lx = _load_fixture("lx_400_16_6.npz")
    p, max_iter, alpha = 0.01, 5, 0.625
    B = 4096
    errors, syndromes = _sample(H, p, B, seed=149)

    ref = _reference_decode(
        H, np.full(H.shape[1], p), syndromes, max_iter, alpha,
        decoder="uf-matrix",
    )
    dec = BeliefFindDecoder(
        scipy.sparse.csr_matrix(H), error_rate=p, max_iter=max_iter,
        bp_method="ms", ms_scaling_factor=alpha, schedule="parallel",
        uf_method="inversion",
    )
    ours = dec.decode_batch(syndromes)
    # both sides must return syndrome-valid corrections
    assert ((ref @ H.T) % 2 == syndromes).all()
    assert ((ours @ H.T) % 2 == syndromes).all()
    _assert_ler_parity(
        _logical_fails(errors, ref, lx),
        _logical_fails(errors, ours, lx),
        B,
    )


def test_hgp_400_16_6_lsd0_ler_matches_reference():
    """BASELINE workload 1, BP+LSD-0 variant
    (reference python_test/test_qcodes.py:210-234)."""
    H = _load_fixture("hx_400_16_6.npz")
    lx = _load_fixture("lx_400_16_6.npz")
    p, max_iter, alpha = 0.01, 5, 0.625
    B = 4096
    errors, syndromes = _sample(H, p, B, seed=149)

    ref = _reference_decode(
        H, np.full(H.shape[1], p), syndromes, max_iter, alpha,
        osd_method=0, osd_order=0, decoder="lsd",
    )
    dec = BpLsdDecoder(
        scipy.sparse.csr_matrix(H), error_rate=p, max_iter=max_iter,
        bp_method="ms", ms_scaling_factor=alpha, schedule="parallel",
        lsd_method="lsd_0", lsd_order=0,
    )
    ours = dec.decode_batch(syndromes)
    assert ((ref @ H.T) % 2 == syndromes).all()
    assert ((ours @ H.T) % 2 == syndromes).all()
    _assert_ler_parity(
        _logical_fails(errors, ref, lx),
        _logical_fails(errors, ours, lx),
        B,
    )


def test_toric_d20_osd_cs5_ler_matches_reference():
    """BASELINE workload 2: [[800,2,20]] toric, p=0.05, BP(ms 0.625,
    10 it) + OSD-CS-5 (reference python_test/test_qcodes.py:322-422)."""
    H = _load_fixture("hx_toric_20.npz")
    lx = _load_fixture("lx_toric_20.npz")
    p, max_iter, alpha = 0.05, 10, 0.625
    B = 1024
    errors, syndromes = _sample(H, p, B, seed=42)

    ref = _reference_decode(
        H, np.full(H.shape[1], p), syndromes, max_iter, alpha,
        osd_method=2, osd_order=5,
    )
    assert ((ref @ H.T) % 2 == syndromes).all()

    dec = BpOsdDecoder(
        scipy.sparse.csr_matrix(H), error_rate=p, max_iter=max_iter,
        bp_method="ms", ms_scaling_factor=alpha, schedule="parallel",
        osd_method="osd_cs", osd_order=5,
    )
    ours = dec.decode_batch(syndromes)
    assert ((ours @ H.T) % 2 == syndromes).all()

    _assert_ler_parity(
        _logical_fails(errors, ref, lx),
        _logical_fails(errors, ours, lx),
        B,
        floor=16,
    )


def test_surface_d20_osd_cs5_ler_matches_reference():
    """BASELINE workload 3: [[761,1,20]] surface, p=0.05, BP(ms 0.625,
    10 it) + OSD-CS-5 (reference python_test/test_qcodes.py:433-533)."""
    H = _load_fixture("hx_surface_20.npz")
    lx = _load_fixture("lx_surface_20.npz")
    p, max_iter, alpha = 0.05, 10, 0.625
    B = 1024
    errors, syndromes = _sample(H, p, B, seed=42)

    ref = _reference_decode(
        H, np.full(H.shape[1], p), syndromes, max_iter, alpha,
        osd_method=2, osd_order=5,
    )
    assert ((ref @ H.T) % 2 == syndromes).all()

    dec = BpOsdDecoder(
        scipy.sparse.csr_matrix(H), error_rate=p, max_iter=max_iter,
        bp_method="ms", ms_scaling_factor=alpha, schedule="parallel",
        osd_method="osd_cs", osd_order=5,
    )
    ours = dec.decode_batch(syndromes)
    assert ((ours @ H.T) % 2 == syndromes).all()

    _assert_ler_parity(
        _logical_fails(errors, ref, lx),
        _logical_fails(errors, ours, lx),
        B,
        floor=16,
    )


def test_toric_d20_lsd5_ler_matches_reference():
    """BASELINE workload 2, BP+LSD-CS-5 variant
    (reference python_test/test_qcodes.py:406-422)."""
    H = _load_fixture("hx_toric_20.npz")
    lx = _load_fixture("lx_toric_20.npz")
    p, max_iter, alpha = 0.05, 10, 0.625
    B = 512
    errors, syndromes = _sample(H, p, B, seed=42)

    ref = _reference_decode(
        H, np.full(H.shape[1], p), syndromes, max_iter, alpha,
        osd_method=2, osd_order=5, decoder="lsd",
    )
    dec = BpLsdDecoder(
        scipy.sparse.csr_matrix(H), error_rate=p, max_iter=max_iter,
        bp_method="ms", ms_scaling_factor=alpha, schedule="parallel",
        lsd_method="lsd_cs", lsd_order=5,
    )
    ours = dec.decode_batch(syndromes)
    assert ((ref @ H.T) % 2 == syndromes).all()
    assert ((ours @ H.T) % 2 == syndromes).all()
    _assert_ler_parity(
        _logical_fails(errors, ref, lx),
        _logical_fails(errors, ours, lx),
        B,
        floor=16,
    )
