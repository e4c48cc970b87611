"""MBP (GF(4)) decoder tests (reference behavior: src_cpp/mbp.hpp,
cpp_test/TestMbp.cpp pattern: decode known Pauli errors on small codes)."""

import numpy as np
import pytest

from ldpc_tpu import MbpDecoder, mbp_decoder
from ldpc_tpu.codes import surface_code
from ldpc_tpu.ops.mbp import pauli_syndrome


def steane_gf4():
    """The [[7,1,3]] Steane code as a GF(4) stabilizer matrix."""
    H = np.array(
        [
            [0, 0, 0, 1, 1, 1, 1],
            [0, 1, 1, 0, 0, 1, 1],
            [1, 0, 1, 0, 1, 0, 1],
        ],
        np.uint8,
    )
    return np.vstack([H * 1, H * 3]).astype(np.uint8)  # X block, Z block


def test_mbp_identity_alias():
    assert mbp_decoder is MbpDecoder


def test_mbp_single_pauli_errors_steane():
    Hgf4 = steane_gf4()
    dec = MbpDecoder(
        Hgf4=Hgf4, error_rate=0.1, max_iter=30, alpha_parameter=0.65
    )
    ok = 0
    for q in range(7):
        for p in (1, 2, 3):
            e = np.zeros(7, np.uint8)
            e[q] = p
            s = pauli_syndrome(Hgf4, e[None, :])[0].astype(np.uint8)
            out = dec.decode(s)
            if dec.converge:
                cand = pauli_syndrome(Hgf4, out[None, :].astype(np.uint8))[0]
                assert np.array_equal(cand, s)
                ok += 1
    assert ok >= 15  # the bulk of single-Pauli errors decode


def test_mbp_zero_syndrome():
    dec = MbpDecoder(Hgf4=steane_gf4(), error_rate=0.05, max_iter=10)
    out = dec.decode(np.zeros(6, np.uint8))
    assert not out.any()
    assert dec.converge


def test_mbp_css_pair_output():
    code = surface_code(3)
    hx = np.asarray(code.hx.todense(), np.uint8)
    hz = np.asarray(code.hz.todense(), np.uint8)
    dec = MbpDecoder(
        HX_CSS=hx, HZ_CSS=hz, error_rate=0.05, max_iter=30,
        alpha_parameter=0.65,
    )
    # single X error on qubit 0 -> syndrome only on HZ checks (sx block)
    e = np.zeros(hx.shape[1], np.uint8)
    e[0] = 1
    sx = hz @ e % 2
    sz = hx @ np.zeros_like(e) % 2
    outx, outz = dec.decode(sx=sx.astype(np.uint8), sz=sz.astype(np.uint8))
    if dec.converge:
        assert np.array_equal(hz @ outx % 2, sx)
        assert np.array_equal(hx @ outz % 2, sz)


def test_mbp_validation():
    with pytest.raises(ValueError, match="GF4 parity check"):
        MbpDecoder(error_rate=0.1)
    with pytest.raises(ValueError, match="columns"):
        MbpDecoder(
            HX_CSS=np.eye(3, 4, dtype=np.uint8),
            HZ_CSS=np.eye(3, 5, dtype=np.uint8),
            error_rate=0.1,
        )
    with pytest.raises(ValueError, match="BP method"):
        MbpDecoder(Hgf4=steane_gf4(), error_rate=0.1, bp_method="bogus")
    with pytest.warns(UserWarning):
        MbpDecoder(
            Hgf4=steane_gf4(),
            error_rate=0.1,
            error_channel=np.full((3, 7), 0.03),
        )


def test_mbp_min_sum_runs():
    Hgf4 = steane_gf4()
    dec = MbpDecoder(
        Hgf4=Hgf4, error_rate=0.1, max_iter=30, bp_method="min_sum",
        alpha_parameter=0.65, gamma_parameter=0.9,
    )
    e = np.zeros(7, np.uint8)
    e[2] = 1
    s = pauli_syndrome(Hgf4, e[None, :])[0].astype(np.uint8)
    out = dec.decode(s)
    if dec.converge:
        cand = pauli_syndrome(Hgf4, out[None, :].astype(np.uint8))[0]
        assert np.array_equal(cand, s)


def test_mbp_batch_matches_single():
    Hgf4 = steane_gf4()
    dec = MbpDecoder(Hgf4=Hgf4, error_rate=0.1, max_iter=20, alpha_parameter=0.65)
    errs = np.zeros((4, 7), np.uint8)
    errs[0, 1] = 1
    errs[1, 3] = 3
    errs[2, 5] = 2
    syn = pauli_syndrome(Hgf4, errs).astype(np.uint8)
    batch = dec.decode_batch(syn)
    for i in range(4):
        single = dec.decode_batch(syn[i : i + 1])[0]
        assert np.array_equal(single, batch[i])
