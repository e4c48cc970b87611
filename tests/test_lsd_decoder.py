"""LSD decoder tests (reference behavior: src_cpp/lsd.hpp,
python_test/test_bplsd.py / test_qcodes.py patterns)."""

import numpy as np
import pytest

from ldpc_tpu import BpLsdDecoder, LsdDecoder
from ldpc_tpu.codes import hamming_code, rep_code, ring_code, surface_code


def all_syndromes(m):
    return (
        (np.arange(2**m)[:, None] >> np.arange(m)[None, :]) & 1
    ).astype(np.uint8)


def test_lsd0_hamming_exhaustive():
    H = hamming_code(3)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = LsdDecoder(H, bits_per_step=1)
    syn = all_syndromes(3)
    weights = np.ones(Hd.shape[1])
    out = dec.decode_batch(syn, weights)
    assert dec.valid_batch.all()
    assert np.array_equal((out @ Hd.T) % 2, syn)


@pytest.mark.parametrize("method,order", [("lsd_cs", 3), ("lsd_e", 3)])
def test_lsdw_hamming_exhaustive(method, order):
    H = hamming_code(3)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = LsdDecoder(H, bits_per_step=1, lsd_method=method, lsd_order=order)
    syn = all_syndromes(3)
    weights = 0.3 + 0.1 * np.arange(Hd.shape[1])
    out = dec.decode_batch(syn, weights)
    assert dec.valid_batch.all()
    assert np.array_equal((out @ Hd.T) % 2, syn)


def test_lsdw_not_heavier_than_lsd0():
    """Higher-order candidates may only lower the solution weight."""
    code = surface_code(5)
    Hd = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(3)
    errors = (rng.random((64, Hd.shape[1])) < 0.08).astype(np.uint8)
    syn = (errors @ Hd.T % 2).astype(np.uint8)
    w = rng.random(Hd.shape[1]) + 0.5
    d0 = LsdDecoder(code.hx, bits_per_step=1)
    d5 = LsdDecoder(code.hx, bits_per_step=1, lsd_method="lsd_cs", lsd_order=5)
    out0 = d0.decode_batch(syn, w)
    out5 = d5.decode_batch(syn, w)
    assert np.array_equal((out0 @ Hd.T) % 2, syn)
    assert np.array_equal((out5 @ Hd.T) % 2, syn)
    assert (out5.sum(axis=1) <= out0.sum(axis=1)).all()
    assert (out5.sum(axis=1) < out0.sum(axis=1)).any()


def test_bplsd_surface_code():
    code = surface_code(5)
    Hd = np.asarray(code.hx.todense(), np.uint8)
    dec = BpLsdDecoder(
        code.hx,
        error_rate=0.05,
        max_iter=5,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        bits_per_step=1,
        lsd_method="lsd_cs",
        lsd_order=3,
    )
    rng = np.random.default_rng(149)
    errors = (rng.random((128, Hd.shape[1])) < 0.05).astype(np.uint8)
    syn = (errors @ Hd.T % 2).astype(np.uint8)
    out = dec.decode_batch(syn)
    assert np.array_equal((out @ Hd.T) % 2, syn)
    assert (~dec.converge_batch).any()  # LSD actually exercised


def test_bplsd_osd_compat_kwargs():
    dec = BpLsdDecoder(
        rep_code(10), error_rate=0.1, osd_method="osd_cs", osd_order=2
    )
    assert dec.lsd_method == "LSD_CS"
    assert dec.lsd_order == 2


def test_bplsd_validation():
    with pytest.raises(ValueError):
        BpLsdDecoder(rep_code(10), error_rate=0.1, lsd_order=-1)
    with pytest.raises(ValueError):
        BpLsdDecoder(rep_code(10), error_rate=0.1, lsd_method="bogus")
    dec = BpLsdDecoder(rep_code(10), error_rate=0.1)
    with pytest.raises(ValueError):
        dec.lsd_order = 2  # method is LSD_0
    with pytest.warns(UserWarning):
        d2 = BpLsdDecoder(
            rep_code(10), error_rate=0.1, lsd_method="lsd_e", lsd_order=16
        )


def test_bplsd_always_run_lsd():
    H = rep_code(10)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = BpLsdDecoder(
        H, error_rate=0.1, max_iter=20, always_run_lsd=True, bits_per_step=1
    )
    e = np.zeros(10, np.uint8)
    e[4] = 1
    s = (Hd @ e % 2).astype(np.uint8)
    out = dec.decode(s)
    assert np.array_equal(Hd @ out % 2, s)


def test_bplsd_stats_plumbing():
    dec = BpLsdDecoder(rep_code(10), error_rate=0.1, max_iter=3)
    assert dec.do_stats is False
    dec.set_do_stats(True)
    assert dec.do_stats is True
    s = np.zeros(9, np.uint8)
    s[2] = 1
    dec.decode(s)
    assert dec.statistics.elapsed_time > 0
    assert dec.statistics.syndrome == list(map(int, s))
    dec.set_additional_stat_fields([0], [1], [0])
    assert dec.statistics.error == [0]
    dec.reset_cluster_stats()
    assert dec.statistics.syndrome == []
    assert isinstance(dec.statistics.to_json(), str)


def test_bplsd_zero_syndrome():
    dec = BpLsdDecoder(rep_code(5), error_rate=0.1)
    x = dec.decode(np.zeros(4, np.uint8))
    assert not x.any() and dec.converge
