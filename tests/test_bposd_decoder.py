"""BpOsdDecoder API and behavior tests (reference: python_test/test_bposd.py)."""

import itertools

import numpy as np
import pytest

from ldpc_tpu import BpOsdDecoder
from ldpc_tpu.codes import hamming_code, rep_code, surface_code


def test_constructor_defaults():
    H = rep_code(3)
    d = BpOsdDecoder(H, error_rate=0.1)
    assert d.osd_method == "OSD_0"
    assert d.osd_order == 0
    assert d.input_vector_type == "syndrome"


def test_osd_method_aliases():
    H = rep_code(3)
    for alias in ("osd_0", "0", "osd0"):
        assert BpOsdDecoder(H, error_rate=0.1, osd_method=alias).osd_method == "OSD_0"
    for alias in ("osd_e", "e", "exhaustive"):
        d = BpOsdDecoder(H, error_rate=0.1, osd_method=alias, osd_order=2)
        assert d.osd_method == "OSD_E"
    for alias in ("osd_cs", "1", "cs", "combination_sweep"):
        d = BpOsdDecoder(H, error_rate=0.1, osd_method=alias, osd_order=2)
        assert d.osd_method == "OSD_CS"
    for alias in ("off", "osd_off", "deactivated"):
        assert BpOsdDecoder(H, error_rate=0.1, osd_method=alias).osd_method == "OSD_OFF"
    with pytest.raises(ValueError):
        BpOsdDecoder(H, error_rate=0.1, osd_method="nonsense")


def test_osd_order_validation():
    H = rep_code(3)
    with pytest.raises(ValueError):
        BpOsdDecoder(H, error_rate=0.1, osd_method="osd_e", osd_order=-1)
    with pytest.raises(ValueError):
        d = BpOsdDecoder(H, error_rate=0.1, osd_method="osd_0")
        d.osd_order = 2  # OSD_0 requires order 0
    with pytest.warns(UserWarning):
        BpOsdDecoder(H, error_rate=0.1, osd_method="osd_e", osd_order=16)


def test_zero_syndrome():
    H = rep_code(5)
    d = BpOsdDecoder(H, error_rate=0.1)
    out = d.decode(np.zeros(4, dtype=np.uint8))
    assert not out.any()
    assert d.converge


def test_syndrome_length_validation():
    H = rep_code(5)
    d = BpOsdDecoder(H, error_rate=0.1)
    with pytest.raises(ValueError):
        d.decode(np.zeros(5, dtype=np.uint8))


@pytest.mark.parametrize("method,order", [("osd_0", 0), ("osd_e", 4), ("osd_cs", 4)])
def test_hamming_exhaustive_always_valid(method, order):
    """OSD guarantees a valid solution for every in-image syndrome."""
    H = hamming_code(3)
    d = BpOsdDecoder(
        H, error_rate=0.05, max_iter=8, osd_method=method, osd_order=order
    )
    for bits in itertools.product([0, 1], repeat=3):
        s = np.array(bits, dtype=np.uint8)
        out = d.decode(s)
        assert ((H @ out) % 2 == s).all()


def test_result_properties():
    H = hamming_code(3)
    d = BpOsdDecoder(H, error_rate=0.05, max_iter=2, osd_method="osd_cs", osd_order=2)
    s = np.array([1, 1, 1], dtype=np.uint8)
    out = d.decode(s)
    assert d.bp_decoding.shape == (7,)
    assert d.osd0_decoding.shape == (7,)
    assert d.osdw_decoding.shape == (7,)
    assert (d.decoding == out).all()
    if not d.converge:
        # osdw decoding is the returned decoding on BP failure
        assert (d.osdw_decoding == out).all()


def test_batch_matches_loop():
    code = surface_code(3)
    H = code.hx
    d = BpOsdDecoder(
        H, error_rate=0.05, max_iter=4, osd_method="osd_cs", osd_order=3
    )
    rng = np.random.default_rng(11)
    errors = (rng.random((24, H.shape[1])) < 0.08).astype(np.uint8)
    syn = np.asarray(errors @ H.T.todense() % 2, dtype=np.uint8)
    batch_out = d.decode_batch(syn)
    assert ((batch_out @ H.T.todense() % 2) == syn).all()
    for i in range(syn.shape[0]):
        single = d.decode(syn[i])
        assert (single == batch_out[i]).all(), i


def test_osd_beats_bp_on_hard_syndromes():
    """On the quantum code, BP alone fails where BP+OSD succeeds."""
    code = surface_code(5)
    H = code.hx
    rng = np.random.default_rng(5)
    errors = (rng.random((64, H.shape[1])) < 0.06).astype(np.uint8)
    syn = np.asarray(errors @ H.T.todense() % 2, dtype=np.uint8)
    d = BpOsdDecoder(H, error_rate=0.06, max_iter=10, osd_method="osd_0")
    out = d.decode_batch(syn)
    assert ((out @ H.T.todense() % 2) == syn).all()  # OSD always valid
    assert not d.converge_batch.all()  # BP alone failed on some


def test_bit_packed_io_kwargs():
    """decode_batch accepts stim-b8 bit-packed syndromes and can return
    bit-packed decodings, across the BP-family decoders."""
    from ldpc_tpu import BeliefFindDecoder, BpDecoder, BpLsdDecoder

    code = surface_code(5)
    H = code.hx
    rng = np.random.default_rng(3)
    errors = (rng.random((32, H.shape[1])) < 0.04).astype(np.uint8)
    syn = np.asarray(errors @ H.T.todense() % 2, dtype=np.uint8)
    packed_syn = np.packbits(syn, axis=1, bitorder="little")

    for dec in (
        BpOsdDecoder(H, error_rate=0.04, max_iter=12, osd_method="osd_0"),
        BpDecoder(H, error_rate=0.04, max_iter=12),
        BpLsdDecoder(H, error_rate=0.04, max_iter=12, lsd_order=0),
        BeliefFindDecoder(H, error_rate=0.04, max_iter=12),
    ):
        want = dec.decode_batch(syn)
        got = dec.decode_batch(packed_syn, bit_packed_syndromes=True)
        assert np.array_equal(want, got), type(dec).__name__
        got_packed = dec.decode_batch(
            packed_syn, bit_packed_syndromes=True, bit_packed_output=True
        )
        assert np.array_equal(
            np.packbits(want, axis=1, bitorder="little"), got_packed
        ), type(dec).__name__


def test_bit_packed_input_validation():
    code = surface_code(3)
    d = BpOsdDecoder(code.hx, error_rate=0.05, max_iter=5)
    bad = np.zeros((4, 99), np.uint8)
    with pytest.raises(ValueError, match="Bit-packed"):
        d.decode_batch(bad, bit_packed_syndromes=True)
