"""Flip / p-flip decoder tests (reference behavior: src_cpp/flip.hpp,
cpp_test/TestFlip.cpp exhaustive-syndrome pattern)."""

import numpy as np
import pytest

from ldpc_tpu import BpFlipDecoder, FlipDecoder
from ldpc_tpu.codes import hamming_code, rep_code, ring_code


def all_syndromes(m):
    return (
        (np.arange(2**m)[:, None] >> np.arange(m)[None, :]) & 1
    ).astype(np.uint8)


def test_flip_rep_code_single_errors():
    """Weight-1 errors on a rep code flip back exactly."""
    H = rep_code(10)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = FlipDecoder(H, max_iter=20, seed=3)
    for j in range(10):
        e = np.zeros(10, np.uint8)
        e[j] = 1
        s = Hd @ e % 2
        x = dec.decode(s)
        if dec.converge:
            assert np.array_equal(Hd @ x % 2, s)


def test_flip_converged_solutions_reproduce_syndrome():
    H = hamming_code(3)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = FlipDecoder(H, max_iter=50, pfreq=2, seed=42)
    syn = all_syndromes(3)
    out = dec.decode_batch(syn)
    conv = dec.converge_batch
    assert conv.any()
    check = (out @ Hd.T) % 2
    assert np.array_equal(check[conv], syn[conv])


def test_flip_zero_syndrome():
    dec = FlipDecoder(rep_code(5), max_iter=10)
    x = dec.decode(np.zeros(4, np.uint8))
    assert not x.any()
    assert dec.converge


def test_flip_pfreq_helps_on_ties():
    """Ring codes have even-degree bits everywhere; plain flip stalls on
    tie configurations that p-flip escapes (arXiv:2212.06985)."""
    H = ring_code(9)
    Hd = np.asarray(H.todense(), np.uint8)
    rng = np.random.default_rng(5)
    errors = (rng.random((64, 9)) < 0.15).astype(np.uint8)
    syn = errors @ Hd.T % 2
    plain = FlipDecoder(H, max_iter=60, pfreq=0, seed=11)
    pflip = FlipDecoder(H, max_iter=60, pfreq=1, seed=11)
    plain.decode_batch(syn)
    pflip.decode_batch(syn)
    assert pflip.converge_batch.sum() >= plain.converge_batch.sum()
    assert pflip.converge_batch.sum() > 0


def test_flip_invalid_inputs():
    with pytest.raises(TypeError):
        FlipDecoder([[1, 0], [0, 1]])
    dec = FlipDecoder(rep_code(5))
    with pytest.raises(ValueError):
        dec.decode(np.zeros(7, np.uint8))


def test_bp_flip_decoder():
    H = rep_code(20)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = BpFlipDecoder(
        H, error_rate=0.1, max_iter=20, flip_iterations=5, pflip_seed=1
    )
    rng = np.random.default_rng(0)
    errors = (rng.random((32, 20)) < 0.1).astype(np.uint8)
    syn = (errors @ Hd.T % 2).astype(np.uint8)
    out = dec.decode_batch(syn)
    conv = dec.converge_batch
    assert conv.all()
    assert np.array_equal((out @ Hd.T) % 2, syn)
    # zero syndrome short-circuit
    x = dec.decode(np.zeros(19, np.uint8))
    assert not x.any() and dec.converge
