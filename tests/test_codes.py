"""Code-construction tests (mirrors reference python_test/test_codes.py coverage)."""

import numpy as np
import pytest
import scipy.sparse

from ldpc_tpu.codes import (
    bivariate_bicycle_code,
    hamming_code,
    random_binary_code,
    rep_code,
    ring_code,
    surface_code,
    toric_code,
)


def test_rep_code():
    H = rep_code(5)
    expected = np.array(
        [
            [1, 1, 0, 0, 0],
            [0, 1, 1, 0, 0],
            [0, 0, 1, 1, 0],
            [0, 0, 0, 1, 1],
        ],
        dtype=np.uint8,
    )
    assert isinstance(H, scipy.sparse.csr_matrix)
    assert H.dtype == np.uint8
    assert np.array_equal(H.toarray(), expected)
    with pytest.raises(ValueError):
        rep_code(1)


def test_ring_code():
    H = ring_code(4)
    expected = np.array(
        [
            [1, 1, 0, 0],
            [0, 1, 1, 0],
            [0, 0, 1, 1],
            [1, 0, 0, 1],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(H.toarray(), expected)
    with pytest.raises(ValueError):
        ring_code(1)


def test_hamming_code():
    H = hamming_code(3)
    expected = np.array(
        [
            [0, 0, 0, 1, 1, 1, 1],
            [0, 1, 1, 0, 0, 1, 1],
            [1, 0, 1, 0, 1, 0, 1],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(H.toarray(), expected)
    with pytest.raises(TypeError):
        hamming_code(3.0)


def test_random_binary_code():
    H = random_binary_code(20, 50, 4, seed=7)
    assert H.shape == (20, 50)
    assert H.dtype == np.uint8
    # no variance -> every row has exactly weight 4
    assert (H.toarray().sum(axis=1) == 4).all()


def test_surface_code_parameters():
    for d in (2, 3, 5):
        code = surface_code(d)
        assert code.n == d * d + (d - 1) * (d - 1)
        assert code.validate()
        assert code.k == 1
        assert code.lx.shape[0] == 1
        assert code.lz.shape[0] == 1
        # logicals commute with checks
        assert not ((code.hz @ code.lx.T).toarray() % 2).any()
        assert not ((code.hx @ code.lz.T).toarray() % 2).any()
        # logicals anticommute with each other
        assert ((code.lx @ code.lz.T).toarray() % 2).any()


def test_toric_code_parameters():
    code = toric_code(3)
    assert code.n == 2 * 9
    assert code.validate()
    assert code.k == 2


def test_bivariate_bicycle_code():
    # the [[144, 12, 12]] gross code
    code = bivariate_bicycle_code(
        12, 6, [(3, 0), (0, 1), (0, 2)], [(0, 3), (1, 0), (2, 0)]
    )
    assert code.n == 144
    assert code.validate()
    assert code.k == 12
