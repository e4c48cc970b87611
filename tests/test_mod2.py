"""mod2 GF(2) linear algebra tests (mirrors reference python_test/test_mod2.py)."""

import numpy as np
import pytest
import scipy.sparse
from scipy.sparse import csr_matrix

from ldpc_tpu import mod2
from ldpc_tpu.codes import hamming_code, rep_code, ring_code


def test_io_test_roundtrip():
    for d in range(2, 10):
        H = rep_code(d)
        assert np.array_equal(mod2.io_test(H).toarray(), H.toarray())
        assert np.array_equal(mod2.io_test(H.toarray()).toarray(), H.toarray())


def test_rank():
    for d in range(2, 10):
        assert mod2.rank(rep_code(d)) == d - 1
        assert mod2.rank(ring_code(d)) == d - 1
        assert mod2.rank(rep_code(d).T) == d - 1
    assert mod2.rank(rep_code(1000).T) == 999
    mat = scipy.sparse.csr_matrix(
        np.array([[0, 0, 1, 0], [0, 0, 1, 1], [1, 1, 0, 0], [0, 1, 0, 0]])
    )
    assert mod2.rank(mat) == 4
    assert mod2.rank(mat, method="sparse") == 4
    with pytest.raises(ValueError):
        mod2.rank(mat, method="bogus")


def test_kernel():
    for d in range(2, 10):
        H = rep_code(d)
        ker = mod2.kernel(H)
        assert ker.shape == (1, d)
        assert not ((H @ ker.T).toarray() % 2).any()

    for r in range(2, 6):
        H = hamming_code(r)
        ker = mod2.nullspace(H)
        n = H.shape[1]
        assert ker.shape[0] == n - r
        assert not ((H @ ker.T).toarray() % 2).any()
        # kernel rows are independent
        assert mod2.rank(ker) == n - r


def test_plu_decomposition():
    for code in (rep_code, ring_code, hamming_code):
        for d in range(2, 10):
            H = code(d)
            plu = mod2.PluDecomposition(H)
            P, L, U = plu.P, plu.L, plu.U
            assert np.array_equal((P @ L @ U).toarray() % 2, H.toarray())


def test_lu_solve():
    rng = np.random.RandomState(42)
    for code in (rep_code, ring_code, hamming_code):
        for d in range(2, 10):
            H = code(d)
            plu = mod2.PluDecomposition(H)
            x = rng.randint(2, size=H.shape[1])
            y = H @ x % 2
            x_sol = plu.lu_solve(y)
            assert np.array_equal(H @ x_sol % 2, y)


def test_pivot_rows():
    dense_mat = np.eye(3, dtype=np.uint8)
    assert np.array_equal(mod2.pivot_rows(dense_mat), np.array([0, 1, 2]))
    assert np.array_equal(mod2.pivot_rows(csr_matrix(dense_mat)), np.array([0, 1, 2]))

    H = hamming_code(3)
    mat = scipy.sparse.vstack([csr_matrix(np.zeros((3, 7), dtype=np.uint8)), H])
    assert np.array_equal(mod2.pivot_rows(mat), np.array([3, 4, 5]))


def test_row_basis():
    H = hamming_code(3)
    mat = scipy.sparse.vstack(
        [H, csr_matrix(H.toarray()[[0]] ^ H.toarray()[[1]])]
    ).tocsr()
    basis = mod2.row_basis(mat)
    assert basis.shape == (3, 7)
    assert mod2.rank(basis) == 3


def test_row_span():
    H = rep_code(3)
    span = mod2.row_span(H).toarray()
    assert span.shape == (4, 3)
    expected = {(0, 0, 0), (1, 1, 0), (0, 1, 1), (1, 0, 1)}
    assert {tuple(r) for r in span} == expected


def test_row_echelon():
    mat = np.array([[1, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8)
    ech, rank_, transform, pivots = mod2.row_echelon(mat)
    assert rank_ == 3
    assert np.array_equal(transform @ mat % 2, ech)
    # echelon: below-pivot entries are zero
    for r, p in enumerate(pivots):
        assert not ech[r + 1 :, p].any()


def test_reduced_row_echelon():
    mat = np.array([[1, 1, 0, 1], [1, 1, 1, 0], [0, 1, 0, 1]], dtype=np.uint8)
    rre, rank_, tr, tc = mod2.reduced_row_echelon(mat)
    assert np.array_equal(tr @ mat @ tc % 2, rre)
    assert np.array_equal(rre[:rank_, :rank_], np.eye(rank_, dtype=np.uint8))


def test_inverse():
    rng = np.random.RandomState(0)
    for n in (3, 5, 8):
        while True:
            M = rng.randint(2, size=(n, n)).astype(np.uint8)
            if mod2.rank(M) == n:
                break
        Minv = mod2.inverse(M)
        assert np.array_equal(M @ Minv % 2, np.eye(n, dtype=np.uint8))


def test_row_complement_basis():
    H = hamming_code(3)
    comp = mod2.row_complement_basis(H)
    stacked = scipy.sparse.vstack([H, comp])
    assert mod2.rank(stacked) == 7
    assert comp.shape[0] == 4


def test_estimate_code_distance():
    H = hamming_code(3)  # true distance 3
    d_est, searched, words = mod2.estimate_code_distance(H, 0.05)
    assert d_est == 3
    assert searched > 0
    assert words.shape[1] == 7


def test_compute_exact_code_distance():
    assert mod2.compute_exact_code_distance(rep_code(5)) == 5
    assert mod2.compute_exact_code_distance(hamming_code(3)) == 3


def test_mod10_mod2_helpers():
    assert mod2.mod10_to_mod2(2, length=5) == [0, 0, 0, 1, 0]
    assert mod2.mod2_to_mod10([0, 0, 0, 1, 0]) == 2
