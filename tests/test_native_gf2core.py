"""Native (C++) gf2core backend vs the numpy fallback.

``ldpc_tpu/native/gf2core.cpp`` implements the packed-word GF(2)
elimination used by the ``mod2`` toolbox (counterpart of the
reference's src_cpp/gf2dense.hpp). The numpy path in
``mod2/_gf2core.py`` documents identical pivoting semantics — these
tests pin that equivalence on random matrices across the full option
surface (full elimination, column orders, early rank stop). Skipped when
no toolchain can build the native library.
"""

import numpy as np
import pytest

from ldpc_tpu.mod2 import _gf2core
from ldpc_tpu.native import load_gf2core

pytestmark = pytest.mark.skipif(
    load_gf2core() is None, reason="no native toolchain"
)


def _numpy_row_reduce(packed, n, **kw):
    """The numpy fallback, forced (bypasses the native dispatch)."""
    import unittest.mock

    with unittest.mock.patch.object(
        _gf2core, "_native_lib", lambda: None
    ):
        return _gf2core.packed_row_reduce(packed, n, **kw)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("full", [False, True])
@pytest.mark.parametrize("shape", [(13, 29), (40, 17), (64, 64), (7, 130)])
def test_native_matches_numpy_row_reduce(seed, full, shape):
    rng = np.random.default_rng(seed)
    dense = (rng.random(shape) < 0.3).astype(np.uint8)
    n = shape[1]
    p1 = _gf2core.pack_rows(dense)
    p2 = p1.copy()
    r1 = _gf2core.packed_row_reduce(p1, n, full=full)
    r2 = _numpy_row_reduce(p2, n, full=full)
    assert r1[1] == r2[1]  # rank
    assert r1[2] == r2[2]  # pivot columns
    assert r1[3] == r2[3]  # row permutation
    assert (r1[0] == r2[0]).all()  # eliminated matrix


@pytest.mark.parametrize("seed", [3, 4])
def test_native_matches_numpy_with_col_order_and_stop(seed):
    rng = np.random.default_rng(seed)
    dense = (rng.random((24, 31)) < 0.4).astype(np.uint8)
    n = 31
    order = rng.permutation(n).astype(np.int32)
    for stop in (None, 5):
        p1 = _gf2core.pack_rows(dense)
        p2 = p1.copy()
        r1 = _gf2core.packed_row_reduce(
            p1, n, full=True, col_order=order, stop_rank=stop
        )
        r2 = _numpy_row_reduce(
            p2, n, full=True, col_order=order, stop_rank=stop
        )
        assert r1[1] == r2[1] and r1[2] == r2[2] and r1[3] == r2[3]
        assert (r1[0] == r2[0]).all()


def test_public_mod2_uses_backends_consistently():
    """rank/kernel through the public API agree between backends."""
    import scipy.sparse
    import unittest.mock

    from ldpc_tpu import mod2
    from ldpc_tpu.codes import hamming_code

    H = hamming_code(4)
    with unittest.mock.patch.object(_gf2core, "_native_lib", lambda: None):
        rank_np = mod2.rank(H)
        ker_np = mod2.nullspace(H).toarray()
    rank_nat = mod2.rank(H)
    ker_nat = mod2.nullspace(H).toarray()
    assert rank_np == rank_nat
    assert (ker_np == ker_nat).all()
    Hd = np.asarray(H.todense()) % 2
    assert ((ker_nat @ Hd.T) % 2 == 0).all()
