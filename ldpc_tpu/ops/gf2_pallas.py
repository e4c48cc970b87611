"""Fused Pallas TPU kernel for batched OSD-0 (GF(2) elimination).

The XLA engine (:func:`ldpc_tpu.ops.gf2.batched_rref`) keeps the packed
working matrix in HBM, so each of the ~n elimination steps re-streams the
whole batch. Here each batch tile's working matrix lives in a VMEM
scratch for the entire elimination; HBM sees only the inputs once and the
packed solutions once.

Design (vs reference src_cpp/osd.hpp:110-117 + gf2sparse_linalg.hpp:298):

- No per-lane column-permuted copy of H is ever built. Every lane shares
  the same bit-packed H (replicated, tiny); the per-lane reliability
  order only decides *which column is processed next*. The column's bit
  is extracted by testing all packed words against the lane's word index
  (Wp masked shifts — cheaper than materialising + packing a per-lane
  (m, n) gather, which costs more than the elimination itself).
- Pivot choice = first unused row holding a 1, exactly like the XLA
  engine and the reference's row-ordered elimination, so the pivot
  column set — and hence the OSD-0 solution — matches bit-for-bit.
- Solutions are scattered straight into original column coordinates
  (packed uint32), so no unpermute pass is needed afterwards.
- The while_loop exits once every lane has found ``rank`` pivots.

All lane-wide scalars are carried as (1, TB) vectors and loop carries
are derived from refs (concrete layouts) — Mosaic rejects
traced-scalar -> vector broadcasts and replicated->concrete back-edge
relayouts (see bp_pallas.py).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.ops.pcm import PcmGraph


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _osd0_kernel(
    order_ref,
    s_ref,
    H_ref,
    x0_ref,
    meta_ref,
    M_ref,
    *,
    m,
    n,
    m8,
    Wp,
    Wx,
    rank,
):
    TB = s_ref.shape[1]
    u32 = jnp.uint32
    one = jnp.uint32(1)
    ws, bs = n // 32, jnp.uint32(n % 32)  # syndrome bit position in words

    # --- init: M = [H | s], replicated H + per-lane syndrome ------------
    for w in range(Wp):
        Hw = H_ref[w * m8 : (w + 1) * m8, 0:1]  # (m8, 1)
        M_ref[w] = jnp.broadcast_to(Hw, (m8, TB))
    M_ref[ws] = M_ref[ws] | (s_ref[:] << bs)

    rows = jax.lax.broadcasted_iota(jnp.int32, (m8, TB), 0)
    zrow = (s_ref[0:1, :] * jnp.uint32(0)).astype(jnp.int32)  # concrete 0
    bc = jax.lax.bitcast_convert_type

    def body(state):
        j, used, used_cnt, col_of_row, _ = state
        ordw = order_ref[pl.ds(j, 1), :].astype(jnp.int32)  # (1, TB)
        word = ordw >> 5
        bit = (ordw & 31).astype(u32)
        # extract the lane-selected column bit from the packed words
        col = s_ref[:] * jnp.uint32(0)  # (m8, TB) concrete zero
        for w in range(Wp):
            hit = (word == w).astype(u32)
            col = col | (((M_ref[w] >> bit) & one) * hit)
        cand = col * (one - used)
        score = jnp.where(cand > 0, rows, m8)
        piv = jnp.min(score, axis=0, keepdims=True)  # (1, TB)
        has = (piv < m8).astype(u32)
        is_piv = ((rows == piv) & (cand > 0)).astype(u32)  # (m8, TB)
        elim = col * (one - is_piv) * has
        for w in range(Wp):
            Mw = M_ref[w]
            # Mosaic lacks unsigned reductions; the masked one-hot sum is
            # exact under an int32 bitcast (single non-zero term)
            pv_w = bc(
                jnp.sum(
                    bc(Mw * is_piv, jnp.int32),
                    axis=0,
                    keepdims=True,
                    dtype=jnp.int32,  # x64 mode would promote to int64
                ),
                u32,
            )
            M_ref[w] = Mw ^ (pv_w * elim)
        # Gauss-Jordan keeps rewriting earlier pivot rows' syndrome bits,
        # so solutions are read *after* the loop; remember each row's
        # pivot column instead
        col_of_row = jnp.where(is_piv > 0, ordw, col_of_row)
        used = used | is_piv
        used_cnt = used_cnt + has.astype(jnp.int32)
        # fast-solve exit (reference gf2sparse_linalg.hpp:298-401): once a
        # lane has no unreduced syndrome 1 left, every later pivot row has
        # syndrome bit 0, so Gauss-Jordan can no longer change any used
        # row's syndrome bit and the solution readout is frozen — further
        # columns would only add x0 bits that read 0. Stop the lane there
        # (or at full rank, whichever first).
        sb = (M_ref[ws] >> bs) & one
        unres = jnp.max(
            bc(sb * (one - used), jnp.int32), axis=0, keepdims=True
        )
        act = ((unres > 0) & (used_cnt < rank)).astype(jnp.int32)
        return (j + 1, used, used_cnt, col_of_row, act)

    def cond(state):
        j, _, _, _, act = state
        return (j < n) & (jnp.max(act) > 0)

    s_any = jnp.max(bc(s_ref[:], jnp.int32), axis=0, keepdims=True)
    state0 = (
        jnp.int32(0),
        s_ref[:] * jnp.uint32(0),
        zrow,
        rows * 0,  # col_of_row, concrete zeros (masked by `used` below)
        (s_any > 0).astype(jnp.int32),
    )
    _, used, _, col_of_row, _ = jax.lax.while_loop(cond, body, state0)

    # x0[col_of_row[r]] = final syndrome bit of row r, for used rows.
    # Distinct rows own distinct columns, so the per-word sum equals the
    # bitwise OR of the shifted solution bits.
    sbits = (M_ref[ws] >> bs) & one
    val = (sbits * used) << (col_of_row & 31).astype(u32)  # (m8, TB)
    word_r = col_of_row >> 5
    for w in range(Wx):
        x0w = jnp.sum(
            bc(val * (word_r == w).astype(u32), jnp.int32),
            axis=0,
            keepdims=True,
            dtype=jnp.int32,  # x64 mode would promote to int64
        )  # (1, TB) int32 == packed uint32 bits
        x0_ref[w] = jnp.broadcast_to(bc(x0w, u32), (8, TB))

    # syndrome consistent iff no unused row still holds a 1 there
    bad = jnp.max(
        bc(sbits * (one - used), jnp.int32), axis=0, keepdims=True
    )
    valid = (1 - bad).astype(jnp.float32)
    meta_ref[0:1, :] = valid
    meta_ref[1:8, :] = jnp.broadcast_to(valid * 0.0, (7, TB))


def _masked_solve_kernel(
    order_ref,
    count_ref,
    s_ref,
    H_ref,
    x0_ref,
    bad_ref,
    M_ref,
    *,
    m,
    n,
    m8,
    Wp,
    Wx,
):
    """Column-masked Gauss-Jordan: lane ``l`` only processes its first
    ``count[l]`` columns of ``order`` (its cluster bits, most error-likely
    first) — the batched form of the reference's per-cluster solves
    (lsd.hpp:743-760, union_find.hpp:365-392). Everything else matches
    :func:`_osd0_kernel`; extra output ``bad_ref`` holds the per-row
    "unreduced with syndrome 1" flags that mark invalid clusters."""
    TB = s_ref.shape[1]
    u32 = jnp.uint32
    one = jnp.uint32(1)
    ws, bs = n // 32, jnp.uint32(n % 32)

    for w in range(Wp):
        Hw = H_ref[w * m8 : (w + 1) * m8, 0:1]
        M_ref[w] = jnp.broadcast_to(Hw, (m8, TB))
    M_ref[ws] = M_ref[ws] | (s_ref[:] << bs)

    rows = jax.lax.broadcasted_iota(jnp.int32, (m8, TB), 0)
    count = count_ref[0:1, :]  # (1, TB) int32
    maxcnt = jnp.max(count)
    bc = jax.lax.bitcast_convert_type
    zrow = (s_ref[0:1, :] * jnp.uint32(0)).astype(jnp.int32)

    def body(state):
        j, jvec, used, col_of_row = state
        active = (jvec < count).astype(u32)  # (1, TB)
        ordw = order_ref[pl.ds(j, 1), :].astype(jnp.int32)
        word = ordw >> 5
        bit = (ordw & 31).astype(u32)
        col = s_ref[:] * jnp.uint32(0)
        for w in range(Wp):
            hit = (word == w).astype(u32)
            col = col | (((M_ref[w] >> bit) & one) * hit)
        cand = col * (one - used) * active
        score = jnp.where(cand > 0, rows, m8)
        piv = jnp.min(score, axis=0, keepdims=True)
        has = (piv < m8).astype(u32)
        is_piv = ((rows == piv) & (cand > 0)).astype(u32)
        elim = col * (one - is_piv) * has * active
        for w in range(Wp):
            Mw = M_ref[w]
            pv_w = bc(
                jnp.sum(
                    bc(Mw * is_piv, jnp.int32),
                    axis=0,
                    keepdims=True,
                    dtype=jnp.int32,
                ),
                u32,
            )
            M_ref[w] = Mw ^ (pv_w * elim)
        col_of_row = jnp.where(is_piv > 0, ordw, col_of_row)
        used = used | is_piv
        return (j + 1, jvec + 1, used, col_of_row)

    def cond(state):
        j = state[0]
        return (j < n) & (j < maxcnt)

    state0 = (jnp.int32(0), zrow, s_ref[:] * jnp.uint32(0), rows * 0)
    _, _, used, col_of_row = jax.lax.while_loop(cond, body, state0)

    sbits = (M_ref[ws] >> bs) & one
    val = (sbits * used) << (col_of_row & 31).astype(u32)
    word_r = col_of_row >> 5
    for w in range(Wx):
        x0w = jnp.sum(
            bc(val * (word_r == w).astype(u32), jnp.int32),
            axis=0,
            keepdims=True,
            dtype=jnp.int32,
        )
        x0_ref[w] = jnp.broadcast_to(bc(x0w, u32), (8, TB))
    bad_ref[:] = (
        bc(sbits * (one - used), jnp.int32).astype(jnp.float32)
    )


def make_masked_solver(
    graph: PcmGraph, tile_b: int = 512, interpret: bool = False
):
    """Batched column-masked GF(2) solver for cluster decoders.

    Returns ``solve(syndromes: (B, m) uint8, order: (B, n) int32,
    count: (B,) int32) -> (x0: (B, n) uint8 in ORIGINAL coordinates,
    bad_row: (B, m) bool)`` where lane ``l`` eliminates only its first
    ``count[l]`` columns of ``order``. A cluster is syndrome-consistent
    iff none of its rows is flagged in ``bad_row``.
    """
    from ldpc_tpu.ops import gf2

    m, n = graph.m, graph.n
    m8 = _round_up(m, 8)
    Wp = -(-(n + 1) // 32)
    Wx = -(-n // 32)
    per_lane = (Wp * m8 + 5 * m8 + n) * 4
    h_const = Wp * m8 * 128 * 4  # replicated packed-H constant
    budget = 12 * 1024 * 1024
    while tile_b > 128 and h_const + per_lane * tile_b > budget:
        tile_b //= 2
    if h_const + per_lane * tile_b > budget:
        raise ValueError(
            "code too large for the masked-solver VMEM budget; "
            "use the XLA engine"
        )

    Hbits = np.zeros((m8, Wp * 32), np.uint8)
    Hbits[:m, :n] = graph.dense
    words = (
        (Hbits.reshape(m8, Wp, 32) << np.arange(32, dtype=np.uint32))
        .sum(axis=2)
        .astype(np.uint32)
    )
    H_host = np.zeros((Wp * m8, 128), np.uint32)
    for w in range(Wp):
        H_host[w * m8 : (w + 1) * m8, :] = words[:, w : w + 1]
    H_d = jnp.asarray(H_host)

    kernel = functools.partial(
        _masked_solve_kernel, m=m, n=n, m8=m8, Wp=Wp, Wx=Wx
    )

    def run(order_t, count_t, s_t, TB):
        B = s_t.shape[1]
        grid = (B // TB,)
        x0w, bad = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (Wp * m8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (Wx, 8, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Wx, 8, B), jnp.uint32),
                jax.ShapeDtypeStruct((m8, B), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((Wp, m8, TB), jnp.uint32)],
            interpret=interpret,
        )(order_t, count_t, s_t, H_d)
        return x0w, bad

    def solve(syndromes: jnp.ndarray, order: jnp.ndarray, count: jnp.ndarray):
        B0 = syndromes.shape[0]
        if B0 >= tile_b:
            B, TB = _round_up(B0, tile_b), tile_b
        else:
            B = TB = max(128, _round_up(B0, 128))
        if B != B0:
            syndromes = jnp.concatenate(
                [syndromes, jnp.zeros((B - B0, m), syndromes.dtype)]
            )
            order = jnp.concatenate(
                [
                    order,
                    jnp.broadcast_to(
                        jnp.arange(n, dtype=order.dtype)[None], (B - B0, n)
                    ),
                ]
            )
            count = jnp.concatenate(
                [count, jnp.zeros(B - B0, count.dtype)]
            )
        count_t = jnp.broadcast_to(
            count.astype(jnp.int32)[None, :], (8, B)
        )
        x0w, bad = run(order.T, count_t,
                       jnp.zeros((m8, B), jnp.uint32).at[:m].set(
                           syndromes.T.astype(jnp.uint32)),
                       TB)
        x0 = gf2.unpack_u32(x0w[:, 0, :B0].T, n)
        bad_row = bad[:m, :B0].T > 0.5
        return x0, bad_row

    return jax.jit(solve)


def _rref_export_kernel(
    order_ref,
    s_ref,
    H_ref,
    M_out_ref,
    colrow_ref,
    used_ref,
    M_ref,
    *,
    m,
    n,
    m8,
    Wp,
    rank,
):
    """Full Gauss-Jordan in the lane's reliability order, run to rank
    completion (reference osd.hpp:140-153: higher-order OSD needs the
    complete pivot set, not just a solved syndrome). Exports the whole
    reduced augmented matrix [R | T s] (packed words, ORIGINAL column
    coordinates), each row's pivot column, and the used-row mask — the
    OSD-w candidate sweep reads candidate solutions straight off R
    (y_c = Ts ^ R[:, cols(c)]), so no m x m row transform is ever
    formed."""
    TB = s_ref.shape[1]
    u32 = jnp.uint32
    one = jnp.uint32(1)
    ws, bs = n // 32, jnp.uint32(n % 32)

    for w in range(Wp):
        Hw = H_ref[w * m8 : (w + 1) * m8, 0:1]
        M_ref[w] = jnp.broadcast_to(Hw, (m8, TB))
    M_ref[ws] = M_ref[ws] | (s_ref[:] << bs)

    rows = jax.lax.broadcasted_iota(jnp.int32, (m8, TB), 0)
    bc = jax.lax.bitcast_convert_type
    zrow = (s_ref[0:1, :] * jnp.uint32(0)).astype(jnp.int32)

    def body(state):
        j, used, used_cnt, col_of_row = state
        ordw = order_ref[pl.ds(j, 1), :].astype(jnp.int32)
        word = ordw >> 5
        bit = (ordw & 31).astype(u32)
        col = s_ref[:] * jnp.uint32(0)
        for w in range(Wp):
            hit = (word == w).astype(u32)
            col = col | (((M_ref[w] >> bit) & one) * hit)
        cand = col * (one - used)
        score = jnp.where(cand > 0, rows, m8)
        piv = jnp.min(score, axis=0, keepdims=True)
        has = (piv < m8).astype(u32)
        is_piv = ((rows == piv) & (cand > 0)).astype(u32)
        elim = col * (one - is_piv) * has
        for w in range(Wp):
            Mw = M_ref[w]
            pv_w = bc(
                jnp.sum(
                    bc(Mw * is_piv, jnp.int32),
                    axis=0,
                    keepdims=True,
                    dtype=jnp.int32,
                ),
                u32,
            )
            M_ref[w] = Mw ^ (pv_w * elim)
        col_of_row = jnp.where(is_piv > 0, ordw, col_of_row)
        used = used | is_piv
        used_cnt = used_cnt + has.astype(jnp.int32)
        return (j + 1, used, used_cnt, col_of_row)

    def cond(state):
        j, _, used_cnt, _ = state
        return (j < n) & (jnp.min(used_cnt) < rank)

    state0 = (jnp.int32(0), s_ref[:] * jnp.uint32(0), zrow, rows * 0 + n)
    _, used, _, col_of_row = jax.lax.while_loop(cond, body, state0)

    for w in range(Wp):
        M_out_ref[w] = M_ref[w]
    colrow_ref[:] = jnp.where(used > 0, col_of_row, n)
    used_ref[:] = bc(used * one, jnp.int32).astype(jnp.float32)


def _masked_export_kernel(
    order_ref,
    count_ref,
    s_ref,
    H_ref,
    M_out_ref,
    colrow_ref,
    used_ref,
    M_ref,
    *,
    m,
    n,
    m8,
    Wp,
):
    """Column-masked Gauss-Jordan (lane ``l`` eliminates its first
    ``count[l]`` columns of ``order``) with full state export — the
    cluster decoders' masked solve (lsd.hpp:743-760) fused with the
    reduced-matrix export the order-w candidate sweeps consume."""
    TB = s_ref.shape[1]
    u32 = jnp.uint32
    one = jnp.uint32(1)
    ws, bs = n // 32, jnp.uint32(n % 32)

    for w in range(Wp):
        Hw = H_ref[w * m8 : (w + 1) * m8, 0:1]
        M_ref[w] = jnp.broadcast_to(Hw, (m8, TB))
    M_ref[ws] = M_ref[ws] | (s_ref[:] << bs)

    rows = jax.lax.broadcasted_iota(jnp.int32, (m8, TB), 0)
    count = count_ref[0:1, :]
    maxcnt = jnp.max(count)
    bc = jax.lax.bitcast_convert_type
    zrow = (s_ref[0:1, :] * jnp.uint32(0)).astype(jnp.int32)

    def body(state):
        j, jvec, used, col_of_row = state
        active = (jvec < count).astype(u32)
        ordw = order_ref[pl.ds(j, 1), :].astype(jnp.int32)
        word = ordw >> 5
        bit = (ordw & 31).astype(u32)
        col = s_ref[:] * jnp.uint32(0)
        for w in range(Wp):
            hit = (word == w).astype(u32)
            col = col | (((M_ref[w] >> bit) & one) * hit)
        cand = col * (one - used) * active
        score = jnp.where(cand > 0, rows, m8)
        piv = jnp.min(score, axis=0, keepdims=True)
        has = (piv < m8).astype(u32)
        is_piv = ((rows == piv) & (cand > 0)).astype(u32)
        elim = col * (one - is_piv) * has * active
        for w in range(Wp):
            Mw = M_ref[w]
            pv_w = bc(
                jnp.sum(
                    bc(Mw * is_piv, jnp.int32),
                    axis=0,
                    keepdims=True,
                    dtype=jnp.int32,
                ),
                u32,
            )
            M_ref[w] = Mw ^ (pv_w * elim)
        col_of_row = jnp.where(is_piv > 0, ordw, col_of_row)
        used = used | is_piv
        return (j + 1, jvec + 1, used, col_of_row)

    def cond(state):
        j = state[0]
        return (j < n) & (j < maxcnt)

    state0 = (jnp.int32(0), zrow, s_ref[:] * jnp.uint32(0), rows * 0 + n)
    _, _, used, col_of_row = jax.lax.while_loop(cond, body, state0)

    for w in range(Wp):
        M_out_ref[w] = M_ref[w]
    colrow_ref[:] = jnp.where(used > 0, col_of_row, n)
    used_ref[:] = bc(used * one, jnp.int32).astype(jnp.float32)


def make_masked_export_solver(
    graph: PcmGraph, tile_b: int = 256, interpret: bool = False
):
    """Masked (per-lane column subset) GF(2) solve with reduced-matrix
    export, for the LSD order-w machinery.

    Returns ``solve(syndromes: (B, m) uint8, order: (B, n) int32,
    count: (B,) int32) -> (R: (B, m, n) uint8 reduced matrix in ORIGINAL
    column coords, synd_red: (B, m) uint8, col_of_row: (B, m) int32
    (pivot column of each used row, n if none), used: (B, m) bool)``.
    """
    from ldpc_tpu.ops import gf2

    m, n = graph.m, graph.n
    m8 = _round_up(m, 8)
    Wp = -(-(n + 1) // 32)
    per_lane = (2 * Wp * m8 + 5 * m8 + n) * 4
    h_const = Wp * m8 * 128 * 4
    budget = 12 * 1024 * 1024
    while tile_b > 128 and h_const + per_lane * tile_b > budget:
        tile_b //= 2
    if h_const + per_lane * tile_b > budget:
        raise ValueError(
            "code too large for the masked-export VMEM budget; "
            "use the XLA engine"
        )

    Hbits = np.zeros((m8, Wp * 32), np.uint8)
    Hbits[:m, :n] = graph.dense
    words = (
        (Hbits.reshape(m8, Wp, 32) << np.arange(32, dtype=np.uint32))
        .sum(axis=2)
        .astype(np.uint32)
    )
    H_host = np.zeros((Wp * m8, 128), np.uint32)
    for w in range(Wp):
        H_host[w * m8 : (w + 1) * m8, :] = words[:, w : w + 1]
    H_d = jnp.asarray(H_host)

    kernel = functools.partial(
        _masked_export_kernel, m=m, n=n, m8=m8, Wp=Wp
    )

    def run(order_t, count_t, s_t, TB):
        B = s_t.shape[1]
        grid = (B // TB,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (Wp * m8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (Wp, m8, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Wp, m8, B), jnp.uint32),
                jax.ShapeDtypeStruct((m8, B), jnp.int32),
                jax.ShapeDtypeStruct((m8, B), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((Wp, m8, TB), jnp.uint32)],
            interpret=interpret,
        )(order_t, count_t, s_t, H_d)

    def solve(
        syndromes: jnp.ndarray,
        order: jnp.ndarray,
        count: jnp.ndarray,
        with_matrix: bool = True,
    ):
        """``with_matrix=False`` skips unpacking the (B, m, n) reduced
        matrix — the dominant cost of a call — for callers that only
        need pivots/validity (e.g. LSD's nullity-growth rounds); R is
        returned as None then."""
        B0 = syndromes.shape[0]
        if B0 >= tile_b:
            B, TB = _round_up(B0, tile_b), tile_b
        else:
            B = TB = max(128, _round_up(B0, 128))
        if B != B0:
            syndromes = jnp.concatenate(
                [syndromes, jnp.zeros((B - B0, m), syndromes.dtype)]
            )
            order = jnp.concatenate(
                [
                    order,
                    jnp.broadcast_to(
                        jnp.arange(n, dtype=order.dtype)[None], (B - B0, n)
                    ),
                ]
            )
            count = jnp.concatenate([count, jnp.zeros(B - B0, count.dtype)])
        count_t = jnp.broadcast_to(count.astype(jnp.int32)[None, :], (8, B))
        s_t = jnp.zeros((m8, B), jnp.uint32).at[:m].set(
            syndromes.T.astype(jnp.uint32)
        )
        Mw, colrow, used = run(order.T, count_t, s_t, TB)
        if with_matrix:
            Mb = Mw[:, :m, :B0].transpose(2, 1, 0)  # (B0, m, Wp)
            all_bits = gf2.unpack_u32(Mb, n + 1)
            R = all_bits[:, :, :n]
            synd_red = all_bits[:, :, n]
        else:
            R = None
            # the syndrome column rides word n // 32, bit n % 32
            synd_red = (
                (Mw[n // 32, :m, :B0] >> jnp.uint32(n % 32)) & 1
            ).T.astype(jnp.uint8)
        return (
            R,
            synd_red,
            colrow[:m, :B0].T,
            used[:m, :B0].T > 0.5,
        )

    return jax.jit(solve, static_argnums=3)


def make_rref_export_solver(
    graph: PcmGraph, tile_b: int = 256, interpret: bool = False
):
    """Batched full GF(2) rref with reduced-matrix export (for OSD-w /
    LSD-w candidate sweeps).

    Returns ``solve(syndromes: (B, m) uint8, llrs: (B, n) f32) ->
    (R: (B, m, n) uint8 reduced matrix in ORIGINAL column coords,
    synd_red: (B, m) uint8, col_of_row: (B, m) int32 pivot column per
    used row (n if none), used: (B, m) bool)``.
    """
    from ldpc_tpu.ops import gf2

    m, n = graph.m, graph.n
    m8 = _round_up(m, 8)
    Wp = -(-(n + 1) // 32)
    rank = gf2.batched_rank(graph.dense)
    per_lane = (2 * Wp * m8 + 5 * m8 + n) * 4
    h_const = Wp * m8 * 128 * 4
    budget = 12 * 1024 * 1024
    while tile_b > 128 and h_const + per_lane * tile_b > budget:
        tile_b //= 2
    if h_const + per_lane * tile_b > budget:
        raise ValueError(
            "code too large for the rref-export VMEM budget; "
            "use the XLA engine"
        )

    Hbits = np.zeros((m8, Wp * 32), np.uint8)
    Hbits[:m, :n] = graph.dense
    words = (
        (Hbits.reshape(m8, Wp, 32) << np.arange(32, dtype=np.uint32))
        .sum(axis=2)
        .astype(np.uint32)
    )
    H_host = np.zeros((Wp * m8, 128), np.uint32)
    for w in range(Wp):
        H_host[w * m8 : (w + 1) * m8, :] = words[:, w : w + 1]
    H_d = jnp.asarray(H_host)

    kernel = functools.partial(
        _rref_export_kernel, m=m, n=n, m8=m8, Wp=Wp, rank=rank
    )

    def run(order_t, s_t, TB):
        B = s_t.shape[1]
        grid = (B // TB,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (Wp * m8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (Wp, m8, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Wp, m8, B), jnp.uint32),
                jax.ShapeDtypeStruct((m8, B), jnp.int32),
                jax.ShapeDtypeStruct((m8, B), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((Wp, m8, TB), jnp.uint32)],
            interpret=interpret,
        )(order_t, s_t, H_d)

    def solve(syndromes: jnp.ndarray, llrs: jnp.ndarray):
        B0 = syndromes.shape[0]
        if B0 >= tile_b:
            B, TB = _round_up(B0, tile_b), tile_b
        else:
            B = TB = max(128, _round_up(B0, 128))
        if B != B0:
            syndromes = jnp.concatenate(
                [syndromes, jnp.zeros((B - B0, m), syndromes.dtype)]
            )
            llrs = jnp.concatenate([llrs, jnp.zeros((B - B0, n), llrs.dtype)])
        order = jnp.argsort(llrs, axis=1, stable=True).astype(jnp.int32)
        s_t = jnp.zeros((m8, B), jnp.uint32).at[:m].set(
            syndromes.T.astype(jnp.uint32)
        )
        Mw, colrow, used = run(order.T, s_t, TB)
        # unpack [R | s] words -> (B, m, n) reduced matrix + synd_red
        Mb = Mw[:, :m, :B0].transpose(2, 1, 0)  # (B0, m, Wp)
        all_bits = gf2.unpack_u32(Mb, n + 1)
        R = all_bits[:, :, :n]
        synd_red = all_bits[:, :, n]
        return (
            R,
            synd_red,
            colrow[:m, :B0].T,
            used[:m, :B0].T > 0.5,
        )

    return jax.jit(solve)


def make_osd0_solver(
    graph: PcmGraph, tile_b: int = 512, interpret: bool = False
):
    """Fused batched OSD-0 solver.

    Returns ``solve(syndromes: (B, m) uint8, llrs: (B, n) f32) ->
    (x0: (B, n) uint8, valid: (B,) bool)`` — the reference OSD-0 result
    (osd.hpp:114-117) for every batch element, B a multiple of 128.
    """
    from ldpc_tpu.ops import gf2

    m, n = graph.m, graph.n
    m8 = _round_up(m, 8)
    Wp = -(-(n + 1) // 32)  # columns of H plus the syndrome column
    Wx = -(-n // 32)
    rank = gf2.batched_rank(graph.dense)
    # VMEM-aware tile: scratch M is (Wp, m8, TB) u32 plus ~4 (m8, TB)
    # working vectors and the (n, TB) order block
    per_lane = (Wp * m8 + 4 * m8 + n) * 4
    h_const = Wp * m8 * 128 * 4  # replicated packed-H constant
    budget = 12 * 1024 * 1024
    while tile_b > 128 and h_const + per_lane * tile_b > budget:
        tile_b //= 2
    if h_const + per_lane * tile_b > budget:
        raise ValueError(
            "code too large for the OSD-0 solver VMEM budget; "
            "use the XLA engine"
        )

    # replicated packed H: word-major rows (Wp * m8, 128 lanes of copies)
    Hbits = np.zeros((m8, Wp * 32), np.uint8)
    Hbits[:m, :n] = graph.dense
    words = (
        (Hbits.reshape(m8, Wp, 32) << np.arange(32, dtype=np.uint32))
        .sum(axis=2)
        .astype(np.uint32)
    )
    H_host = np.zeros((Wp * m8, 128), np.uint32)
    for w in range(Wp):
        H_host[w * m8 : (w + 1) * m8, :] = words[:, w : w + 1]
    H_d = jnp.asarray(H_host)

    kernel = functools.partial(
        _osd0_kernel, m=m, n=n, m8=m8, Wp=Wp, Wx=Wx, rank=rank
    )

    def run(order_t, s_t, TB):
        B = s_t.shape[1]
        grid = (B // TB,)
        x0w, meta = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (Wp * m8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (Wx, 8, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Wx, 8, B), jnp.uint32),
                jax.ShapeDtypeStruct((8, B), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((Wp, m8, TB), jnp.uint32)],
            interpret=interpret,
        )(order_t, s_t, H_d)
        return x0w, meta

    def solve(syndromes: jnp.ndarray, llrs: jnp.ndarray):
        B0 = syndromes.shape[0]
        if B0 >= tile_b:
            B, TB = _round_up(B0, tile_b), tile_b
        else:
            B = TB = max(128, _round_up(B0, 128))
        if B != B0:  # zero-pad; padded lanes solve the zero system
            syndromes = jnp.concatenate(
                [syndromes, jnp.zeros((B - B0, m), syndromes.dtype)]
            )
            llrs = jnp.concatenate(
                [llrs, jnp.zeros((B - B0, n), llrs.dtype)]
            )
        order = jnp.argsort(llrs, axis=1, stable=True).astype(jnp.int32)
        order_t = order.T  # (n, B)
        s_t = jnp.zeros((m8, B), jnp.uint32)
        s_t = s_t.at[:m].set(syndromes.T.astype(jnp.uint32))
        x0w, meta = run(order_t, s_t, TB)
        x0_packed = x0w[:, 0, :B0].T  # (B0, Wx) uint32
        x0 = gf2.unpack_u32(x0_packed, n)
        valid = meta[0, :B0] > 0.5
        return x0, valid

    return jax.jit(solve)
