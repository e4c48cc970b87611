"""Fused Pallas TPU kernel for batched parallel-schedule BP.

The XLA engine in :mod:`ldpc_tpu.ops.bp` materialises every per-iteration
message array in HBM; on TPU that makes BP bandwidth-bound. This kernel
keeps the full BP state of a batch tile resident in VMEM across *all*
iterations, so HBM traffic is one read of the syndromes plus one write of
the outputs. The sparse gather/scatter of the Tanner graph rides the MXU
as one-hot selection matmuls:

- gather  (check side):  v2c_k = G_k @ llr - c2v_k, ``G_k`` the (m, n)
  one-hot matrix whose row i selects ``chk_bits[i, k]``;
- scatter (bit side):    llr = llr0 + sum_k G_k^T @ c2v_k;
- syndrome check:        cand = (sum_k G_k @ hard) mod 2.

One-hot f32 matmuls are exact (products are 1*x or 0), so message values
match the XLA engine's; only the bit-side summation order differs, which
can flip fp ties — decisions agree statistically, LER is identical.

Semantics mirror the reference parallel schedule (reference:
src_cpp/bp.hpp:192-325): min-sum exclusive-min with first-occurrence
argmin, sign parity with <= 0 counting negative (bp.hpp:240,253),
product-sum prefix/suffix tanh form (bp.hpp:201-219), dynamic
``alpha = 1 - 2^-iter`` when ``ms_scaling_factor == 0`` (bp.hpp:223-228),
syndrome-equality convergence with per-element output freezing, and a
per-tile early exit once every lane in the tile has converged.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.ops.pcm import PcmGraph

PRODUCT_SUM = 0
MINIMUM_SUM = 1

_BIG = 1e30


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def build_onehot(graph: PcmGraph):
    """The (dc*M8, N8) stacked one-hot gather matrix.

    Row ``k*M8 + i`` of G selects bit ``chk_bits[i, k]`` (zero row for pad
    slots). Padded to sublane multiples so static in-kernel slices stay
    tile-aligned. The bit-side scatter contracts the SAME matrix on its
    row axis (a transposed MXU matmul), so no separate transpose constant
    is stored — VMEM residency of the constants is the size limit for
    large codes.
    """
    m, n, dc = graph.m, graph.n, graph.dc
    M8, N8 = _round_up(m, 8), _round_up(n, 8)
    G = np.zeros((dc * M8, N8), np.float32)
    for i in range(m):
        for k in range(dc):
            if graph.chk_mask[i, k]:
                G[k * M8 + i, graph.chk_bits[i, k]] = 1.0
    return G


def _bp_kernel_body(
    s_ref,
    llr0_ref,
    G_ref,
    mask_ref,
    dec_ref,
    llr_ref,
    meta_ref,
    *,
    m,
    n,
    dc,
    M8,
    N8,
    bp_method,
    max_iter,
    ms_scaling_factor,
    bf16_matmul,
):
    s = s_ref[:]  # (M8, TB) f32 in {0,1}; pad rows are 0
    llr0 = llr0_ref[:]  # (N8, TB)
    TB = s.shape[1]
    f32 = jnp.float32
    # bf16 mode: G is stored bf16 (one-hot, exact) and matmul operands are
    # rounded to bf16 — 4x MXU rate; only message VALUES round (~2^-8
    # relative), min-sum decisions are insensitive at that scale. The
    # convergence check stays exact (0/1 operands are exact in bf16).
    mm_t = jnp.bfloat16 if bf16_matmul else f32

    def gather_all(x):
        # ONE stacked (dc*M8, N8) @ (N8, TB) matmul for every slot k —
        # per-slot matmuls waste MXU row-tiles whenever M8 is not a
        # multiple of 128; the stacked constant tiles exactly
        return jnp.dot(G_ref[:], x.astype(mm_t), preferred_element_type=f32)

    def scatter_all(x_stack):
        # sum_k G_k^T @ x_k as one transposed contraction of the stacked
        # constant: contracting G's row axis (dc*M8) against the stacked
        # messages both sums over the row slots and rides the MXU with
        # full row-tile occupancy; no transpose copy is stored
        return jax.lax.dot_general(
            G_ref[:],
            x_stack.astype(mm_t),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def mask_k(k):
        # (M8, 1) 0/1 mask for slot k; broadcasts against (M8, TB) operands
        return mask_ref[k * M8 : (k + 1) * M8, 0:1]

    def check_update(v2c, alpha):
        # v2c: list of dc (M8, TB) arrays
        if bp_method == MINIMUM_SUM:
            m1 = jnp.full((M8, TB), _BIG, f32)
            m2 = jnp.full((M8, TB), _BIG, f32)
            amin = jnp.zeros((M8, TB), jnp.int32)
            negsum = jnp.zeros((M8, TB), f32)
            negs = []
            for k in range(dc):
                mk = mask_k(k)
                a = jnp.where(mk > 0, jnp.abs(v2c[k]), _BIG)
                lt = a < m1
                m2 = jnp.where(lt, m1, jnp.minimum(m2, a))
                m1 = jnp.where(lt, a, m1)
                amin = jnp.where(lt, k, amin)
                nk = jnp.where(mk > 0, (v2c[k] <= 0).astype(f32), 0.0)
                negs.append(nk)
                negsum = negsum + nk
            out = []
            for k in range(dc):
                mk = mask_k(k)
                excl = jnp.where(amin == k, m2, m1)
                tot = s + negsum + negs[k]
                par = tot - 2.0 * jnp.floor(tot * 0.5)
                out.append(mk * alpha * (1.0 - 2.0 * par) * excl)
            return out
        # product-sum: exclusive prefix/suffix tanh products (bp.hpp:201-218)
        t = []
        for k in range(dc):
            mk = mask_k(k)
            t.append(jnp.where(mk > 0, jnp.tanh(v2c[k] * 0.5), 1.0))
        prefix = [None] * dc
        acc = jnp.ones((M8, TB), f32)
        for k in range(dc):
            prefix[k] = acc
            acc = acc * t[k]
        suffix = [None] * dc
        acc = jnp.ones((M8, TB), f32)
        for k in reversed(range(dc)):
            suffix[k] = acc
            acc = acc * t[k]
        sgn = 1.0 - 2.0 * s
        eps = 1e-7
        out = []
        for k in range(dc):
            mk = mask_k(k)
            p = jnp.clip(prefix[k] * suffix[k], -1 + eps, 1 - eps)
            out.append(mk * sgn * jnp.log((1.0 + p) / (1.0 - p)))
        return out

    def body(state):
        # Body t consumes llr_{t-1} (itvec = t-1 completed iterations):
        # the gather G_k @ llr serves BOTH the extrinsic v2c AND the
        # convergence check of llr_{t-1} — the sign of the gathered LLR
        # *is* the gathered hard decision, so the separate cand matmuls
        # of the naive formulation (1/3 of MXU work) disappear.
        it, itvec, llr, c2v, conv, dec, llro, iters = state
        gk_all = gather_all(llr)  # (dc*M8, TB)
        gk = [gk_all[k * M8 : (k + 1) * M8, :] for k in range(dc)]
        if bf16_matmul:
            # rounded gathers can't serve the check exactly (a tiny
            # positive llr could round to +0); gather the exact 0/1 hard
            # bits instead — bf16 one-hot matmuls on exact operands
            hard_prev = (llr <= 0).astype(f32)
            hk_all = gather_all(hard_prev)
            cand = mask_k(0) * hk_all[0:M8, :]
            for k in range(1, dc):
                cand = cand + mask_k(k) * hk_all[k * M8 : (k + 1) * M8, :]
        else:
            cand = mask_k(0) * (gk[0] <= 0).astype(f32)
            for k in range(1, dc):
                cand = cand + mask_k(k) * (gk[k] <= 0).astype(f32)
        cand = cand - 2.0 * jnp.floor(cand * 0.5)
        eq = ((cand - s) * (cand - s) <= 0.25).astype(f32)
        # llr_0 is the raw channel — the reference never checks it
        # (bp.hpp runs at least one iteration), so gate on itvec >= 1
        gate = jnp.minimum(itvec, 1.0)
        conv_now = jnp.min(eq, axis=0, keepdims=True) * gate  # (1, TB)
        # record llr_{t-1} while unconverged ((1, TB) boolean selects trip
        # Mosaic relayouts, so metadata stays f32 + arithmetic blends)
        active = 1.0 - conv
        hard = (llr <= 0).astype(f32)
        dec = dec + active * (hard - dec)
        llro = llro + active * (llr - llro)
        iters = iters + active * (itvec - iters)
        conv = jnp.maximum(conv, conv_now)
        # message iteration t = itvec + 1
        itvec = itvec + 1.0
        if bp_method == MINIMUM_SUM and ms_scaling_factor == 0.0:
            alpha = 1.0 - jnp.exp2(-itvec)
        else:
            alpha = jnp.float32(ms_scaling_factor)
        v2c = [gk[k] - c2v[k * M8 : (k + 1) * M8, :] for k in range(dc)]
        c2v_new = jnp.concatenate(check_update(v2c, alpha), axis=0)
        llr_new = llr0 + scatter_all(c2v_new)
        return (it + 1, itvec, llr_new, c2v_new, conv, dec, llro, iters)

    def cond(state):
        # max_iter + 1 bodies: the last one only *checks* llr_{max_iter}
        # (its message update is dead work on the final trip)
        it, _, _, _, conv, _, _, _ = state
        return (it < max_iter + 1) & (jnp.min(conv) < 0.5)

    # carries must start with CONCRETE layouts (derived from refs): Mosaic
    # cannot relayout a loop body's concrete vector back to the replicated
    # layout a constant-zero init would get (invalid back-edge relayout)
    zrow = s[0:1, :] * 0.0  # (1, TB) concrete zero
    state0 = (
        jnp.int32(0),
        zrow,
        llr0,
        jnp.concatenate([s * 0.0 for _ in range(dc)], axis=0),
        zrow,
        llr0 * 0.0,
        llr0,
        zrow,
    )
    _, _, _, _, conv, dec, llro, iters = jax.lax.while_loop(cond, body, state0)
    dec_ref[:] = dec
    llr_ref[:] = llro
    meta_ref[0:1, :] = conv
    meta_ref[1:2, :] = iters
    meta_ref[2:8, :] = jnp.zeros((6, TB), f32)


def make_parallel_decoder_pallas(
    graph: PcmGraph,
    bp_method: int,
    max_iter: int,
    ms_scaling_factor: float,
    tile_b: int = 512,
    interpret: bool = False,
    bf16_matmul: bool = False,
):
    """Build a fused-BP decode function with the XLA engine's signature.

    Returns ``decode(syndromes: (B, m) uint8, init_llr: (n,)) -> BpResult``
    with B a multiple of 128 (callers pad; decode_batch buckets already
    are). State per tile must fit VMEM; ``tile_b`` trades VMEM for grid
    overhead.
    """
    from ldpc_tpu.ops.bp import BpResult

    m, n, dc = graph.m, graph.n, graph.dc
    # VMEM-aware tile: per-lane state is ~(4*N8 + 4*dc*M8 + m8) f32 words
    # (llr/dec/llro/llr0 + c2v/gk/v2c/c2v_new + syndrome); the constant G
    # adds dc*M8*N8 words. Fit under a ~11 MB budget (VMEM is ~16 MB/core
    # and pallas double-buffers the blocked inputs).
    M8, N8 = _round_up(m, 8), _round_up(n, 8)
    # bf16 halves the one-hot constant, doubling the code size the fused
    # kernel can hold before falling back to the XLA engine
    const_bytes = dc * M8 * N8 * (2 if bf16_matmul else 4)
    per_lane = (4 * N8 + 4 * dc * M8 + M8) * 4
    budget = 11 * 1024 * 1024 - const_bytes
    while tile_b > 128 and per_lane * tile_b > budget:
        tile_b //= 2
    if per_lane * tile_b > budget:
        raise ValueError(
            f"code too large for the fused BP kernel's VMEM budget "
            f"(constants {const_bytes >> 20} MB); use the XLA engine"
        )
    G = build_onehot(graph)
    mask_host = np.zeros((dc * M8, 128), np.float32)
    for k in range(dc):
        mask_host[k * M8 : k * M8 + m, :] = graph.chk_mask[:, k : k + 1]
    G_d = jnp.asarray(G, jnp.bfloat16 if bf16_matmul else jnp.float32)
    mask_d = jnp.asarray(mask_host)

    kernel = functools.partial(
        _bp_kernel_body,
        m=m,
        n=n,
        dc=dc,
        M8=M8,
        N8=N8,
        bp_method=bp_method,
        max_iter=max_iter,
        ms_scaling_factor=ms_scaling_factor,
        bf16_matmul=bf16_matmul,
    )

    def run(s_f32, llr0_tile, TB):
        B = s_f32.shape[1]
        grid = (B // TB,)
        dec, llr, meta = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((N8, TB), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (dc * M8, N8), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (dc * M8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec((N8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((N8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N8, B), jnp.float32),
                jax.ShapeDtypeStruct((N8, B), jnp.float32),
                jax.ShapeDtypeStruct((8, B), jnp.float32),
            ],
            interpret=interpret,
        )(s_f32, llr0_tile, G_d, mask_d)
        return dec, llr, meta

    def decode(syndrome_bm: jnp.ndarray, init_llr: jnp.ndarray) -> BpResult:
        B0 = syndrome_bm.shape[0]
        if B0 >= tile_b:
            B, TB = _round_up(B0, tile_b), tile_b
        else:
            B = TB = max(128, _round_up(B0, 128))
        if B != B0:  # zero-pad; padded lanes converge immediately
            syndrome_bm = jnp.concatenate(
                [syndrome_bm, jnp.zeros((B - B0, m), syndrome_bm.dtype)]
            )
        s = jnp.zeros((M8, B), jnp.float32)
        s = s.at[:m].set(syndrome_bm.T.astype(jnp.float32))
        llr0 = jnp.zeros((N8, TB), jnp.float32)
        llr0 = llr0.at[:n].set(
            jnp.broadcast_to(init_llr.astype(jnp.float32)[:, None], (n, TB))
        )
        # pad bits get +inf-ish llr so their hard decision is 0
        llr0 = llr0.at[n:].set(_BIG)
        dec, llr, meta = run(s, llr0, TB)
        return BpResult(
            decoding=dec[:n, :B0].T.astype(jnp.uint8),
            llr_posterior=llr[:n, :B0].T,
            converged=meta[0, :B0] > 0.5,
            iterations=meta[1, :B0].astype(jnp.int32),
        )

    return jax.jit(decode)
