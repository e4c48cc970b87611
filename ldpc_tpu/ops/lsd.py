"""Batched localized-statistics decoding (LSD) on device (JAX/XLA).

TPU-native re-design of the reference LSD decoder
(reference: src_cpp/lsd.hpp, arXiv:2406.18655). The reference grows one
cluster per flipped syndrome bit with an incremental PLU per cluster and,
for ``lsd_order > 0``, runs a dense OSD search inside each cluster
(lsd.hpp:683-838, osd_dense.hpp:101-153). Here the whole failed batch
decodes at once:

- cluster growth + validity reuse the union-find machinery
  (``ops.uf.grow_until_valid``): min-label propagation for clusters, one
  batched Gauss-Jordan of the column-masked global PCM per round — valid
  per cluster by block-diagonality. LSD's on-the-fly incremental PLU
  (gf2dense.hpp:325-407) is replaced by re-eliminating the masked system,
  which is cheap when batched.
- ``lsd_order == 0``: the masked solve IS the per-cluster lu_solve
  (lsd.hpp:743-760).
- ``lsd_order == w > 0``: clusters first grow until their nullity
  (non-pivot count) reaches w (lsd.hpp:786-810); then every cluster's
  OSD-w candidate sweep runs as ONE global MXU pass: flipping a cluster's
  non-pivot column only perturbs that cluster's block of the solution, so
  the *global* Hamming weight ranks candidates correctly within each
  cluster, and a per-label segment-min picks every cluster's winner
  simultaneously (osd_dense.hpp:106-140 scores per-cluster Hamming
  weight; tie-breaks prefer earlier candidates, as there).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.ops import gf2
from ldpc_tpu.ops.pcm import PcmGraph
from ldpc_tpu.ops.uf import (
    _INF,
    _grow,
    _propagate_labels,
    grow_until_valid,
    invalid_checks_from_rref,
    masked_solve,
)

LSD_0 = 0
LSD_E = 1
LSD_CS = 2


def _pattern_table(lsd_method: int, order: int) -> np.ndarray:
    """Per-cluster candidate patterns over the first ``order`` sorted
    non-pivot slots, in the reference's enumeration order
    (osd.hpp:75-101). Singles over *all* non-pivots (the CS rule) are
    handled separately; this table covers the slot-limited part:
    LSD_E -> all 2^order-1 nonzero patterns; LSD_CS -> weight-2 pairs.
    """
    pats = []
    if lsd_method == LSD_E:
        for i in range(1, 2**order):
            pats.append([(i >> j) & 1 for j in range(order)])
    elif lsd_method == LSD_CS:
        for a in range(order):
            for b in range(a + 1, order):
                row = [0] * order
                row[a] = 1
                row[b] = 1
                pats.append(row)
    if not pats:
        return np.zeros((0, max(order, 1)), np.uint8)
    return np.asarray(pats, np.uint8)


def make_lsd_decoder(
    graph: PcmGraph,
    lsd_method: int = LSD_0,
    lsd_order: int = 0,
    bits_per_step: int = 1,
    dtype=jnp.float32,
):
    """Build a jitted batched LSD decoder.

    Returns ``decode(syndromes: (B, m) uint8, llrs: (B, n)) ->
    (decoding: (B, n) uint8, valid: (B,) bool)``.
    """
    m, n = graph.m, graph.n
    if bits_per_step >= n:
        bits_per_step = 0  # grow-all fast path (see uf.make_uf_decoder)
    H_pad = jnp.concatenate(
        [jnp.asarray(graph.dense), jnp.zeros((m, 1), jnp.uint8)], axis=1
    )  # (m, n+1), col n = zero pad

    order0 = lsd_order == 0 or lsd_method == LSD_0
    W = lsd_order
    pats_np = None if order0 else _pattern_table(lsd_method, W)
    use_singles = (not order0) and lsd_method == LSD_CS
    from ldpc_tpu.ops.uf import (
        grow_until_valid_fast,
        make_masked_solver_or_none,
    )

    fast_solver = make_masked_solver_or_none(graph, dtype) if order0 else None

    def bit_labels(labels, in_bit):
        """Cluster label of each in-cluster column (min over its active
        adjacent checks)."""
        B = labels.shape[0]
        var_chks = jnp.asarray(graph.var_chks)
        var_mask = jnp.asarray(graph.var_mask)
        lab_pad = jnp.concatenate([labels, jnp.full((B, 1), _INF)], axis=1)
        bl = jnp.where(
            var_mask[None], jnp.take(lab_pad, var_chks, axis=1), _INF
        ).min(axis=2)
        return jnp.where(in_bit, bl, _INF)  # (B, n)

    def nonpivot_rank(collab, nonpiv_in, llrs):
        """Rank each non-pivot in-cluster column inside its cluster by
        ascending LLR (the reference's sort_non_pivot_cols,
        lsd.hpp:823). Returns (rank: (B, n) int32 or big, colof:
        (B, m+1, W) int32 column table, pad = n)."""
        B = collab.shape[0]
        bidx = jnp.arange(B)[:, None]
        lab = jnp.where(nonpiv_in, collab, _INF)
        sub = jnp.argsort(llrs.astype(dtype), axis=1, stable=True).astype(
            jnp.int32
        )
        lab_by_llr = jnp.take_along_axis(lab, sub, axis=1)
        seg = jnp.argsort(lab_by_llr, axis=1, stable=True).astype(jnp.int32)
        perm = jnp.take_along_axis(sub, seg, axis=1)  # (B, n) col ids
        lab_sorted = jnp.take_along_axis(lab, perm, axis=1)
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))
        is_start = jnp.concatenate(
            [jnp.ones((B, 1), bool), lab_sorted[:, 1:] != lab_sorted[:, :-1]],
            axis=1,
        )
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pos, 0), axis=1
        )
        rank_sorted = pos - seg_start
        rank = (
            jnp.full((B, n), n, jnp.int32)
            .at[bidx, perm]
            .set(jnp.where(lab_sorted < _INF, rank_sorted, n))
        )
        if W == 0:
            return rank, None
        colof = jnp.full((B, m + 1, W), n, jnp.int32)
        put = (rank_sorted < W) & (lab_sorted < _INF)
        colof = colof.at[
            bidx,
            jnp.where(put, jnp.minimum(lab_sorted, m), m),
            jnp.minimum(rank_sorted, W - 1),
        ].set(jnp.where(put, perm, n))
        return rank, colof

    def decode(syndromes: jnp.ndarray, llrs: jnp.ndarray):
        B = syndromes.shape[0]
        syndromes = syndromes.astype(jnp.uint8)
        bidx = jnp.arange(B)[:, None]
        seed_checks = syndromes == 1

        if order0 and fast_solver is not None:  # fused pallas (TPU)
            _, x0, valid = grow_until_valid_fast(
                graph, syndromes, llrs, bits_per_step, dtype, fast_solver
            )
            return x0, valid

        in_bit, res, order = grow_until_valid(
            graph, syndromes, llrs, bits_per_step, dtype
        )
        if order0:
            decoding = (
                jnp.zeros((B, n), jnp.uint8).at[bidx, order].set(res.x0)
            )
            return decoding, res.valid

        # ---- grow every cluster until its nullity reaches lsd_order
        # (lsd.hpp:792-810; bounded to lsd_order extra single-bit rounds)
        def dim_round(t, state):
            in_bit, res, order = state
            labels, _ = _propagate_labels(graph, in_bit, seed_checks)
            collab = bit_labels(labels, in_bit)
            ispiv_orig = (
                jnp.zeros((B, n), bool).at[bidx, order].set(res.is_pivot)
            )
            nonpiv_in = in_bit & ~ispiv_orig
            lab_clip = jnp.minimum(jnp.where(nonpiv_in, collab, _INF), m)
            nullity = (
                jnp.zeros((B, m + 1), jnp.int32)
                .at[bidx, lab_clip]
                .add(nonpiv_in.astype(jnp.int32))
            )
            needs = (
                (nullity[bidx, jnp.minimum(labels, m)] < W)
                & (labels < _INF)
            )
            new_in = _grow(graph, in_bit, labels, needs, llrs, 1, dtype)
            res2, order2 = masked_solve(graph, new_in, syndromes, llrs, dtype)
            return new_in, res2, order2

        in_bit, res, order = jax.lax.fori_loop(
            0, W, dim_round, (in_bit, res, order)
        )
        # final solve carries the row transform for the candidate sweep
        res, order = masked_solve(
            graph, in_bit, syndromes, llrs, dtype, with_transform=True
        )

        labels, _ = _propagate_labels(graph, in_bit, seed_checks)
        collab = bit_labels(labels, in_bit)
        ispiv_orig = jnp.zeros((B, n), bool).at[bidx, order].set(res.is_pivot)
        nonpiv_in = in_bit & ~ispiv_orig
        rank, colof = nonpivot_rank(collab, nonpiv_in, llrs)

        # ---- candidate construction ----------------------------------
        # per-candidate: original column set (<= W cols), cluster label,
        # enumeration index within its cluster (tie-break order:
        # baseline=0 < singles by rank < slot patterns)
        T_dense = gf2.unpack_u32(res.transform, m)  # (B, m, m) uint8
        xp0 = res.x0  # (B, n) baseline pivot solution (permuted coords)
        base_score = xp0.sum(axis=1).astype(jnp.int32)  # (B,)

        cand_cols = []  # list of (B, C_i, W) int32 blocks (pad col = n)
        cand_label = []  # (B, C_i)
        cand_enum = []  # (B, C_i) int32 enumeration ids (>=1)
        cand_size = []  # (B, C_i) pattern weights
        if use_singles:
            cols = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None, :], (B, n)
            )
            single_cols = jnp.full((B, n, W), n, jnp.int32)
            single_cols = single_cols.at[:, :, 0].set(
                jnp.where(nonpiv_in, cols, n)
            )
            cand_cols.append(single_cols)
            cand_label.append(jnp.where(nonpiv_in, collab, _INF))
            cand_enum.append(1 + jnp.minimum(rank, n).astype(jnp.int32))
            cand_size.append(nonpiv_in.astype(jnp.int32))
        if pats_np.shape[0]:
            P = pats_np.shape[0]
            pats = jnp.asarray(pats_np)  # (P, W)
            # (B, m+1, P, W): column of each pattern slot, pad n when unused
            pc = jnp.where(
                pats[None, None, :, :] == 1, colof[:, :, None, :], n
            )
            slot_needed = pats[None, None] == 1
            slot_ok = jnp.where(slot_needed, colof[:, :, None, :] < n, True)
            pat_valid = slot_ok.all(axis=3)  # (B, m+1, P)
            lab_grid = jnp.broadcast_to(
                jnp.arange(m + 1, dtype=jnp.int32)[None, :, None], (B, m + 1, P)
            )
            enum_grid = jnp.broadcast_to(
                (1 + n + jnp.arange(P, dtype=jnp.int32))[None, None, :],
                (B, m + 1, P),
            )
            size_grid = jnp.broadcast_to(
                pats.sum(axis=1).astype(jnp.int32)[None, None, :], (B, m + 1, P)
            )
            cand_cols.append(pc.reshape(B, (m + 1) * P, W))
            cand_label.append(
                jnp.where(pat_valid, lab_grid, _INF).reshape(B, (m + 1) * P)
            )
            cand_enum.append(enum_grid.reshape(B, (m + 1) * P))
            cand_size.append(size_grid.reshape(B, (m + 1) * P))

        cols = jnp.concatenate(cand_cols, axis=1)  # (B, C, W)
        labs = jnp.concatenate(cand_label, axis=1)  # (B, C)
        enums = jnp.concatenate(cand_enum, axis=1)  # (B, C)
        sizes = jnp.concatenate(cand_size, axis=1)  # (B, C)
        C = cols.shape[1]
        valid_cand = labs < _INF

        # ---- evaluate all candidates in one MXU pass ------------------
        # t_q = s ^ XOR of H columns in the candidate set
        delta = jnp.zeros((B, C, m), jnp.int32)
        for w in range(W):
            delta = delta + H_pad.T[cols[:, :, w]].astype(jnp.int32)
        t = (syndromes[:, :, None].astype(jnp.int32) + delta.transpose(0, 2, 1)) % 2
        # y = T @ t per batch element: (B, m, m) x (B, m, C) on the MXU.
        # f32 operands — integer einsums don't ride the TPU MXU; 0/1 row
        # sums are <= m < 2^24, exact in f32
        yf = jnp.einsum(
            "bij,bjc->bic",
            T_dense.astype(jnp.float32),
            t.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        y = (yf - 2.0 * jnp.floor(yf * 0.5)).astype(jnp.int32)  # (B, m, C)
        # pivot solution per candidate, permuted coords: (B, C, n).
        # xp[b,c,i] = y[b, piv_row_of_col[b,i], c] as a one-hot MXU
        # contraction — a (B, C, n) take_along_axis lowers to scalar
        # dynamic slices on TPU (hundreds of ms at realistic buckets).
        # Non-pivot columns have piv_row == m -> zero one-hot row -> 0.
        sel = (
            res.piv_row_of_col[:, :, None]
            == jnp.arange(m, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)  # (B, n, m)
        xp = jnp.einsum(
            "bjc,bij->bci",
            y.astype(jnp.float32),
            sel,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        score = xp.sum(axis=2).astype(jnp.int32) + sizes  # (B, C)
        score = jnp.where(valid_cand, score, jnp.int32(2**28))

        # ---- per-cluster winner (segment argmin, ties -> lower enum) ---
        STRIDE = jnp.int32(2 * n + 2)
        combined = score * STRIDE + jnp.minimum(enums, STRIDE - 1)
        lab_clip = jnp.minimum(labs, m)
        best = jnp.full((B, m + 1), jnp.int32(2**30))
        best = best.at[bidx, lab_clip].min(
            jnp.where(valid_cand, combined, jnp.int32(2**30))
        )
        base_combined = base_score[:, None] * STRIDE  # enum 0
        improved = best < base_combined  # (B, m+1) cluster has a winner
        win_enum = jnp.where(improved, best % STRIDE, 0)

        # ---- compose the global solution -------------------------------
        # pivot part: for each permuted column, take xp of its cluster's
        # winning candidate (baseline xp0 when enum 0)
        is_winner = valid_cand & (
            win_enum[bidx, lab_clip] == jnp.minimum(enums, STRIDE - 1)
        ) & improved[bidx, lab_clip]
        # map each cluster to its winning candidate slot (first match)
        win_slot = jnp.full((B, m + 1), C, jnp.int32)
        win_slot = win_slot.at[bidx, lab_clip].min(
            jnp.where(
                is_winner,
                jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (B, C)),
                C,
            )
        )
        labperm = jnp.take_along_axis(
            jnp.minimum(collab, m), order, axis=1
        )  # (B, n) cluster of each permuted column (m if none)
        slot_of_col = jnp.where(
            labperm < m, win_slot[bidx, labperm], C
        )  # (B, n), C = baseline
        xp_ext = jnp.concatenate(
            [xp.astype(jnp.uint8), xp0[:, None, :]], axis=1
        )  # (B, C+1, n)
        x_perm = jnp.take_along_axis(
            xp_ext, slot_of_col[:, None, :], axis=1
        )[:, 0, :]
        decoding = jnp.zeros((B, n), jnp.uint8).at[bidx, order].set(x_perm)
        # non-pivot part: flip each cluster winner's candidate columns
        flip = jnp.zeros((B, n + 1), jnp.uint8)
        for w in range(W):
            wc = jnp.take_along_axis(
                jnp.concatenate(
                    [cols[:, :, w], jnp.full((B, 1), n, jnp.int32)], axis=1
                ),
                jnp.minimum(win_slot, C),  # (B, m+1)
                axis=1,
            )  # (B, m+1): the w-th flipped column of each cluster's winner
            flip = flip.at[bidx, wc].set(1)
        decoding = decoding | flip[:, :n]
        return decoding, res.valid

    return jax.jit(decode)
