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
    order0 = lsd_order == 0 or lsd_method == LSD_0
    W = lsd_order
    pats_np = None if order0 else _pattern_table(lsd_method, W)
    use_singles = (not order0) and lsd_method == LSD_CS
    from ldpc_tpu.ops.uf import (
        grow_until_valid_fast,
        make_masked_solver_or_none,
    )

    fast_solver = make_masked_solver_or_none(graph, dtype) if order0 else None
    fast_solver_w = (
        None if order0 else make_masked_solver_or_none(graph, dtype)
    )
    export_solver = None
    if fast_solver_w is not None:
        try:
            from ldpc_tpu.ops.gf2_pallas import make_masked_export_solver

            export_solver = make_masked_export_solver(graph)
        except ValueError:
            export_solver = None

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

        inf_d = jnp.array(np.inf, dtype)
        row_iota = jnp.arange(m, dtype=jnp.int32)

        def msolve(in_bit, with_reduced=False):
            """Masked solve with everything in ORIGINAL column coords:
            (ispiv (B,n), synd_red (B,m), used (B,m), valid (B,),
            Rt (B,n+1,m) or None, prc (B,n) pivot row per column)."""
            if export_solver is not None:
                key = jnp.where(in_bit, llrs.astype(dtype), inf_d)
                order_ = jnp.argsort(key, axis=1, stable=True).astype(
                    jnp.int32
                )
                count = in_bit.sum(axis=1).astype(jnp.int32)
                R, synd_red, col_of_row, used = export_solver(
                    syndromes, order_, count
                )
                cr = jnp.minimum(col_of_row, n)
                ispiv = (
                    jnp.zeros((B, n + 1), bool).at[bidx, cr].max(used)
                )[:, :n]
                prc = (
                    jnp.full((B, n + 1), m, jnp.int32)
                    .at[bidx, cr]
                    .set(jnp.where(used, row_iota[None, :], m))
                )[:, :n]
                Rt = (
                    jnp.concatenate(
                        [
                            R.transpose(0, 2, 1),
                            jnp.zeros((B, 1, m), jnp.uint8),
                        ],
                        axis=1,
                    )
                    if with_reduced
                    else None
                )
                valid = ~((synd_red == 1) & ~used).any(axis=1)
                return ispiv, synd_red, used, valid, Rt, prc
            res, order_ = masked_solve(
                graph, in_bit, syndromes, llrs, dtype,
                with_reduced=with_reduced,
            )
            ispiv = (
                jnp.zeros((B, n), bool).at[bidx, order_].set(res.is_pivot)
            )
            prc = (
                jnp.full((B, n), m, jnp.int32)
                .at[bidx, order_]
                .set(res.piv_row_of_col)
            )
            Rt = (
                jnp.zeros((B, n + 1, m), jnp.uint8)
                .at[bidx, order_]
                .set(res.reduced.transpose(0, 2, 1))
                if with_reduced
                else None
            )
            return ispiv, res.synd_red, res.row_used, res.valid, Rt, prc

        if fast_solver_w is not None:
            # fused growth (identical states to the XLA loop — the two
            # engines' per-round join sets are equivalent)
            in_bit, _, _ = grow_until_valid_fast(
                graph, syndromes, llrs, bits_per_step, dtype, fast_solver_w
            )
            ispiv_orig, *_ = msolve(in_bit)
        else:
            in_bit, res, order = grow_until_valid(
                graph, syndromes, llrs, bits_per_step, dtype
            )
            if order0:
                decoding = (
                    jnp.zeros((B, n), jnp.uint8).at[bidx, order].set(res.x0)
                )
                return decoding, res.valid
            ispiv_orig = (
                jnp.zeros((B, n), bool).at[bidx, order].set(res.is_pivot)
            )

        # ---- grow every cluster until its nullity reaches lsd_order
        # (lsd.hpp:792-810; bounded to lsd_order extra single-bit rounds)
        def dim_round(t, state):
            in_bit, ispiv = state
            labels, _ = _propagate_labels(graph, in_bit, seed_checks)
            collab = bit_labels(labels, in_bit)
            nonpiv_in = in_bit & ~ispiv
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
            ispiv2, *_ = msolve(new_in)
            return new_in, ispiv2

        in_bit, _ = jax.lax.fori_loop(
            0, W, dim_round, (in_bit, ispiv_orig)
        )
        # final solve carries the REDUCED matrix for the candidate sweep
        # (candidate solutions read off as y = Ts ^ XOR of reduced
        # columns — no m x m row transform is ever formed)
        ispiv_orig, synd_red, row_used, valid_out, Rt_orig, prc_orig = (
            msolve(in_bit, with_reduced=True)
        )

        labels, _ = _propagate_labels(graph, in_bit, seed_checks)
        collab = bit_labels(labels, in_bit)
        nonpiv_in = in_bit & ~ispiv_orig
        rank, colof = nonpivot_rank(collab, nonpiv_in, llrs)

        # ---- candidate construction ----------------------------------
        # per-candidate: original column set (<= W cols), cluster label,
        # enumeration index within its cluster (tie-break order:
        # baseline=0 < singles by rank < slot patterns)
        base_score = (
            (synd_red * row_used).sum(axis=1).astype(jnp.int32)
        )  # (B,) baseline pivot-solution weight

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

        # ---- evaluate all candidates in one pass ----------------------
        # y_q = Ts ^ XOR of the candidate's REDUCED columns (block
        # diagonality keeps each column's support inside its cluster);
        # candidate score = global pivot-solution Hamming weight
        # (osd_dense.hpp:106-113) = sum over used rows of y_q
        ybits = jnp.broadcast_to(
            synd_red[:, None, :], (B, C, m)
        )  # (B, C, m)
        for w in range(W):
            dsel = jnp.take_along_axis(
                Rt_orig, cols[:, :, w][:, :, None], axis=1
            )  # (B, C, m): the w-th candidate column of every candidate
            ybits = ybits ^ dsel
        used_f = row_used.astype(jnp.float32)  # (B, m)
        score = (
            jnp.einsum(
                "bm,bcm->bc",
                used_f,
                ybits.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            + sizes
        )
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
        # flip vector: each improved cluster's winning candidate columns
        # (clusters at the baseline contribute nothing)
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
        # combined pivot solution: y* = Ts ^ R @ flip — per-cluster
        # winners compose because reduced columns stay inside their
        # cluster's rows (block diagonality)
        ystar = synd_red.astype(jnp.float32) + jnp.einsum(
            "bn,bnm->bm",
            flip[:, :n].astype(jnp.float32),
            Rt_orig[:, :n, :].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        ystar = ystar - 2.0 * jnp.floor(ystar * 0.5)  # (B, m)
        # readout: x[j] = y*[pivot row of column j] (original coords)
        sel = (
            prc_orig[:, :, None] == jnp.arange(m, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)  # (B, n, m); non-pivots -> zero row
        x_piv = jnp.einsum(
            "bm,bnm->bn", ystar, sel, preferred_element_type=jnp.float32
        ).astype(jnp.uint8)
        decoding = x_piv | flip[:, :n]
        return decoding, valid_out

    return jax.jit(decode)
