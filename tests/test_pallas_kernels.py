"""Pallas kernel parity vs the XLA engines (interpreter mode on CPU).

The fused TPU kernels (ops/bp_pallas.py, ops/gf2_pallas.py) are designed
to reproduce the XLA engines' results exactly (same pivot choices, same
message values up to summation association). These tests run them in
Pallas interpreter mode so CI without a TPU still covers the kernel
logic end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldpc_tpu.codes import surface_code, hamming_code
from ldpc_tpu.ops import bp as bp_ops
from ldpc_tpu.ops import osd as osd_ops
from ldpc_tpu.ops.pcm import compile_pcm


@pytest.fixture(scope="module")
def workload():
    code = surface_code(3)
    graph = compile_pcm(code.hx)
    H = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(11)
    B = 128
    errors = (rng.random((B, graph.n)) < 0.08).astype(np.uint8)
    syn = (errors @ H.T % 2).astype(np.uint8)
    llr = jnp.asarray(bp_ops.channel_llr(np.full(graph.n, 0.08)))
    return graph, H, jnp.asarray(syn), llr


@pytest.mark.parametrize("method", [bp_ops.MINIMUM_SUM, bp_ops.PRODUCT_SUM])
def test_bp_pallas_matches_xla(workload, method):
    from ldpc_tpu.ops.bp_pallas import make_parallel_decoder_pallas

    graph, H, syn, llr = workload
    pfn = make_parallel_decoder_pallas(graph, method, 8, 0.625, interpret=True)
    xfn = bp_ops.make_parallel_decoder(graph, method, 8, 0.625)
    rp = pfn(syn, llr)
    rx = xfn(syn, llr)
    assert (np.asarray(rp.converged) == np.asarray(rx.converged)).all()
    assert (np.asarray(rp.iterations) == np.asarray(rx.iterations)).all()
    # decisions may differ on exact fp ties (bit-side summation order);
    # none occur on this workload
    assert (np.asarray(rp.decoding) == np.asarray(rx.decoding)).all()


def test_bp_pallas_dynamic_alpha(workload):
    from ldpc_tpu.ops.bp_pallas import make_parallel_decoder_pallas

    graph, H, syn, llr = workload
    pfn = make_parallel_decoder_pallas(
        graph, bp_ops.MINIMUM_SUM, 6, 0.0, interpret=True
    )
    xfn = bp_ops.make_parallel_decoder(graph, bp_ops.MINIMUM_SUM, 6, 0.0)
    rp, rx = pfn(syn, llr), xfn(syn, llr)
    assert (np.asarray(rp.converged) == np.asarray(rx.converged)).all()
    assert (np.asarray(rp.decoding) == np.asarray(rx.decoding)).all()


def test_osd0_pallas_matches_xla(workload):
    from ldpc_tpu.ops.gf2_pallas import make_osd0_solver

    graph, H, syn, llr = workload
    xfn = bp_ops.make_parallel_decoder(graph, bp_ops.MINIMUM_SUM, 5, 0.625)
    rx = xfn(syn, llr)
    solver = make_osd0_solver(graph, interpret=True)
    x0, valid = solver(syn, rx.llr_posterior)
    osd_fn = osd_ops.make_osd_decoder(
        graph, np.full(graph.n, 0.08), osd_ops.OSD_0, 0
    )
    d0, _, v = osd_fn(syn, rx.llr_posterior)
    assert (np.asarray(x0) == np.asarray(d0)).all()
    assert (np.asarray(valid) == np.asarray(v)).all()
    syn_np = np.asarray(syn)
    ok = ((np.asarray(x0) @ H.T) % 2 == syn_np).all(axis=1)
    assert ok.all()


@pytest.mark.parametrize("bits_per_step", [0, 1, 2])
def test_fused_uf_growth_matches_xla(workload, bits_per_step):
    """The fused growth loop (grow_until_valid_fast + interpret-mode
    masked solver) must reproduce the XLA engine (grow_until_valid)
    bit-for-bit: same cluster membership, same solutions, same validity.
    This is the default-on TPU path of make_uf_decoder/make_lsd_decoder."""
    from ldpc_tpu.ops import uf
    from ldpc_tpu.ops.gf2_pallas import make_masked_solver

    graph, H, syn, llr = workload
    assert uf.fused_growth_supported(graph)
    B = syn.shape[0]
    xfn = bp_ops.make_parallel_decoder(graph, bp_ops.MINIMUM_SUM, 4, 0.625)
    llrs = xfn(syn, llr).llr_posterior  # varied per-element orderings
    solver = make_masked_solver(graph, interpret=True)

    in_f, x0_f, valid_f = uf.grow_until_valid_fast(
        graph, syn, llrs, bits_per_step, jnp.float32, solver
    )
    in_x, res, order = uf.grow_until_valid(
        graph, syn, llrs, bits_per_step, jnp.float32
    )
    bidx = np.arange(B)[:, None]
    dec_x = np.zeros((B, graph.n), np.uint8)
    dec_x[bidx, np.asarray(order)] = np.asarray(res.x0)
    assert (np.asarray(in_f) == np.asarray(in_x)).all()
    assert (np.asarray(x0_f) == dec_x).all()
    assert (np.asarray(valid_f) == np.asarray(res.valid)).all()


def test_bp_pallas_pads_odd_batches(workload):
    from ldpc_tpu.ops.bp_pallas import make_parallel_decoder_pallas

    graph, H, syn, llr = workload
    pfn = make_parallel_decoder_pallas(
        graph, bp_ops.MINIMUM_SUM, 5, 0.625, interpret=True
    )
    r_small = pfn(syn[:100], llr)
    r_full = pfn(syn, llr)
    assert r_small.decoding.shape == (100, graph.n)
    assert (
        np.asarray(r_small.decoding) == np.asarray(r_full.decoding)[:100]
    ).all()


def test_bp_pallas_bf16_matmul_mode(workload):
    """bf16 one-hot matmuls: decisions statistically match, convergence
    flags exact (hard bits are exact in bf16)."""
    from ldpc_tpu.ops.bp_pallas import make_parallel_decoder_pallas

    graph, H, syn, llr = workload
    pfn = make_parallel_decoder_pallas(
        graph, bp_ops.MINIMUM_SUM, 8, 0.625, interpret=True, bf16_matmul=True
    )
    xfn = bp_ops.make_parallel_decoder(graph, bp_ops.MINIMUM_SUM, 8, 0.625)
    rp, rx = pfn(syn, llr), xfn(syn, llr)
    conv_p = np.asarray(rp.converged)
    assert (conv_p == np.asarray(rx.converged)).all()
    # converged decodings must reproduce their syndromes exactly
    dec = np.asarray(rp.decoding)
    syn_np = np.asarray(syn)
    valid = ((dec @ H.T) % 2 == syn_np).all(axis=1)
    assert (valid | ~conv_p).all()


def test_fused_decode_batch_two_phase_matches_plain_path():
    """The fused single-dispatch TPU program (`_decode_batch_tpu`) runs a
    two-phase cascade; its results must be element-for-element identical
    to a single-phase full-depth run of the same fused program (per-lane
    BP determinism). The XLA plain path is only compared loosely —
    min-sum tie flips make cross-engine bit equality impossible on
    non-converged lanes — but converged flags and iteration counts must
    agree with it exactly."""
    from ldpc_tpu.decoders.bposd_decoder import BpOsdDecoder

    code = surface_code(5)
    H = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(3)
    B = 300
    errors = (rng.random((B, H.shape[1])) < 0.12).astype(np.uint8)
    syn = (errors @ H.T % 2).astype(np.uint8)
    syn[7] = 0  # exercise the zero-syndrome fast path inside the program

    def build():
        return BpOsdDecoder(
            code.hx,
            error_rate=0.12,
            max_iter=18,
            bp_method="minimum_sum",
            ms_scaling_factor=0.625,
            osd_method="osd_0",
            osd_order=0,
        )

    packed = np.packbits(syn, axis=1, bitorder="little")
    nonzero = syn.any(axis=1)

    ref = build()
    ref._fused_interpret = True
    ref._CASCADE_ITERS = 18  # phase-1 == max_iter: single-phase program
    out_ref = ref.decode_batch(syn)  # CPU plain path for the loose checks
    conv_ref = ref.converge_batch.copy()
    iter_ref = ref.iter_batch.copy()
    out_single = ref._decode_batch_tpu(packed, B, nonzero)
    llr_single = np.asarray(ref.log_prob_ratios_batch)

    dec = build()
    dec._fused_interpret = True
    out_fused = dec._decode_batch_tpu(packed, B, nonzero)
    # exact equality vs the single-phase fused program
    assert (out_fused == out_single).all()
    assert (np.asarray(dec.log_prob_ratios_batch) == llr_single).all()
    # exact convergence/iteration parity vs the plain XLA path too
    assert (dec.converge_batch == conv_ref).all()
    assert (dec.iter_batch == iter_ref).all()
    # every decoding must reproduce its syndrome
    assert ((out_fused @ H.T) % 2 == syn).all()
    assert ((out_ref @ H.T) % 2 == syn).all()


def test_sparse_export_matches_dense_layout(monkeypatch):
    """The segmented sparse D2H export (base._sparse_export_plan) must
    reconstruct decodings bit-for-bit identical to the dense bit-packed
    layout, for both the generic fused cascade (BpDecoder) and the
    specialised BpOsd fused program; a forced segment-count overflow must
    fall back to a dense redispatch with identical results."""
    from ldpc_tpu.decoders import base as base_mod
    from ldpc_tpu.decoders.bp_decoder import BpDecoder
    from ldpc_tpu.decoders.bposd_decoder import BpOsdDecoder

    code = surface_code(5)
    H = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(5)
    B = 200
    # low error rate so the sparse plan actually engages
    errors = (rng.random((B, H.shape[1])) < 0.01).astype(np.uint8)
    syn = (errors @ H.T % 2).astype(np.uint8)
    syn[3] = 0

    def build(cls, **kw):
        d = cls(
            code.hx,
            error_rate=0.01,
            max_iter=12,
            bp_method="minimum_sum",
            ms_scaling_factor=0.625,
            **kw,
        )
        d._fused_interpret = True
        return d

    B = syn.shape[0]
    packed_syn = np.packbits(syn, axis=1, bitorder="little")
    nonzero = syn.any(axis=1)

    def drive(dec, bit_packed_output=False):
        # decode_batch routes to the plain XLA path off-TPU, so drive
        # the fused host loop directly (interpret-mode kernels)
        if isinstance(dec, BpOsdDecoder):
            return dec._decode_batch_tpu(
                packed_syn.copy(), B, nonzero,
                bit_packed_output=bit_packed_output,
            )
        return dec._decode_batch_fused(
            syn, nonzero, post_key="bp_only", post_builder=None,
            bit_packed_output=bit_packed_output,
        )[0]

    for cls, kw in [
        (BpDecoder, {}),
        (BpOsdDecoder, dict(osd_method="osd_0", osd_order=0)),
    ]:
        Bpad = 256
        Wb = -(-H.shape[1] // 8)
        wbar = 0.01 * H.shape[1]
        assert (
            base_mod._sparse_export_plan(Bpad, H.shape[1], Wb, wbar)
            is not None
        ), "sparse plan must engage at this workload"
        d_sparse = build(cls, **kw)
        out_sparse = drive(d_sparse)
        conv_s, iter_s = (
            d_sparse.converge_batch.copy(),
            d_sparse.iter_batch.copy(),
        )
        # dense layout: force the plan off
        monkeypatch.setattr(
            base_mod, "_sparse_export_plan", lambda *a: None
        )
        d_dense = build(cls, **kw)
        out_dense = drive(d_dense)
        monkeypatch.undo()
        assert (out_sparse == out_dense).all()
        assert (conv_s == d_dense.converge_batch).all()
        assert (iter_s == d_dense.iter_batch).all()
        # forced overflow: a 2-slot budget cannot hold real segments ->
        # host must redispatch dense and still return identical bits
        monkeypatch.setattr(
            base_mod,
            "_sparse_export_plan",
            lambda Bp, n, Wb_, w: (-(-(Bp * n) // base_mod._SEG_L), 2),
        )
        d_over = build(cls, **kw)
        out_over = drive(d_over)
        monkeypatch.undo()
        assert (out_over == out_dense).all()
        # bit-packed output goes through the same reconstruction
        packed = drive(build(cls, **kw), bit_packed_output=True)
        up = np.unpackbits(
            packed, axis=1, count=H.shape[1], bitorder="little"
        )
        assert (up == out_dense).all()


def test_sparse_export_sticky_optout(monkeypatch):
    """One segment overflow must permanently switch the decoder to the
    dense export (base._plan_unless_disabled): heavy-correction codes
    would otherwise pay a dense redispatch on every chunk."""
    from ldpc_tpu.decoders import base as base_mod
    from ldpc_tpu.decoders.bposd_decoder import BpOsdDecoder

    code = surface_code(5)
    H = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(9)
    B = 200
    errors = (rng.random((B, H.shape[1])) < 0.01).astype(np.uint8)
    syn = (errors @ H.T % 2).astype(np.uint8)
    dec = BpOsdDecoder(
        code.hx, error_rate=0.01, max_iter=12,
        bp_method="minimum_sum", ms_scaling_factor=0.625,
        osd_method="osd_0",
    )
    dec._fused_interpret = True
    packed = np.packbits(syn, axis=1, bitorder="little")
    nonzero = syn.any(axis=1)
    # force an overflow: a 1-slot segment budget cannot hold anything
    monkeypatch.setattr(
        base_mod,
        "_sparse_export_plan",
        lambda Bp, n, Wb, w: (-(-(Bp * n) // base_mod._SEG_L), 1),
    )
    out1 = dec._decode_batch_tpu(packed, B, nonzero)
    assert getattr(dec, "_seg_plan_off", False), "overflow must set the flag"
    # once off, the (broken) plan function must not be consulted again
    monkeypatch.setattr(
        base_mod,
        "_sparse_export_plan",
        lambda *a: (_ for _ in ()).throw(AssertionError("consulted")),
    )
    out2 = dec._decode_batch_tpu(packed, B, nonzero)
    assert (out1 == out2).all()
