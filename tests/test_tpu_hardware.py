"""Hardware lane: the real-TPU-only lowerings, validated on the chip.

The rest of the suite pins the CPU backend (conftest.py), so the Pallas
kernels are otherwise only exercised in interpret mode and a
TPU-only lowering bug (e.g. a Mosaic reduction or a one-hot MXU
contraction) would pass everything. These tests run only when the
session is on a real TPU (``LDPC_TPU_TESTS=1 pytest -m tpu``, see
tools/tpu_smoke.py, invoked from bench.py every round) and compare the
fused kernels against the XLA engine on-device.

Counterpart: the reference's python_test/ runs against its real compiled
engine; this is the equivalent for the TPU build.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs a real TPU"
    ),
]


@pytest.fixture(scope="module")
def workload():
    from ldpc_tpu.codes import surface_code
    from ldpc_tpu.ops.pcm import compile_pcm

    code = surface_code(13)
    H = np.asarray(code.hx.todense(), np.uint8)
    graph = compile_pcm(code.hx)
    rng = np.random.default_rng(7)
    errors = (rng.random((1024, H.shape[1])) < 0.02).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)
    llrs = rng.normal(2.0, 1.0, (1024, H.shape[1])).astype(np.float32)
    return code, H, graph, syndromes, llrs


def test_pallas_bp_matches_xla(workload):
    """Fused-VMEM BP kernel vs the XLA engine on-chip (decisions and
    convergence must agree; LLRs to fp tolerance)."""
    from ldpc_tpu.ops import bp as bp_ops
    from ldpc_tpu.ops import bp_pallas

    code, H, graph, syndromes, llrs = workload
    init_llr = jnp.asarray(
        bp_ops.channel_llr(np.full(H.shape[1], 0.01), dtype=np.float32)
    )
    syn = jnp.asarray(syndromes[:512])
    fn_p = bp_pallas.make_parallel_decoder_pallas(graph, bp_ops.MINIMUM_SUM, 12, 0.625)
    fn_x = bp_ops.make_parallel_decoder(graph, bp_ops.MINIMUM_SUM, 12, 0.625)
    rp = fn_p(syn, init_llr)
    rx = fn_x(syn, init_llr)
    conv_p, conv_x = np.asarray(rp.converged), np.asarray(rx.converged)
    dec_p, dec_x = np.asarray(rp.decoding), np.asarray(rx.decoding)
    assert (conv_p == conv_x).mean() > 0.99
    agree = conv_p & conv_x
    assert (dec_p[agree] == dec_x[agree]).all()


def test_pallas_osd0_matches_xla(workload):
    """Fused OSD-0 elimination vs gf2.batched_rref, identical solutions."""
    from ldpc_tpu.ops import gf2
    from ldpc_tpu.ops.gf2_pallas import make_osd0_solver

    code, H, graph, syndromes, llrs = workload
    syn = jnp.asarray(syndromes[:512])
    llr = jnp.asarray(llrs[:512])
    x0_p, valid_p = make_osd0_solver(graph)(syn, llr)
    order = jnp.argsort(llr, axis=1, stable=True).astype(jnp.int32)
    H_perm = jnp.take(jnp.asarray(graph.dense), order, axis=1).transpose(1, 0, 2)
    res = gf2.batched_rref(H_perm, syn, with_transform=False, fast_exit=True)
    B = syn.shape[0]
    bidx = np.arange(B)[:, None]
    x0_x = np.zeros((B, H.shape[1]), np.uint8)
    x0_x[bidx, np.asarray(order)] = np.asarray(res.x0)
    assert (np.asarray(valid_p) == np.asarray(res.valid)).all()
    assert (np.asarray(x0_p) == x0_x).all()


def test_rref_export_matches_xla(workload):
    """Reduced-matrix-export kernel vs the XLA full rref: same pivot
    columns, reduced syndrome, and OSD-0 readout."""
    from ldpc_tpu.ops import gf2
    from ldpc_tpu.ops.gf2_pallas import make_rref_export_solver

    code, H, graph, syndromes, llrs = workload
    syn = jnp.asarray(syndromes[:256])
    llr = jnp.asarray(llrs[:256])
    R, synd_red, col_of_row, used = make_rref_export_solver(graph)(syn, llr)
    order = jnp.argsort(llr, axis=1, stable=True).astype(jnp.int32)
    H_perm = jnp.take(jnp.asarray(graph.dense), order, axis=1).transpose(1, 0, 2)
    res = gf2.batched_rref(H_perm, syn, with_transform=False)
    assert (np.asarray(synd_red) == np.asarray(res.synd_red)).all()
    assert (np.asarray(used) == np.asarray(res.row_used)).all()
    # pivot columns agree (kernel reports original coords)
    B = syn.shape[0]
    piv_cols_x = np.sort(
        np.where(
            np.asarray(res.is_pivot),
            np.asarray(order),
            H.shape[1],
        ),
        axis=1,
    )
    piv_cols_p = np.sort(
        np.where(np.asarray(used), np.asarray(col_of_row), H.shape[1]),
        axis=1,
    )[:, : piv_cols_x.shape[1]]
    k = int(np.asarray(res.is_pivot).sum(axis=1)[0])
    assert (
        np.sort(piv_cols_p, axis=1)[:, :k] == piv_cols_x[:, :k]
    ).all()


def test_masked_solver_matches_xla(workload):
    """Fused cluster solver vs the XLA masked rref (UF inversion mode)."""
    from ldpc_tpu.ops import uf

    code, H, graph, syndromes, llrs = workload
    syn = jnp.asarray(syndromes[:256])
    llr = jnp.asarray(llrs[:256])
    solver = uf.make_masked_solver_or_none(graph, jnp.float32)
    assert solver is not None
    f = jax.jit(
        lambda s, l: uf.grow_until_valid_fast(
            graph, s, l, 0, jnp.float32, solver
        )
    )
    in_f, x0_f, valid_f = [np.asarray(x) for x in f(syn, llr)]
    g = jax.jit(
        lambda s, l: uf.grow_until_valid(graph, s, l, 0, jnp.float32)
    )
    in_x, res, order = g(syn, llr)
    B = syn.shape[0]
    bidx = np.arange(B)[:, None]
    x0_x = np.zeros((B, H.shape[1]), np.uint8)
    x0_x[bidx, np.asarray(order)] = np.asarray(res.x0)
    assert (in_f == np.asarray(in_x)).all()
    assert (x0_f == x0_x).all()
    assert (valid_f == np.asarray(res.valid)).all()


@pytest.mark.parametrize(
    "family,kwargs",
    [
        ("BpOsdDecoder", dict(osd_method="osd_0")),
        ("BpOsdDecoder", dict(osd_method="osd_cs", osd_order=2)),
        ("BpLsdDecoder", dict(lsd_method="lsd_0")),
        ("BeliefFindDecoder", dict(uf_method="inversion")),
        ("BeliefFindDecoder", dict(uf_method="peeling")),
    ],
)
def test_fused_decode_batch_valid(workload, family, kwargs):
    """Every fused cascade family produces syndrome-valid decodings on
    the chip, and the overflow-checked bucket path reports convergence
    consistently."""
    import ldpc_tpu

    code, H, graph, syndromes, llrs = workload
    cls = getattr(ldpc_tpu, family)
    dec = cls(
        code.hx,
        error_rate=0.01,
        max_iter=20,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        **kwargs,
    )
    out = np.asarray(dec.decode_batch(syndromes))
    assert ((out @ H.T) % 2 == syndromes).all()
    conv = np.asarray(dec.converge_batch)
    assert conv.shape == (syndromes.shape[0],)


def test_fused_vs_plain_cascade_agree(workload):
    """The single-dispatch fused BpOsd path and the multi-pull XLA
    cascade produce identical decodings for converged rows and
    syndrome-valid results everywhere."""
    from ldpc_tpu import BpOsdDecoder

    code, H, graph, syndromes, llrs = workload
    kw = dict(
        error_rate=0.01,
        max_iter=20,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        osd_method="osd_0",
    )
    fused = BpOsdDecoder(code.hx, **kw)
    out_f = np.asarray(fused.decode_batch(syndromes))
    plain = BpOsdDecoder(code.hx, **kw)
    plain._fused_unavailable = True  # force the XLA multi-pull path
    out_p = np.asarray(plain.decode_batch(syndromes))
    assert ((out_f @ H.T) % 2 == syndromes).all()
    assert ((out_p @ H.T) % 2 == syndromes).all()
    conv = np.asarray(fused.converge_batch) & np.asarray(plain.converge_batch)
    assert (out_f[conv] == out_p[conv]).all()


def test_device_window_scan_valid():
    """The device window-scan decoder runs on-chip: the committed total
    correction reproduces the final (perfect) round's syndrome."""
    from ldpc_tpu.codes import surface_code
    from ldpc_tpu.parallel import make_window_decoder

    code = surface_code(5)
    H = np.asarray(code.hx.todense(), np.uint8)
    m, n = H.shape
    W, R, B = 4, 10, 8
    rng = np.random.default_rng(3)
    syn = np.zeros((B, m, R), np.uint8)
    err = np.zeros((B, n), np.uint8)
    for t in range(R):
        err ^= (rng.random((B, n)) < 0.01).astype(np.uint8)
        s = (err @ H.T) % 2
        if t < R - 1:
            s = s ^ (rng.random((B, m)) < 0.01)
        syn[:, :, t] = s
    dec = make_window_decoder(code.hx, W, 0.01, 0.01, max_iter=12)
    res = dec(jnp.asarray(syn))
    corr = np.asarray(res.correction)
    # windowed commits under measurement noise: residual closes the
    # syndrome for almost every lane (same bar as test_device_window)
    residual = err ^ corr
    assert ((residual @ H.T) % 2 == 0).all(axis=1).mean() > 0.9


def test_masked_export_matches_xla(workload):
    """The masked-export kernel's reduced matrix / pivot bookkeeping vs
    the XLA masked solve, on-chip."""
    from ldpc_tpu.ops import uf
    from ldpc_tpu.ops.gf2_pallas import make_masked_export_solver

    code, H, graph, syndromes, llrs = workload
    n = H.shape[1]
    B = 256
    syn = jnp.asarray(syndromes[:B])
    llr = jnp.asarray(llrs[:B])
    rng = np.random.default_rng(3)
    in_bit = jnp.asarray(rng.random((B, n)) < 0.15)
    solver = make_masked_export_solver(graph)
    key = jnp.where(in_bit, llr, jnp.inf)
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    count = in_bit.sum(axis=1).astype(jnp.int32)
    R, synd_red, col_of_row, used = solver(syn, order, count)
    res, order_x = uf.masked_solve(
        graph, in_bit, syn, llr, jnp.float32, with_reduced=True
    )
    assert (np.asarray(synd_red) == np.asarray(res.synd_red)).all()
    assert (np.asarray(used) == np.asarray(res.row_used)).all()
    # reduced matrices agree on the IN-CLUSTER columns after unpermuting
    # the XLA one (out-of-cluster columns differ by design: the XLA path
    # zero-masks them while the kernel carries T @ H there; no consumer
    # reads them)
    bidx = np.arange(B)[:, None]
    R_x = np.zeros((B, H.shape[0], n + 1), np.uint8)
    R_x[bidx[:, :, None], np.arange(H.shape[0])[None, :, None],
        np.asarray(order_x)[:, None, :]] = np.asarray(res.reduced)
    inb = np.asarray(in_bit)[:, None, :]
    assert (np.where(inb, np.asarray(R), 0) == np.where(
        inb, R_x[:, :, :n], 0
    )).all()


def test_lsd_order_w_fused_valid(workload):
    """LSD-CS order-2 through the fused cascade on-chip: valid
    decodings, and agreement with the forced generic path on converged
    rows."""
    from ldpc_tpu import BpLsdDecoder

    code, H, graph, syndromes, llrs = workload
    kw = dict(
        error_rate=0.01,
        max_iter=20,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        lsd_method="lsd_cs",
        lsd_order=2,
    )
    dec = BpLsdDecoder(code.hx, **kw)
    out = np.asarray(dec.decode_batch(syndromes))
    assert ((out @ H.T) % 2 == syndromes).all()
    plain = BpLsdDecoder(code.hx, **kw)
    plain._fused_unavailable = True
    out_p = np.asarray(plain.decode_batch(syndromes[:256]))
    assert ((out_p @ H.T) % 2 == syndromes[:256]).all()
    conv = np.asarray(dec.converge_batch)[:256] & np.asarray(
        plain.converge_batch
    )
    assert (out[:256][conv] == out_p[conv]).all()


def test_device_owd_scan_on_chip():
    """The DEM overlapping-window device scan produces host-loop-equal
    predictions on the real chip."""
    import sys

    sys.path.insert(0, os_path_tests())
    from test_ckt_noise import rep_code_memory_dem

    from ldpc_tpu.ckt_noise import BpOsdOverlappingWindowDecoder
    from ldpc_tpu.ckt_noise.dem_matrices import (
        detector_error_model_to_check_matrices,
    )

    dem = rep_code_memory_dem(n_checks=3, rounds=14)
    kwargs = dict(
        decodings=6, window=4, commit=2, num_checks=3,
        decoder_config={"max_iter": 20},
    )
    dec = BpOsdOverlappingWindowDecoder(dem, **kwargs)
    assert dec._maybe_device_scan() is not None
    host = BpOsdOverlappingWindowDecoder(dem, **kwargs)
    host._device_scan = None
    m = detector_error_model_to_check_matrices(
        dem, allow_undecomposed_hyperedges=True
    )
    Hd = np.asarray(m.check_matrix.todense(), np.uint8)
    rng = np.random.default_rng(11)
    errs = (rng.random((32, Hd.shape[1])) < 0.03).astype(np.uint8)
    shots = ((errs @ Hd.T) % 2).astype(np.uint8)
    assert np.array_equal(
        dec.decode_batch(shots.copy()) % 2,
        host.decode_batch(shots.copy()) % 2,
    )


def os_path_tests():
    import os

    return os.path.dirname(os.path.abspath(__file__))
