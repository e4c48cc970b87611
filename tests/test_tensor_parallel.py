"""Tensor (model) parallel BP: check-axis sharded Tanner graph
(SURVEY.md §2.4 model-parallel plan)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from ldpc_tpu.codes import hamming_code, surface_code
from ldpc_tpu.ops import bp as bp_ops
from ldpc_tpu.ops.pcm import compile_pcm
from ldpc_tpu.parallel import TpBpDecoder, make_tp_bp_decoder


def _workload(seed=0, B=32, p=0.05):
    code = surface_code(5)
    H = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(seed)
    errors = (rng.random((B, H.shape[1])) < p).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)
    return code.hx, H, syndromes


def _mesh_1d(axis):
    return Mesh(np.asarray(jax.devices()), (axis,))


@pytest.mark.parametrize("method", [bp_ops.MINIMUM_SUM, bp_ops.PRODUCT_SUM])
def test_tp_bp_matches_replicated_engine(method):
    """Check-sharded BP over the full device mesh == the single-device
    gather-only engine (same schedule, same decisions)."""
    pcm, H, syndromes = _workload()
    graph = compile_pcm(pcm)
    channel = np.full(graph.n, 0.05)
    llr = bp_ops.channel_llr(channel)

    ref_fn = bp_ops.make_parallel_decoder(graph, method, 20, 0.625)
    ref = ref_fn(syndromes, np.asarray(llr))

    tp_fn = make_tp_bp_decoder(
        graph, _mesh_1d("code"), bp_method=method, max_iter=20,
        ms_scaling_factor=0.625,
    )
    got = tp_fn(syndromes, np.asarray(llr))

    assert np.array_equal(
        np.asarray(got.converged), np.asarray(ref.converged)
    )
    assert np.array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    conv = np.asarray(ref.converged)
    assert np.array_equal(
        np.asarray(got.decoding)[conv], np.asarray(ref.decoding)[conv]
    )
    np.testing.assert_allclose(
        np.asarray(got.llr_posterior), np.asarray(ref.llr_posterior),
        rtol=2e-4, atol=2e-4,
    )


def test_tp_bp_2d_mesh_batch_and_code():
    """2-D (batch, code) mesh: DP over shots x TP over checks."""
    ndev = len(jax.devices())
    if ndev < 4:
        pytest.skip("needs >=4 devices for a 2-D mesh")
    pcm, H, syndromes = _workload(seed=1, B=24)
    graph = compile_pcm(pcm)
    llr = bp_ops.channel_llr(np.full(graph.n, 0.05))

    devs = np.asarray(jax.devices()[: (ndev // 2) * 2]).reshape(-1, 2)
    mesh = Mesh(devs, ("batch", "code"))
    tp_fn = make_tp_bp_decoder(
        graph, mesh, max_iter=20, ms_scaling_factor=0.625
    )
    got = tp_fn(syndromes, np.asarray(llr))

    ref = bp_ops.make_parallel_decoder(
        graph, bp_ops.MINIMUM_SUM, 20, 0.625
    )(syndromes, np.asarray(llr))
    assert np.array_equal(
        np.asarray(got.converged), np.asarray(ref.converged)
    )
    conv = np.asarray(ref.converged)
    assert np.array_equal(
        np.asarray(got.decoding)[conv], np.asarray(ref.decoding)[conv]
    )


def test_tp_decoder_class_valid_decodings():
    pcm, H, syndromes = _workload(seed=2)
    dec = TpBpDecoder(
        pcm, _mesh_1d("code"), error_rate=0.05, max_iter=25,
        bp_method="ms", ms_scaling_factor=0.625,
    )
    out = dec.decode_batch(syndromes)
    conv = dec.converged
    assert conv.sum() > 0
    assert ((out[conv] @ H.T) % 2 == syndromes[conv]).all()
    one = dec.decode(syndromes[0])
    assert one.shape == (H.shape[1],)


def test_tp_bp_uneven_checks_padding():
    """m not divisible by the device count exercises the dummy-check
    padding (hamming(3): m=3 checks over 8 devices)."""
    H = hamming_code(3)
    graph = compile_pcm(H)
    Hd = np.asarray(H.todense(), np.uint8)
    rng = np.random.default_rng(3)
    errors = (rng.random((16, graph.n)) < 0.08).astype(np.uint8)
    syndromes = (errors @ Hd.T % 2).astype(np.uint8)
    llr = bp_ops.channel_llr(np.full(graph.n, 0.08))

    tp_fn = make_tp_bp_decoder(graph, _mesh_1d("code"), max_iter=15,
                               ms_scaling_factor=0.625)
    got = tp_fn(syndromes, np.asarray(llr))
    ref = bp_ops.make_parallel_decoder(
        graph, bp_ops.MINIMUM_SUM, 15, 0.625
    )(syndromes, np.asarray(llr))
    assert np.array_equal(
        np.asarray(got.converged), np.asarray(ref.converged)
    )
    conv = np.asarray(ref.converged)
    assert np.array_equal(
        np.asarray(got.decoding)[conv], np.asarray(ref.decoding)[conv]
    )
