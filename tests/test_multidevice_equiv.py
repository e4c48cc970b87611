"""1-vs-N device equivalence (SURVEY.md §4.3's multi-device test plan).

The data-parallel story is only honest if moving the SAME work onto more
devices changes nothing: decodes are deterministic functions of their
syndromes, and the sharded Monte-Carlo step is a psum of per-device
programs. Both are asserted bit-exactly on the CPU mesh here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldpc_tpu.codes import surface_code
from ldpc_tpu.monte_carlo_simulation import (
    make_mc_decoder_step,
    make_sharded_mc_step,
)
from ldpc_tpu.ops import bp as bp_ops
from ldpc_tpu.ops import osd as osd_ops
from ldpc_tpu.ops.pcm import compile_pcm
from ldpc_tpu.parallel import make_mesh, shard_batch, unshard


@pytest.fixture(scope="module")
def workload():
    code = surface_code(5)
    graph = compile_pcm(code.hx)
    channel = np.full(graph.n, 0.04)
    rng = np.random.default_rng(9)
    errors = (rng.random((64, graph.n)) < 0.04).astype(np.uint8)
    syndromes = (errors @ graph.dense.T % 2).astype(np.uint8)
    bp_fn = bp_ops.make_parallel_decoder(
        graph, bp_ops.MINIMUM_SUM, max_iter=12, ms_scaling_factor=0.625
    )
    osd_fn = osd_ops.make_osd_decoder(graph, channel, osd_ops.OSD_0, 0)
    init_llr = jnp.asarray(bp_ops.channel_llr(channel))

    def decode_step(syn):
        bp = bp_fn(syn, init_llr)
        d0, _, _ = osd_fn(syn, bp.llr_posterior)
        out = jnp.where(bp.converged[:, None], bp.decoding, d0)
        return out, bp.converged, bp.iterations

    return syndromes, jax.jit(decode_step)


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_decode_batch_equivalence(workload, ndev):
    """The identical syndrome batch decodes to identical outputs no
    matter how many devices the batch axis is sharded over."""
    syndromes, decode_step = workload
    ref_out, ref_conv, ref_iters = map(
        np.asarray, decode_step(jnp.asarray(syndromes))
    )

    mesh = make_mesh(ndev)
    sharded, B = shard_batch(syndromes, mesh)
    out, conv, iters = decode_step(sharded)
    np.testing.assert_array_equal(unshard(out, B), ref_out)
    np.testing.assert_array_equal(unshard(conv, B), ref_conv)
    np.testing.assert_array_equal(unshard(iters, B), ref_iters)


def test_sharded_mc_step_matches_manual_device_sum():
    """The shard_map + psum Monte-Carlo step returns exactly the sum of
    running each device's program separately with its own PRNG stream —
    distribution changes placement, not a single counter."""
    code = surface_code(3, compute_logicals=True)
    kwargs = dict(
        logicals=code.lx,
        rounds_per_call=2,
        max_iter=6,
        ms_scaling_factor=0.625,
    )
    mesh = make_mesh(8)
    step, runs = make_sharded_mc_step(
        code.hx, 0.05, mesh=mesh, batch_size_per_device=128, **kwargs
    )
    key = jax.random.key(123)
    got = np.asarray(step(key))

    local_step, runs_local = make_mc_decoder_step(
        code.hx, 0.05, batch_size=128, **kwargs
    )
    keys = jax.random.split(key, 8)
    want = sum(np.asarray(local_step(k), np.int64) for k in keys)
    assert runs == 8 * runs_local
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_sharded_mc_step_1_vs_8_statistics():
    """1-dev and 8-dev meshes draw independent streams; their LER
    estimates must agree within Monte-Carlo error (the sanity companion
    to the exact placement test above)."""
    code = surface_code(3, compute_logicals=True)
    kwargs = dict(
        logicals=code.lx,
        rounds_per_call=2,
        max_iter=6,
        ms_scaling_factor=0.625,
    )
    step8, runs8 = make_sharded_mc_step(
        code.hx, 0.08, mesh=make_mesh(8), batch_size_per_device=512, **kwargs
    )
    step1, runs1 = make_sharded_mc_step(
        code.hx, 0.08, mesh=make_mesh(1), batch_size_per_device=4096, **kwargs
    )
    c8 = np.asarray(step8(jax.random.key(7)), np.float64)
    c1 = np.asarray(step1(jax.random.key(8)), np.float64)
    assert runs8 == runs1 == c8[0] == c1[0]
    ler8, ler1 = c8[1] / c8[0], c1[1] / c1[0]
    pbar = (ler8 + ler1) / 2
    sigma = np.sqrt(max(2 * pbar * (1 - pbar) / runs8, 1e-12))
    assert abs(ler8 - ler1) <= max(5 * sigma, 16 / runs8), (ler8, ler1)
