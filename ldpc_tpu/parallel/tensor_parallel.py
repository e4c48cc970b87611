"""Tensor (model) parallel BP: the Tanner graph sharded over a mesh.

Data parallelism (the ``batch`` axis) is the right first axis for this
workload, but it replicates the parity-check matrix on every device —
for very large codes (product/lifted codes with millions of edges) the
check-major message arrays themselves outgrow one chip's HBM. This
module shards the CHECK axis of the Tanner graph over a ``code`` mesh
axis (SURVEY.md §2.4's model-parallel contingency):

- every device owns ``m/D`` checks and their ``(m/D, dc, B)`` message
  block — compute on the check side (the min/tanh reductions, the
  heavy part) is fully local;
- the bit-side LLR accumulation is a local scatter-add of each
  device's check->bit messages into an ``(n, B)`` partial, combined
  with ONE ``lax.psum`` per iteration — the classic local-compute /
  small-allreduce decomposition (cf. tensor-parallel matmul): the wire
  cost is the posterior, not the edges;
- convergence is a psum'd syndrome-mismatch count.

Composes with data parallelism over a 2-D ``(batch, code)`` mesh: the
batch axis shards B, the code axis shards m, and the psum rides only
the ``code`` axis.

The reference decodes one syndrome on one core with no distribution at
all (reference: src_cpp/bp.hpp:192-325; SURVEY.md §2.4) — this is the
scaling story it has no analog of.
"""

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ldpc_tpu.ops import bp as bp_ops
from ldpc_tpu.ops.bp import (
    BpResult,
    MINIMUM_SUM,
    _check_to_bit_min_sum,
    _check_to_bit_product_sum,
)
from ldpc_tpu.ops.pcm import PcmGraph

CODE_AXIS = "code"


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def make_tp_bp_decoder(
    graph: PcmGraph,
    mesh,
    *,
    bp_method: int = MINIMUM_SUM,
    max_iter: int = 30,
    ms_scaling_factor: float = 0.625,
    axis_name: str = CODE_AXIS,
    batch_axis: Optional[str] = None,
    dtype=jnp.float32,
):
    """Build a check-sharded (tensor-parallel) batched BP decoder.

    ``mesh`` must carry ``axis_name``; if ``batch_axis`` is given (or a
    ``batch`` axis exists on the mesh) the syndrome batch is sharded
    over it as well. Returns ``decode(syndromes (B, m) uint8,
    init_llr (n,)) -> BpResult`` with replicated outputs; semantics
    match :func:`ldpc_tpu.ops.bp.make_parallel_decoder` (f32 gather-only
    engine) up to floating-point summation order on the bit axis.
    """
    if axis_name not in mesh.axis_names:
        raise ValueError(
            f"mesh has axes {mesh.axis_names}, expected {axis_name!r}"
        )
    if batch_axis is None and "batch" in mesh.axis_names:
        batch_axis = "batch"
    D = mesh.shape[axis_name]
    DB = mesh.shape[batch_axis] if batch_axis else 1

    m, n, dc = graph.m, graph.n, graph.dc
    m_pad = _round_up(m, D)
    # dummy checks: every edge masked out and pointing at the pad bit n,
    # syndrome fixed 0 -> they are trivially satisfied and contribute 0
    chk_bits = np.full((m_pad, dc), n, np.int32)
    chk_bits[:m] = graph.chk_bits
    chk_mask = np.zeros((m_pad, dc), bool)
    chk_mask[:m] = graph.chk_mask

    chk_bits_d = jnp.asarray(chk_bits)
    chk_mask_d = jnp.asarray(chk_mask)
    spec_static = (
        P(axis_name, None) if batch_axis is None else P(axis_name, None)
    )

    def local_decode(syndrome_mb, chk_bits_l, chk_mask_l, init_llr):
        """Per-device body: (m_loc, B_loc) syndrome shard, local graph
        shard, replicated (n,) or (B, n) priors."""
        m_loc, B = syndrome_mb.shape
        syndrome = syndrome_mb.astype(jnp.int32)
        mask3 = chk_mask_l[:, :, None]
        edge_bits = chk_bits_l.reshape(-1)  # (E_loc,) values in [0, n]
        init_llr = init_llr.astype(dtype)
        llr_col = init_llr.T if init_llr.ndim == 2 else init_llr[:, None]

        def one_iter(it, llr_post, c2v):
            if ms_scaling_factor == 0.0 and bp_method == MINIMUM_SUM:
                alpha = (1.0 - jnp.exp2(-it.astype(dtype))).astype(dtype)
            else:
                alpha = jnp.array(ms_scaling_factor, dtype)
            llr_pad = jnp.concatenate([llr_post, jnp.zeros((1, B), dtype)])
            v2c3 = llr_pad[edge_bits].reshape(m_loc, dc, B) - c2v
            if bp_method == MINIMUM_SUM:
                c2v = _check_to_bit_min_sum(
                    v2c3, mask3, syndrome, alpha, dtype
                )
            else:
                c2v = _check_to_bit_product_sum(v2c3, mask3, syndrome, dtype)
            # bit-side: local scatter-add + ONE psum over the code axis
            local_sum = (
                jnp.zeros((n + 1, B), dtype)
                .at[edge_bits]
                .add(c2v.reshape(-1, B))[:n]
            )
            total = lax.psum(local_sum, axis_name)
            llr_new = llr_col + total
            hard = llr_new <= 0  # (n, B) replicated
            hard_pad = jnp.concatenate([hard, jnp.zeros((1, B), bool)])
            cand = (
                hard_pad[edge_bits].reshape(m_loc, dc, B).sum(axis=1) % 2
            )
            mism = (cand != syndrome).sum(axis=0)  # (B,) local
            conv_now = lax.psum(mism, axis_name) == 0
            return llr_new, c2v, hard, conv_now

        def body(state):
            it, llr_post, c2v, conv, dec_out, llr_out, iters = state
            it = it + 1
            llr_new, c2v, hard, conv_now = one_iter(it, llr_post, c2v)
            active = ~conv
            dec_out = jnp.where(active[None, :], hard, dec_out)
            llr_out = jnp.where(active[None, :], llr_new, llr_out)
            iters = jnp.where(active, it, iters)
            conv = conv | conv_now
            return (it, llr_new, c2v, conv, dec_out, llr_out, iters)

        def cond(state):
            it, _, _, conv, _, _, _ = state
            return (it < max_iter) & ~jnp.all(conv)

        llr0 = jnp.broadcast_to(llr_col, (n, B))
        state0 = (
            jnp.int32(0),
            llr0,
            jnp.zeros((m_loc, dc, B), dtype),
            jnp.zeros(B, bool),
            jnp.zeros((n, B), bool),
            llr0,
            jnp.zeros(B, jnp.int32),
        )
        _, _, _, conv, dec, llr_out, iters = lax.while_loop(
            cond, body, state0
        )
        return dec.T.astype(jnp.uint8), llr_out.T, conv, iters

    if batch_axis is None:
        in_specs = (P(axis_name, None), spec_static, spec_static, P())
        out_specs = (P(), P(), P(), P())
    else:
        in_specs = (
            P(axis_name, batch_axis),
            spec_static,
            spec_static,
            P(),
        )
        out_specs = (
            P(batch_axis, None),
            P(batch_axis, None),
            P(batch_axis),
            P(batch_axis),
        )

    fn = jax.jit(
        jax.shard_map(
            local_decode,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
    )

    syn_sharding = NamedSharding(
        mesh,
        P(axis_name, batch_axis) if batch_axis else P(axis_name, None),
    )

    def decode(syndromes, init_llr) -> BpResult:
        syndromes = jnp.asarray(syndromes, jnp.uint8)
        B0 = syndromes.shape[0]
        B = _round_up(B0, DB)
        syn_mb = jnp.zeros((m_pad, B), jnp.uint8)
        syn_mb = syn_mb.at[:m, :B0].set(syndromes.T)
        syn_mb = jax.device_put(syn_mb, syn_sharding)
        dec, llr, conv, iters = fn(
            syn_mb, chk_bits_d, chk_mask_d, jnp.asarray(init_llr)
        )
        return BpResult(
            decoding=dec[:B0],
            llr_posterior=llr[:B0],
            converged=conv[:B0],
            iterations=iters[:B0],
        )

    return decode


class TpBpDecoder:
    """Decoder-class face of :func:`make_tp_bp_decoder`.

    Mirrors :class:`ldpc_tpu.BpDecoder`'s decode/decode_batch surface
    for the common kwargs, with the Tanner graph sharded over the mesh.
    """

    def __init__(
        self,
        pcm,
        mesh,
        *,
        error_rate: Optional[float] = None,
        error_channel=None,
        max_iter: int = 30,
        bp_method: str = "minimum_sum",
        ms_scaling_factor: float = 0.625,
        **mesh_kwargs,
    ):
        from ldpc_tpu.helpers import convert_to_binary_sparse
        from ldpc_tpu.ops.pcm import compile_pcm

        pcm = convert_to_binary_sparse(pcm)
        self.graph = compile_pcm(pcm)
        self.m, self.n = self.graph.m, self.graph.n
        if error_channel is None:
            if error_rate is None:
                raise ValueError("error_rate or error_channel required")
            error_channel = np.full(self.n, error_rate)
        self._init_llr = jnp.asarray(bp_ops.channel_llr(error_channel))
        method = (
            MINIMUM_SUM
            if str(bp_method).lower() in ("ms", "min_sum", "minimum_sum", "1")
            else bp_ops.PRODUCT_SUM
        )
        self._decode = make_tp_bp_decoder(
            self.graph,
            mesh,
            bp_method=method,
            max_iter=max_iter,
            ms_scaling_factor=ms_scaling_factor,
            **mesh_kwargs,
        )

    def decode_batch(self, syndromes) -> np.ndarray:
        out = self._decode(jnp.asarray(syndromes, jnp.uint8), self._init_llr)
        self.converged = np.asarray(out.converged)
        self.iterations = np.asarray(out.iterations)
        return np.asarray(out.decoding)

    def decode(self, syndrome) -> np.ndarray:
        return self.decode_batch(np.asarray(syndrome)[None, :])[0]
