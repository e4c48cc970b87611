"""Device-side compute kernels (JAX/XLA/Pallas) for batched decoding."""

from ldpc_tpu.ops.pcm import PcmGraph, compile_pcm

__all__ = ["PcmGraph", "compile_pcm"]
