"""FlipDecoder and BpFlipDecoder.

API parity with the reference (reference:
src_python/ldpc/bp_flip/_bp_flip.pyx): ``BpFlipDecoder.decode`` runs flip
*first*, then BP on the residual syndrome, and XORs the two corrections
(_bp_flip.pyx:44-61 — note the inverted order vs the class name).
``FlipDecoder`` is the standalone greedy flip / p-flip decoder
(reference: src_cpp/flip.hpp).
"""

import time
from typing import List, Optional, Union

import numpy as np
import scipy.sparse

import jax
import jax.numpy as jnp

from ldpc_tpu.decoders.base import BpDecoderBase
from ldpc_tpu.helpers import convert_to_binary_sparse
from ldpc_tpu.ops import flip as flip_ops
from ldpc_tpu.ops.pcm import compile_pcm


class FlipDecoder:
    """Standalone batched flip / p-flip decoder (flip.hpp:61-137).

    Unlike the reference's C++-only class, a zero syndrome converges
    immediately (the reference only reaches flip through BpFlipDecoder,
    which short-circuits zero syndromes before the flip stage).
    """

    def __init__(self, pcm, max_iter: int = 0, pfreq: int = 0, seed: int = 0):
        if not isinstance(pcm, (np.ndarray, scipy.sparse.spmatrix)):
            raise TypeError(
                "The input matrix is of an invalid type. Please input "
                f"a np.ndarray or scipy.sparse.spmatrix object, not {type(pcm)}"
            )
        self._pcm = convert_to_binary_sparse(pcm)
        self.m, self.n = self._pcm.shape
        self.max_iter = max_iter if max_iter != 0 else self.n
        self.pfreq = pfreq
        self.seed = seed
        self._graph = compile_pcm(self._pcm)
        self._fn = flip_ops.make_flip_decoder(self._graph, self.max_iter, self.pfreq)
        self.converge = False
        self.iterations = 0
        self._decoding = np.zeros(self.n, dtype=np.uint8)

    def _key(self):
        seed = self.seed if self.seed != 0 else time.time_ns() & 0x7FFFFFFF
        return jax.random.key(seed)

    def decode(self, syndrome: np.ndarray) -> np.ndarray:
        syndrome = np.asarray(syndrome)
        if not len(syndrome) == self.m:
            raise ValueError(
                f"The syndrome must have length {self.m}. Not {len(syndrome)}."
            )
        out = self.decode_batch(syndrome[None, :].astype(np.uint8))[0]
        return out.astype(syndrome.dtype)

    def decode_batch(self, syndromes: np.ndarray) -> np.ndarray:
        syndromes = np.atleast_2d(np.asarray(syndromes, dtype=np.uint8))
        dec, conv, iters = self._fn(jnp.asarray(syndromes), self._key())
        self.converge_batch = np.asarray(conv)
        self.iter_batch = np.asarray(iters)
        self.converge = bool(self.converge_batch[0])
        self.iterations = int(self.iter_batch[0])
        dec = np.asarray(dec)
        self._decoding = dec[0]
        return dec

    @property
    def decoding(self) -> np.ndarray:
        return np.asarray(self._decoding).astype(int)


class BpFlipDecoder(BpDecoderBase):
    """Flip pre-decoding followed by BP on the residual syndrome
    (reference: _bp_flip.pyx:10-61)."""

    def __init__(
        self,
        pcm: Union[np.ndarray, scipy.sparse.spmatrix],
        error_rate: Optional[float] = None,
        error_channel: Optional[Union[np.ndarray, List[float]]] = None,
        max_iter: Optional[int] = 0,
        bp_method: Optional[str] = "minimum_sum",
        ms_scaling_factor: Optional[Union[float, int]] = 1.0,
        schedule: Optional[str] = "parallel",
        omp_thread_count: Optional[int] = 1,
        random_schedule_seed: Optional[int] = 0,
        serial_schedule_order: Optional[List[int]] = None,
        osd_method: Union[str, int, float] = 0,
        osd_order: int = 0,
        flip_iterations: int = 0,
        pflip_frequency: int = 0,
        pflip_seed: int = 0,
        **kwargs,
    ):
        super().__init__(
            pcm,
            error_rate=error_rate,
            error_channel=error_channel,
            max_iter=max_iter,
            bp_method=bp_method,
            ms_scaling_factor=ms_scaling_factor,
            schedule=schedule,
            omp_thread_count=omp_thread_count,
            random_schedule_seed=random_schedule_seed,
            serial_schedule_order=serial_schedule_order,
            **kwargs,
        )
        self.flip_iterations = flip_iterations
        self._flip = FlipDecoder(
            self._pcm, max_iter=flip_iterations, pfreq=pflip_frequency, seed=pflip_seed
        )

    def decode(self, syndrome: np.ndarray) -> np.ndarray:
        syndrome = np.asarray(syndrome)
        if not len(syndrome) == self.m:
            raise ValueError(
                f"The syndrome must have length {self.m}. Not {len(syndrome)}."
            )
        out = self.decode_batch(syndrome[None, :].astype(np.uint8))[0]
        return out.astype(syndrome.dtype)

    def decode_batch(self, syndromes: np.ndarray) -> np.ndarray:
        syndromes = np.atleast_2d(np.asarray(syndromes, dtype=np.uint8))
        B = syndromes.shape[0]
        nonzero = syndromes.any(axis=1)

        flip_dec = self._flip.decode_batch(syndromes)
        residual = (
            syndromes ^ (flip_dec @ self._graph_dense_T() % 2).astype(np.uint8)
        )
        bp = self._run_bp_batch(residual)
        out = (np.asarray(bp.decoding) ^ flip_dec).astype(np.uint8)
        out[~nonzero] = 0
        conv = np.asarray(bp.converged) | ~nonzero
        self.converge_batch = conv
        self._converge = bool(conv[0])
        self._iter = int(np.asarray(bp.iterations)[0])
        self._log_prob_ratios = np.asarray(bp.llr_posterior)[0]
        self._decoding = out[0]
        return out

    def _graph_dense_T(self) -> np.ndarray:
        return self.graph.dense.T
