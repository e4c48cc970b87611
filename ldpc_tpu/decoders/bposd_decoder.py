"""BpOsdDecoder: belief propagation + ordered-statistics fallback.

API parity with the reference
(reference: src_python/ldpc/bposd_decoder/_bposd_decoder.pyx), with the
TPU-native ``decode_batch`` fast path: BP runs on the whole batch, then the
OSD program runs once on the compacted non-converged subset.
"""

import warnings
from typing import List, Optional, Union

import numpy as np
import scipy.sparse

import jax.numpy as jnp

from ldpc_tpu.decoders.base import BpDecoderBase
from ldpc_tpu.ops import osd as osd_ops

_METHOD_NAMES = {
    osd_ops.OSD_0: "OSD_0",
    osd_ops.EXHAUSTIVE: "OSD_E",
    osd_ops.COMBINATION_SWEEP: "OSD_CS",
    osd_ops.OSD_OFF: "OSD_OFF",
}


class BpOsdDecoder(BpDecoderBase):
    """BP decoding with OSD post-processing (batched, TPU-native).

    Runs belief propagation first; on non-convergence falls back to
    ordered-statistics decoding guided by the BP posterior LLRs
    (reference: _bposd_decoder.pyx:78-137). ``osd_method`` is one of
    'OSD_0' | 'OSD_E' | 'OSD_CS' | 'OSD_OFF' (plus the reference's
    aliases); ``osd_order`` is the search depth.
    """

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
        input_vector_type: str = "syndrome",
        random_serial_schedule: bool = False,
        **kwargs,
    ):
        for key in kwargs.keys():
            if key not in ("channel_probs", "dtype"):
                raise ValueError(
                    f"Unknown parameter '{key}' passed to the BpDecoder constructor."
                )
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
            random_serial_schedule=random_serial_schedule,
            **kwargs,
        )
        self.input_vector_type = input_vector_type
        self._osd_method = 0
        self._osd_order = 0
        self.osd_method = osd_method
        self.osd_order = osd_order
        self._osd0_decoding = np.zeros(self.n, dtype=np.uint8)
        self._osdw_decoding = np.zeros(self.n, dtype=np.uint8)
        self._bp_decoding = np.zeros(self.n, dtype=np.uint8)

    # ------------------------------------------------------------------
    # OSD configuration (reference: _bposd_decoder.pyx:141-233)
    # ------------------------------------------------------------------
    @property
    def osd_method(self) -> Optional[str]:
        return _METHOD_NAMES[self._osd_method]

    @osd_method.setter
    def osd_method(self, method: Union[str, int, float]) -> None:
        sval = str(method).lower()
        if sval in ("osd_0", "0", "osd0"):
            self._osd_method = osd_ops.OSD_0
            self._osd_order = 0
        elif sval in ("osd_e", "e", "exhaustive"):
            self._osd_method = osd_ops.EXHAUSTIVE
        elif sval in ("osd_cs", "1", "cs", "combination_sweep"):
            self._osd_method = osd_ops.COMBINATION_SWEEP
        elif sval in ("off", "osd_off", "deactivated", "-1"):
            self._osd_method = osd_ops.OSD_OFF
        else:
            raise ValueError(
                f"ERROR: OSD method '{method}' invalid. Please choose from "
                "the following methods: 'OSD_0', 'OSD_E' or 'OSD_CS'."
            )
        self._invalidate_osd()

    @property
    def osd_order(self) -> int:
        return self._osd_order

    @osd_order.setter
    def osd_order(self, order: int) -> None:
        if order < 0:
            raise ValueError(
                f"ERROR: OSD order '{order}' invalid. Please choose a "
                "positive integer."
            )
        if self._osd_method == osd_ops.OSD_0 and order != 0:
            raise ValueError(
                f"ERROR: OSD order '{order}' invalid. The 'osd_method' is "
                "set to 'OSD_0'. The osd order must therefore be set to 0."
            )
        if self._osd_method == osd_ops.EXHAUSTIVE and order > 15:
            warnings.warn(
                "WARNING: Running the 'OSD_E' (Exhaustive method) with "
                "search depth greater than 15 is not recommended. Use the "
                "'osd_cs' method instead."
            )
        self._osd_order = order
        self._invalidate_osd()

    def _invalidate_osd(self):
        for key in [key for key in self._decoder_cache if key and key[0] == "osd"]:
            del self._decoder_cache[key]

    def _osd_decode_fn(self):
        key = ("osd", self._osd_method, self._osd_order, tuple(self._channel))
        fn = self._decoder_cache.get(key)
        if fn is None:
            fn = osd_ops.make_osd_decoder(
                self.graph,
                self._channel,
                self._osd_method,
                self._osd_order,
                dtype=jnp.float64 if self._dtype == jnp.float64 else jnp.float32,
            )
            self._decoder_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    # decoding
    # ------------------------------------------------------------------
    def decode(self, syndrome: np.ndarray) -> np.ndarray:
        """BP decode; on non-convergence fall back to OSD
        (reference: _bposd_decoder.pyx:78-137)."""
        syndrome = np.asarray(syndrome)
        if not len(syndrome) == self.m:
            raise ValueError(
                f"The syndrome must have length {self.m}. Not {len(syndrome)}."
            )
        out = self.decode_batch(syndrome[None, :].astype(np.uint8))[0]
        return out.astype(syndrome.dtype)

    def decode_batch(self, syndromes: np.ndarray) -> np.ndarray:
        """Decode a (B, m) batch: batched BP, then one OSD program over the
        compacted non-converged subset."""
        syndromes = np.atleast_2d(np.asarray(syndromes, dtype=np.uint8))
        if syndromes.shape[1] != self.m:
            raise ValueError(
                f"The syndromes must have shape (batch, {self.m}). "
                f"Not {syndromes.shape}."
            )
        B = syndromes.shape[0]
        nonzero = syndromes.any(axis=1)

        bp = self._run_bp_batch(syndromes)
        bp_dec = np.array(bp.decoding)
        conv = np.asarray(bp.converged)
        conv = conv | ~nonzero
        bp_dec[~nonzero] = 0
        llrs = np.asarray(bp.llr_posterior)

        out = bp_dec.copy()
        osd0 = bp_dec.copy()
        osdw = bp_dec.copy()
        failed = np.flatnonzero(~conv)
        if failed.size and self._osd_method != osd_ops.OSD_OFF:
            fn = self._osd_decode_fn()
            # bucket the failed-subset size to powers of two so the jitted
            # program re-compiles only O(log B) times
            bucket = 1 << (int(failed.size - 1).bit_length())
            pad = bucket - failed.size
            syn_f = np.concatenate(
                [syndromes[failed], np.zeros((pad, self.m), np.uint8)]
            )
            llr_f = np.concatenate(
                [llrs[failed], np.zeros((pad, self.n), llrs.dtype)]
            )
            d0, dw, _ = fn(jnp.asarray(syn_f), jnp.asarray(llr_f))
            d0 = np.asarray(d0)[: failed.size]
            dw = np.asarray(dw)[: failed.size]
            osd0[failed] = d0
            osdw[failed] = dw
            out[failed] = dw

        self.converge_batch = conv
        self.iter_batch = np.asarray(bp.iterations)
        self.log_prob_ratios_batch = llrs
        self._converge = bool(conv[0])
        self._iter = int(self.iter_batch[0])
        self._log_prob_ratios = llrs[0]
        self._bp_decoding = bp_dec[0]
        self._osd0_decoding = osd0[0]
        self._osdw_decoding = osdw[0]
        self._decoding = out[0]
        self.bp_decoding_batch = bp_dec
        self.osd0_decoding_batch = osd0
        self.osdw_decoding_batch = osdw
        return out

    # ------------------------------------------------------------------
    # result properties (reference: _bposd_decoder.pyx:236-300)
    # ------------------------------------------------------------------
    @property
    def decoding(self) -> np.ndarray:
        return np.asarray(self._decoding).astype(int)

    @property
    def bp_decoding(self) -> np.ndarray:
        return np.asarray(self._bp_decoding).astype(int)

    @property
    def osd0_decoding(self) -> np.ndarray:
        if self._converge:
            return np.asarray(self._bp_decoding).astype(int)
        return np.asarray(self._osd0_decoding).astype(int)

    @property
    def osdw_decoding(self) -> np.ndarray:
        if self._converge:
            return np.asarray(self._bp_decoding).astype(int)
        return np.asarray(self._osdw_decoding).astype(int)
