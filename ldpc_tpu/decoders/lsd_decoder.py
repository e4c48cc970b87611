"""LsdDecoder: standalone localized-statistics decoding (no BP stage).

API parity with the reference
(reference: src_python/ldpc/lsd_decoder/_lsd_decoder.pyx): the user
supplies per-bit weights (soft information) to guide cluster growth
(_lsd_decoder.pyx:129-175).
"""

from typing import Optional, Union
import warnings

import numpy as np
import scipy.sparse

import jax.numpy as jnp

from ldpc_tpu.decoders.lsd_common import METHOD_NAMES, parse_lsd_method
from ldpc_tpu.helpers import convert_to_binary_sparse
from ldpc_tpu.ops import lsd as lsd_ops
from ldpc_tpu.ops.pcm import compile_pcm


class LsdDecoder:
    """Standalone batched LSD decoder (lsd.hpp:683-784)."""

    def __init__(
        self,
        pcm,
        bits_per_step: int = 1,
        lsd_order: int = 0,
        lsd_method: Union[str, int] = 0,
    ):
        if not isinstance(pcm, (np.ndarray, scipy.sparse.spmatrix)):
            raise TypeError(
                "The input matrix is of an invalid type. Please input "
                f"a np.ndarray or spmatrix object, not {type(pcm)}"
            )
        self._pcm = convert_to_binary_sparse(pcm)
        self.m, self.n = self._pcm.shape
        self.bits_per_step = bits_per_step if bits_per_step != 0 else self.n
        self._lsd_method = 0
        self._lsd_order = 0
        self.lsd_method = lsd_method
        self.lsd_order = lsd_order
        self._graph = compile_pcm(self._pcm)
        self._fn = None
        self._decoding = np.zeros(self.n, dtype=np.uint8)

    @property
    def lsd_method(self) -> Optional[str]:
        return METHOD_NAMES.get(self._lsd_method)

    @lsd_method.setter
    def lsd_method(self, method) -> None:
        self._lsd_method = parse_lsd_method(method)
        if self._lsd_method == lsd_ops.LSD_0:
            self._lsd_order = 0
        self._fn = None
        self._pfn = None

    @property
    def lsd_order(self) -> int:
        return self._lsd_order

    @lsd_order.setter
    def lsd_order(self, order: int) -> None:
        if order < 0:
            raise ValueError(
                f"ERROR: OSD order '{order}' invalid. Please choose a "
                "positive integer."
            )
        if self._lsd_method == lsd_ops.LSD_0 and order != 0:
            raise ValueError(
                f"ERROR: OSD order '{order}' invalid. The 'osd_method' is "
                "set to 'OSD_0'. The osd order must therefore be set to 0."
            )
        if self._lsd_method == lsd_ops.LSD_E and order > 15:
            warnings.warn(
                "WARNING: Running the 'OSD_E' (Exhaustive method) with "
                "search depth greater than 15 is not recommended. Use the "
                "'osd_cs' method instead."
            )
        self._lsd_order = order
        self._fn = None
        self._pfn = None

    def _decode_fn(self):
        if self._fn is None:
            self._fn = lsd_ops.make_lsd_decoder(
                self._graph,
                lsd_method=max(self._lsd_method, 0),
                lsd_order=self._lsd_order,
                bits_per_step=self.bits_per_step,
            )
        return self._fn

    def decode(self, syndrome: np.ndarray, bit_weights: np.ndarray) -> np.ndarray:
        syndrome = np.asarray(syndrome)
        if not len(syndrome) == self.m:
            raise ValueError(
                f"The syndrome must have length {self.m}. Not {len(syndrome)}."
            )
        bit_weights = np.asarray(bit_weights, dtype=np.float64)
        if not len(bit_weights) == self.n:
            raise ValueError(
                f"The bit weights must have length {self.n}. Not {len(bit_weights)}."
            )
        out = self.decode_batch(
            syndrome[None, :].astype(np.uint8), bit_weights[None, :]
        )[0]
        return out.astype(syndrome.dtype)

    def _packed_fn(self):
        """One-dispatch program: bit-packed syndromes in, ONE packed
        uint8 buffer (decodings + validity bits) out (tunneled links pay
        ~25 ms per distinct device->host pull)."""
        if getattr(self, "_pfn", None) is None:
            import jax

            from ldpc_tpu.ops import gf2

            inner = self._decode_fn()
            m, n = self.m, self.n

            def program(syn_packed, weights):
                syn = gf2.unpack_bits_u8_device(syn_packed, m)
                dec, valid = inner(syn, weights)
                nonzero = syn.any(axis=1)
                dec = dec * nonzero[:, None].astype(dec.dtype)
                valid = valid | ~nonzero
                return jnp.concatenate(
                    [
                        gf2.pack_bits_u8(dec).reshape(-1),
                        gf2.pack_bits_u8(
                            valid[None, :].astype(jnp.uint8)
                        )[0],
                    ]
                )

            self._pfn = jax.jit(program)
        return self._pfn

    def decode_batch(
        self, syndromes: np.ndarray, bit_weights: np.ndarray
    ) -> np.ndarray:
        syndromes = np.atleast_2d(np.asarray(syndromes, dtype=np.uint8))
        bit_weights = np.atleast_2d(np.asarray(bit_weights, dtype=np.float32))
        B0 = syndromes.shape[0]
        if bit_weights.shape[0] == 1 and B0 > 1:
            bit_weights = np.broadcast_to(bit_weights, (B0, self.n))
        Bpad = (
            -(-B0 // 512) * 512 if B0 >= 512 else max(128, -(-B0 // 128) * 128)
        )
        syn_packed = np.packbits(syndromes, axis=1, bitorder="little")
        if Bpad != B0:
            syn_packed = np.concatenate(
                [
                    syn_packed,
                    np.zeros((Bpad - B0, syn_packed.shape[1]), np.uint8),
                ]
            )
            bit_weights = np.concatenate(
                [bit_weights, np.zeros((Bpad - B0, self.n), np.float32)]
            )
        buf = np.asarray(
            self._packed_fn()(
                jnp.asarray(syn_packed), jnp.asarray(bit_weights)
            )
        )
        Wb = -(-self.n // 8)
        dec = np.unpackbits(
            buf[: Bpad * Wb].reshape(Bpad, Wb)[:B0],
            axis=1,
            count=self.n,
            bitorder="little",
        )
        self.valid_batch = np.unpackbits(
            buf[Bpad * Wb :], count=B0, bitorder="little"
        ).astype(bool)
        self._decoding = dec[0]
        return dec

    @property
    def decoding(self) -> np.ndarray:
        return np.asarray(self._decoding).astype(np.uint8)
