"""UnionFindDecoder: standalone union-find decoding (no BP stage).

API parity with the reference
(reference: src_python/ldpc/union_find_decoder/_union_find_decoder.pyx):
``uf_method`` truthy selects matrix-inversion mode, falsy selects peeling
(_union_find_decoder.pyx:64,145-157); ``decode(syndrome, llrs=None,
bits_per_step=0)`` optionally guides growth with soft information.
"""

from typing import Optional, Union

import numpy as np
import scipy.sparse

import jax.numpy as jnp

from ldpc_tpu.helpers import convert_to_binary_sparse
from ldpc_tpu.ops import uf as uf_ops
from ldpc_tpu.ops.pcm import compile_pcm


class UnionFindDecoder:
    """Union-find decoder (union_find.hpp; arXiv:1709.06218).

    ``uf_method=True`` -> matrix (inversion) mode, works on any PCM;
    ``uf_method=False`` (default) -> peeling mode, requires column
    degree <= 2 (point-like syndromes).
    """

    def __init__(self, pcm, uf_method: Union[bool, str] = False):
        if not isinstance(pcm, (np.ndarray, scipy.sparse.spmatrix)):
            raise TypeError(
                "The input matrix is of an invalid type. Please input "
                f"a np.ndarray or spmatrix object, not {type(pcm)}"
            )
        self._pcm = convert_to_binary_sparse(pcm)
        self.m, self.n = self._pcm.shape
        col_deg = np.asarray((self._pcm != 0).sum(axis=0)).ravel()
        if (col_deg == 0).any():
            raise ValueError(
                "Invalid parity check matrix. Column weight is zero."
            )
        self.uf_method = bool(uf_method)
        if not self.uf_method and col_deg.max() > 2:
            raise ValueError(
                "Peel decoder only works for planar codes. Use the "
                "matrix_decode method for more general codes."
            )
        self._graph = compile_pcm(self._pcm)
        self._cache = {}
        self._decoding = np.zeros(self.n, dtype=np.uint8)

    def _fn(self, bits_per_step: int, guided: bool):
        key = (self.uf_method, bits_per_step, guided)
        fn = self._cache.get(key)
        if fn is None:
            maker = uf_ops.make_uf_decoder if self.uf_method else uf_ops.make_peel_decoder
            fn = maker(self._graph, bits_per_step=bits_per_step if guided else 0)
            self._cache[key] = fn
        return fn

    def _packed_fn(self, bits_per_step: int, guided: bool):
        """One-dispatch program: bit-packed syndromes in, ONE packed
        uint8 buffer (decodings + validity bits) out — distinct
        host<->device transfers dominate on tunneled links, and the
        unguided path synthesizes its zero LLRs on device instead of
        uploading a (B, n) float block."""
        key = ("packed", self.uf_method, bits_per_step, guided)
        fn = self._cache.get(key)
        if fn is None:
            import jax

            from ldpc_tpu.ops import gf2

            inner = self._fn(bits_per_step, guided)
            m, n = self.m, self.n

            def program(syn_packed, llrs):
                syn = gf2.unpack_bits_u8_device(syn_packed, m)
                if llrs is None:
                    llrs = jnp.zeros((syn.shape[0], n), jnp.float32)
                dec, valid = inner(syn, llrs)
                nonzero = syn.any(axis=1)
                dec = dec * nonzero[:, None].astype(dec.dtype)
                valid = valid | ~nonzero
                buf = jnp.concatenate(
                    [
                        gf2.pack_bits_u8(dec).reshape(-1),
                        gf2.pack_bits_u8(
                            valid[None, :].astype(jnp.uint8)
                        )[0],
                    ]
                )
                return buf

            if guided:
                fn = jax.jit(program)
            else:
                prog = jax.jit(lambda sp: program(sp, None))
                fn = lambda sp, llrs: prog(sp)
            self._cache[key] = fn
        return fn

    def decode(
        self,
        syndrome: np.ndarray,
        llrs: Optional[np.ndarray] = None,
        bits_per_step: int = 0,
    ) -> np.ndarray:
        syndrome = np.asarray(syndrome)
        if not len(syndrome) == self.m:
            raise ValueError(
                f"The syndrome must have length {self.m}. Not {len(syndrome)}."
            )
        if llrs is not None and not len(llrs) == self.n:
            raise ValueError(
                f"The llrs must have length {self.n}. Not {len(llrs)}."
            )
        out = self.decode_batch(
            syndrome[None, :].astype(np.uint8),
            None if llrs is None else np.asarray(llrs)[None, :],
            bits_per_step,
        )[0]
        return out.astype(syndrome.dtype)

    def decode_batch(
        self,
        syndromes: np.ndarray,
        llrs: Optional[np.ndarray] = None,
        bits_per_step: int = 0,
    ) -> np.ndarray:
        syndromes = np.atleast_2d(np.asarray(syndromes, dtype=np.uint8))
        B0 = syndromes.shape[0]
        guided = llrs is not None
        if guided:
            llrs = np.atleast_2d(np.asarray(llrs, dtype=np.float32))
        # pad the batch to coarse buckets so the jitted program compiles
        # O(log B) times, and ship/pull everything bit-packed in ONE
        # buffer each way (tunneled links pay ~25 ms per distinct pull)
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
            if guided:
                llrs = np.concatenate(
                    [llrs, np.zeros((Bpad - B0, self.n), np.float32)]
                )
        fn = self._packed_fn(bits_per_step, guided)
        buf = np.asarray(
            fn(
                jnp.asarray(syn_packed),
                jnp.asarray(llrs) if guided else None,
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
