"""Import-path parity with ``ldpc.mbp_decoder``
(reference: src_python/ldpc/mbp_decoder/__init__.py)."""

from ldpc_tpu.decoders.mbp_decoder import MbpDecoder, mbp_decoder  # noqa: F401
