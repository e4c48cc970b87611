"""User-facing decoder classes (API parity with the reference Cython layer)."""

from ldpc_tpu.decoders.bp_decoder import BpDecoder, SoftInfoBpDecoder  # noqa: F401
