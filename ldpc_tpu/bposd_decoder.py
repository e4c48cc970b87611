"""Import-path parity with ``ldpc.bposd_decoder``
(reference: src_python/ldpc/bposd_decoder/__init__.py)."""

from ldpc_tpu.decoders.bposd_decoder import (  # noqa: F401
    BpOsdDecoder,
    SoftInfoBpOsdDecoder,
)
from ldpc_tpu._legacy_v1 import bposd_decoder  # noqa: F401
