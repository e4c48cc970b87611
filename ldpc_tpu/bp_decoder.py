"""Import-path parity with ``ldpc.bp_decoder``
(reference: src_python/ldpc/bp_decoder/__init__.py): reference users can
switch by renaming only the top-level package."""

from ldpc_tpu.decoders.base import BpDecoderBase  # noqa: F401
from ldpc_tpu.decoders.bp_decoder import (  # noqa: F401
    BpDecoder,
    SoftInfoBpDecoder,
)
from ldpc_tpu.mod2 import io_test  # noqa: F401
from ldpc_tpu._legacy_v1 import bp_decoder  # noqa: F401
