"""Import-path parity with ``ldpc.mbp_decoder``
(reference: src_python/ldpc/mbp_decoder/__init__.py)."""

import sys as _sys
import types as _types

from ldpc_tpu.decoders.mbp_decoder import MbpDecoder, mbp_decoder  # noqa: F401


class _CallableModule(_types.ModuleType):
    """Keep ``ldpc_tpu.mbp_decoder`` callable as the decoder class after
    this module shadows the root attribute (see bp_decoder.py)."""

    def __call__(self, *args, **kwargs):
        return MbpDecoder(*args, **kwargs)


_sys.modules[__name__].__class__ = _CallableModule
