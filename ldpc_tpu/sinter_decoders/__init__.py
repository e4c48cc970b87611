"""sinter decoder adapters (reference: src_python/ldpc/sinter_decoders/).

sinter and stim are optional dependencies: the classes import lazily and
degrade to informative errors when absent.
"""

from ldpc_tpu.sinter_decoders.sinter_decoders import (  # noqa: F401
    SinterBeliefFindDecoder,
    SinterBpOsdDecoder,
    SinterLsdDecoder,
)

__all__ = [
    "SinterBpOsdDecoder",
    "SinterLsdDecoder",
    "SinterBeliefFindDecoder",
]
