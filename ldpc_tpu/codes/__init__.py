from ldpc_tpu.codes.classical import (
    rep_code,
    ring_code,
    hamming_code,
    random_binary_code,
)
from ldpc_tpu.codes.css import (
    hgp,
    hgp_code,
    surface_code,
    toric_code,
    bivariate_bicycle_code,
)

__all__ = [
    "rep_code",
    "ring_code",
    "hamming_code",
    "random_binary_code",
    "hgp",
    "hgp_code",
    "surface_code",
    "toric_code",
    "bivariate_bicycle_code",
]
