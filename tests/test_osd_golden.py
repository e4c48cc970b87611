"""Exact-parity replay of golden BP+OSD fixtures from the reference.

Fixtures from ``generate_osd_golden.py``: min-sum parallel BP (max_iter=5,
alpha=0.625) + OSD fallback. In f64 the BP LLRs are bit-exact, the
reliability ordering matches, and the OSD pivot-column sets and candidate
sweeps are deterministic — so decodings must match bit-for-bit.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ldpc_tpu import BpOsdDecoder

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "osd_golden.npz")
DATA = np.load(FIXTURE)

CODES = ["hamming3", "ring8", "surface3"]
OSD_CONFIGS = [(0, 0), (1, 4), (2, 4), (2, 0)]
METHOD_NAME = {0: "osd_0", 1: "osd_e", 2: "osd_cs"}


def _in_image_mask(H, syndromes):
    """Rows whose syndrome lies in the column span of H.

    Real syndromes (s = H e) are always in the image; exhaustive sweeps
    also hit inconsistent ones, where any 'solution' is arbitrary and
    depends on internal pivot-row choices — excluded from parity checks.
    """
    from ldpc_tpu.mod2 import rank as gf2_rank

    r = gf2_rank(H)
    return np.array(
        [gf2_rank(np.hstack([H, s[:, None]])) == r for s in syndromes]
    )


@pytest.mark.parametrize("config", OSD_CONFIGS, ids=lambda c: f"m{c[0]}_o{c[1]}")
@pytest.mark.parametrize("cname", CODES)
def test_osd_golden_parity(cname, config):
    osd_method, osd_order = config
    H = DATA[f"{cname}/pcm"]
    channel = DATA[f"{cname}/channel"]
    syndromes = DATA[f"{cname}/syndromes"]
    key = f"{cname}/{osd_method}_{osd_order}"

    d = BpOsdDecoder(
        H,
        error_channel=channel,
        max_iter=5,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        schedule="parallel",
        osd_method=METHOD_NAME[osd_method],
        osd_order=osd_order,
        dtype=jnp.float64,
    )
    got = d.decode_batch(syndromes)
    want_conv = DATA[f"{key}/conv"].astype(bool)
    zero = ~syndromes.any(axis=1)
    assert (d.converge_batch[~zero] == want_conv[~zero]).all()
    ok = _in_image_mask(H, syndromes)
    want = DATA[f"{key}/dec"]
    assert (got[ok] == want[ok]).all(), (
        f"{key}: {int((got[ok] != want[ok]).any(axis=1).sum())} mismatches"
    )
    assert (d.osd0_decoding_batch[ok] == DATA[f"{key}/osd0"][ok]).all()
    assert (d.osdw_decoding_batch[ok] == DATA[f"{key}/osdw"][ok]).all()
    # every in-image decoding must reproduce its syndrome
    assert ((got[ok] @ H.T % 2) == syndromes[ok]).all()
