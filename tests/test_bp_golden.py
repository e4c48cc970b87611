"""Exact-parity replay of golden BP fixtures from the reference C++ decoder.

``tests/fixtures/bp_golden.npz`` holds per-syndrome decodings, convergence
flags, iteration counts and posterior LLRs produced by the reference
implementation (see ``generate_bp_golden.py``), decoded here in f64 mode.

Strictness tiers (all empirically at the limit of what's attainable):

- min-sum (any schedule): bit-exact decodings/convergence/iterations and
  LLRs to 1e-9 — the fp fold order matches the reference exactly.
- product-sum parallel: exact decodings/convergence/iterations; LLRs to
  ~1e-5 (XLA's f64 tanh differs from glibc's by 1 ulp, which is amplified
  near message saturation).
- product-sum serial: exact convergence flags; exact decodings on the
  converged rows (non-converged trajectories are chaotic under 1-ulp
  differences).
- product-sum serial_relative: the 1-ulp LLR noise reorders the
  per-iteration schedule re-sort, so only statistical agreement holds:
  converged fraction within a few rows, and every converged decoding must
  satisfy H @ x = s.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ldpc_tpu import BpDecoder

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "bp_golden.npz")
DATA = np.load(FIXTURE)

CODES = ["hamming3", "rep7", "ring8"]
CONFIGS = [
    (0, 1, 1.0),
    (0, 0, 1.0),
    (0, 2, 1.0),
    (1, 1, 1.0),
    (1, 1, 0.625),
    (1, 1, 0.0),
    (1, 0, 1.0),
    (1, 0, 0.625),
    (1, 2, 0.625),
]
SCHED_NAME = {0: "serial", 1: "parallel", 2: "serial_relative"}
METHOD_NAME = {0: "product_sum", 1: "minimum_sum"}


def _llr_err(got, want):
    """Max abs error over entries where both are finite and equal-signed inf."""
    with np.errstate(invalid="ignore"):
        err = np.abs(got - want)
    err = np.where(np.isnan(want) & np.isnan(got), 0.0, err)
    err = np.where(np.isinf(want) & (want == got), 0.0, err)
    return np.nanmax(err) if err.size else 0.0


@pytest.mark.parametrize("config", CONFIGS, ids=lambda c: f"m{c[0]}_s{c[1]}_a{c[2]}")
@pytest.mark.parametrize("cname", CODES)
def test_golden_parity(cname, config):
    method, sched, alpha = config
    H = DATA[f"{cname}/pcm"]
    channel = DATA[f"{cname}/channel"]
    syndromes = DATA[f"{cname}/syndromes"]
    key = f"{cname}/{method}_{sched}_{alpha}"
    want_conv = DATA[f"{key}/conv"].astype(bool)
    want_iters = DATA[f"{key}/iters"]
    want_dec = DATA[f"{key}/dec"]
    want_llr = DATA[f"{key}/llr"]

    d = BpDecoder(
        H,
        error_channel=channel,
        max_iter=20,
        bp_method=METHOD_NAME[method],
        schedule=SCHED_NAME[sched],
        ms_scaling_factor=alpha,
        input_vector_type="syndrome",
        dtype=jnp.float64,
    )
    got_dec = d.decode_batch(syndromes)
    got_conv = d.converge_batch.astype(bool)
    got_iters = d.iter_batch
    got_llr = d.log_prob_ratios_batch

    if method == 1:  # min-sum: bit-exact
        assert (got_conv == want_conv).all()
        assert (got_dec == want_dec).all()
        assert (got_iters == want_iters).all()
        assert _llr_err(got_llr, want_llr) < 1e-9
    elif sched == 1:  # product-sum parallel
        assert (got_conv == want_conv).all()
        assert (got_dec == want_dec).all()
        assert (got_iters == want_iters).all()
        assert _llr_err(got_llr, want_llr) < 1e-4
    elif sched == 0:  # product-sum serial
        assert (got_conv == want_conv).all()
        conv = want_conv
        assert (got_dec[conv] == want_dec[conv]).all()
        assert (got_iters[conv] == want_iters[conv]).all()
    else:  # product-sum serial_relative: statistical agreement
        assert abs(int(got_conv.sum()) - int(want_conv.sum())) <= 8
        ok = (got_dec[got_conv] @ H.T % 2 == syndromes[got_conv]).all()
        assert ok, "converged decoding does not reproduce its syndrome"
