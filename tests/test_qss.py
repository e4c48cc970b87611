"""Quasi-single-shot simulator test (reference behavior:
quasi_single_shot_v2.py driven as in phenomenological_noise_sim.py)."""

import numpy as np
import pytest

from ldpc_tpu.codes import ring_code
from ldpc_tpu.monte_carlo_simulation import BpParams, QssSimulator


def toric1d():
    """Use the ring (1D toric) code: H = ring_code, logical = all-ones."""
    H = np.asarray(ring_code(6).todense(), np.int32)
    L = np.ones((1, 6), np.int32)
    return H, L


@pytest.mark.parametrize("method", ["bposd", "lsd"])
def test_qss_low_noise_succeeds(method):
    H, L = toric1d()
    sim = QssSimulator(
        H=H,
        L=L,
        per=0.01,
        ser=0.01,
        bias=[1.0, 0.0, 0.0],
        decoding_method=method,
        check_side="Z",
        rounds=6,
        repetitions=4,
        bp_params=BpParams(max_bp_iter=12, osd_method="osd_0", osd_order=0),
        seed=7,
    )
    out = sim.run(samples=30)
    assert out["nr_runs"] == 30
    assert out["x_success_cnt"] >= 25  # low noise: mostly successful


def test_qss_validation():
    H, L = toric1d()
    with pytest.raises(ValueError, match="even"):
        QssSimulator(
            H=H, L=L, per=0.01, ser=0.01, bias=[1, 0, 0],
            rounds=4, repetitions=3,
        )
    with pytest.raises(ValueError, match="Decoding method"):
        QssSimulator(
            H=H, L=L, per=0.01, ser=0.01, bias=[1, 0, 0],
            rounds=4, repetitions=4, decoding_method="bogus",
        )
