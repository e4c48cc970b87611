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


def test_generate_err_reference_parity():
    """Pin generate_err to the reference semantics
    (simulation_utils.py:90-127): one uniform draw per qubit; a Z/X/Y hit
    FLIPS the corresponding residual bit; non-hit bits KEEP the residual."""
    from ldpc_tpu.monte_carlo_simulation.simulation_utils import generate_err

    N = 64
    rng = np.random.default_rng(3)
    px = rng.random(N) * 0.2
    py = rng.random(N) * 0.2
    pz = rng.random(N) * 0.2
    rx = rng.integers(0, 2, N).astype(np.int64)
    rz = rng.integers(0, 2, N).astype(np.int64)

    np.random.seed(11)
    got_x, got_z = generate_err(
        N, [px, py, pz], [rx.copy(), rz.copy()]
    )

    # oracle: scalar transliteration of the reference's njit loop
    np.random.seed(11)
    want_x, want_z = rx.copy(), rz.copy()
    for i in range(N):
        r = np.random.random()
        if r < pz[i]:
            want_z[i] ^= 1
        elif r < pz[i] + px[i]:
            want_x[i] ^= 1
        elif r < pz[i] + px[i] + py[i]:
            want_z[i] ^= 1
            want_x[i] ^= 1

    assert np.array_equal(got_x, want_x)
    assert np.array_equal(got_z, want_z)


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
