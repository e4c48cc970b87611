"""Device-resident multi-round (sliding-window) decode throughput.

The sequence-scaling workload: R rounds of noisy syndrome measurement on
a surface-code memory, decoded with overlapping windows of the
space-time PCM — the reference runs this as a host loop one window and
one shot at a time (reference: memory_experiment_v2.py:72-160); here the
whole window scan is one jitted device program batched over shots
(ldpc_tpu/parallel/window.py). Prints one JSON line:

    {"metric": "round_syndromes_per_sec_window", "value": N, ...}

Usage: python tools/window_bench.py [distance] [rounds] [batch] [reps]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    W = 4  # window span (rounds), slide W//2

    import jax

    from ldpc_tpu.codes import surface_code
    from ldpc_tpu.parallel.window import make_window_decoder

    p = 0.003
    code = surface_code(d)
    m, n = code.hx.shape
    decode = make_window_decoder(
        code.hx,
        W,
        np.full(n, p),
        np.full(m, p),
        max_iter=20,
        ms_scaling_factor=0.625,
    )

    # recorded cumulative syndromes of a phenomenological-noise memory run
    rng = np.random.default_rng(3)
    H = np.asarray(code.hx.todense(), np.uint8)
    err = np.zeros((B, n), np.uint8)
    syn = np.zeros((B, m, R), np.uint8)
    for r in range(R):
        err ^= (rng.random((B, n)) < p).astype(np.uint8)
        s = (err @ H.T) % 2
        flips = (rng.random((B, m)) < p).astype(np.uint8)
        syn[:, :, r] = s ^ flips

    out = decode(syn)  # warmup + compile
    corr = np.asarray(out.correction)
    assert corr.shape == (B, n)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(decode(syn).correction)
        times.append(time.perf_counter() - t0)
    times.sort()
    rate = B * R / times[len(times) // 2]
    print(
        json.dumps(
            {
                "metric": "round_syndromes_per_sec_window",
                "value": round(rate, 1),
                "unit": "round-syndromes/s",
                "distance": d,
                "rounds": R,
                "window": W,
                "batch": B,
                "shots_per_sec": round(rate / R, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
