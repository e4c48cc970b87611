"""Phenomenological-noise quasi-single-shot threshold sweep.

Port of the reference's panqec+matplotlib plot script
(reference: src_python/ldpc/monte_carlo_simulation/
phenomenological_noise_sim.py:1-81) with no external dependencies: the
toric code comes from ``ldpc_tpu.codes`` instead of panqec, and the
window-decoded Monte-Carlo loop runs on the accelerator via
``DeviceQss`` (thousands of shots per dispatch) rather than one shot at
a time. Prints a LER table per distance; pass ``--plot`` to also save a
matplotlib figure when matplotlib is available.

Usage: python examples/phenomenological_noise_sim.py [--plot]
        [--samples N] [--distances 3,5] [--ps 0.015:0.035:4]
"""

import argparse
import sys

import numpy as np

from ldpc_tpu.codes import toric_code
from ldpc_tpu.monte_carlo_simulation import DeviceQss


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=300)
    ap.add_argument("--distances", default="3,5")
    ap.add_argument("--ps", default="0.015:0.035:4")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args(argv)

    lo, hi, num = args.ps.split(":")
    ps = np.linspace(float(lo), float(hi), int(num))
    dists = [int(d) for d in args.distances.split(",")]
    decoding_rds = 1

    curves = {}
    for dist in dists:
        code = toric_code(dist, compute_logicals=True)
        Hz = np.asarray(code.hz.todense(), np.int32)
        Lz = np.asarray(code.lz.todense(), np.int32)
        lers = []
        for p in ps:
            sim = DeviceQss(
                H=Hz,
                L=Lz,
                per=float(p),
                ser=float(p),
                xyz_error_bias=[1.0, 0.0, 0.0],
                check_side="Z",
                analog_tg=False,
                rounds=(decoding_rds + 1) * dist,
                repetitions=2 * dist,
                max_iter=5,
                batch_size=256,
            )
            out = sim.run(samples=args.samples)
            lers.append(out["x_ler"])
            print(
                f"d={dist} p={p:.4f} x_ler={out['x_ler']:.4f} "
                f"(+-{out['x_ler_eb']:.4f})",
                flush=True,
            )
        curves[dist] = lers

    if args.plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping plot", file=sys.stderr)
            return 0
        fig, ax = plt.subplots(figsize=(6, 4))
        for dist, lers in curves.items():
            ax.plot(ps, lers, marker="o", linestyle="dashed", label=f"d={dist}")
        ax.set_xlabel("p")
        ax.set_ylabel("LER")
        ax.set_yscale("log")
        ax.legend()
        fig.savefig("code-2DTC.png", dpi=150)
        print("saved code-2DTC.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
