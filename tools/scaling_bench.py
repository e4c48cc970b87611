"""Scaling measurement: sharded Monte-Carlo throughput at 1..N devices.

Runs the on-chip MC pipeline (surface d=13, p=0.01, BP30+OSD0) over
meshes of increasing size and prints one JSON line per mesh. On real
multi-chip hardware this measures ICI scaling; on a CPU host with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` it validates the
sharded program end to end (BASELINE.md's 1 chip / 1 host / N hosts
scaling requirement — multi-host works the same way after
``jax.distributed.initialize``).
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

from ldpc_tpu.codes import surface_code
from ldpc_tpu.monte_carlo_simulation import make_sharded_mc_step
from ldpc_tpu.parallel import make_mesh


def main():
    code = surface_code(13, compute_logicals=True)
    n_avail = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_avail]
    for nd in sizes:
        mesh = make_mesh(nd)
        step, runs = make_sharded_mc_step(
            code.hx,
            0.01,
            mesh=mesh,
            logicals=code.lx,
            batch_size_per_device=16384,
            rounds_per_call=4,
            max_iter=30,
            ms_scaling_factor=0.625,
        )
        jax.block_until_ready(step(jax.random.key(0)))  # compile
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(step(jax.random.key(i + 1)))
            times.append(time.perf_counter() - t0)
        times.sort()
        rate = runs / times[len(times) // 2]
        print(
            json.dumps(
                {
                    "devices": nd,
                    "syndromes_per_sec": round(rate, 1),
                    "runs_per_call": runs,
                    "backend": jax.devices()[0].platform,
                }
            )
        )


if __name__ == "__main__":
    main()
