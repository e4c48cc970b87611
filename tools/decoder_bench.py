"""Per-decoder batched throughput on the BASELINE d=13 surface workload.

The headline bench (bench.py) measures the BP+OSD-0 pipeline; this tool
measures the whole decoder family at the public ``decode_batch`` surface
so regressions in any variant are visible. Prints one JSON line per
decoder:

    {"decoder": "BpOsdDecoder[osd_cs-2]", "rate": N, "unit": "syndromes/s"}

Usage: python tools/decoder_bench.py [batch] [reps]
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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax

    from ldpc_tpu import (
        BeliefFindDecoder,
        BpDecoder,
        BpLsdDecoder,
        BpOsdDecoder,
        UnionFindDecoder,
    )
    from ldpc_tpu.codes import surface_code

    code = surface_code(13)
    H = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(11)
    errors = (rng.random((batch, H.shape[1])) < 0.01).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)

    common = dict(
        error_rate=0.01,
        max_iter=30,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
    )
    variants = [
        ("BpDecoder", BpDecoder(code.hx, **common)),
        (
            "BpOsdDecoder[osd0]",
            BpOsdDecoder(code.hx, osd_method="osd_0", **common),
        ),
        (
            "BpOsdDecoder[osd_cs-2]",
            BpOsdDecoder(code.hx, osd_method="osd_cs", osd_order=2, **common),
        ),
        (
            "BpLsdDecoder[lsd0]",
            BpLsdDecoder(code.hx, lsd_method="lsd_0", lsd_order=0, **common),
        ),
        (
            "BeliefFindDecoder[inversion]",
            BeliefFindDecoder(code.hx, uf_method="inversion", **common),
        ),
        (
            "UnionFindDecoder[matrix]",
            UnionFindDecoder(code.hx, uf_method=True),
        ),
        (
            "BeliefFindDecoder[peeling]",
            BeliefFindDecoder(code.hx, uf_method="peeling", **common),
        ),
    ]
    for name, dec in variants:
        try:
            out = np.asarray(dec.decode_batch(syndromes))  # warmup/compile
            valid = ((out @ H.T) % 2 == syndromes).all()
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                dec.decode_batch(syndromes)
                times.append(time.perf_counter() - t0)
            times.sort()
            rate = batch / times[len(times) // 2]
            print(
                json.dumps(
                    {
                        "decoder": name,
                        "rate": round(rate, 1),
                        "unit": "syndromes/s",
                        "valid": bool(valid),
                        "batch": batch,
                        "backend": jax.default_backend(),
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # keep the sweep going
            print(
                json.dumps({"decoder": name, "error": str(exc)[:200]}),
                flush=True,
            )


if __name__ == "__main__":
    main()
