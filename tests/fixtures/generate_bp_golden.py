"""Generate golden BP fixtures by running the reference C++ implementation.

Requires the reference source tree (quantumgizmos/ldpc) and a small oracle
harness compiled against its headers (kept outside this repo):

    g++ -std=c++20 -O2 -I$REF/src_cpp -I$REF/include -o bp_oracle bp_oracle.cpp

The oracle reads ``m n``, the dense PCM, per-bit channel probabilities, and
a list of syndromes on stdin, and prints ``conv iter dec... llr...`` per
syndrome. Output is stored in ``bp_golden.npz``, replayed by
``tests/test_bp_golden.py`` for exact decoding/convergence parity.
"""

import itertools
import subprocess
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
from ldpc_tpu.codes import hamming_code, rep_code, ring_code  # noqa: E402

ORACLE = "/tmp/oracle/bp_oracle"
MAX_ITER = 20

CODES = {
    "hamming3": hamming_code(3),
    "rep7": rep_code(7),
    "ring8": ring_code(8),
}

# (bp_method, schedule, ms_scaling_factor)
CONFIGS = [
    (0, 1, 1.0),  # product-sum parallel
    (0, 0, 1.0),  # product-sum serial
    (0, 2, 1.0),  # product-sum serial-relative
    (1, 1, 1.0),  # min-sum parallel
    (1, 1, 0.625),
    (1, 1, 0.0),  # dynamic alpha
    (1, 0, 1.0),  # min-sum serial
    (1, 0, 0.625),
    (1, 2, 0.625),  # min-sum serial-relative
]


def run_oracle(H, channel, syndromes, method, sched, alpha):
    m, n = H.shape
    lines = [f"{m} {n}"]
    for row in np.asarray(H.todense()):
        lines.append(" ".join(str(int(v)) for v in row))
    lines.append(" ".join(f"{p:.10f}" for p in channel))
    lines.append(str(len(syndromes)))
    for s in syndromes:
        lines.append(" ".join(map(str, s)))
    out = subprocess.run(
        [ORACLE, str(method), str(sched), str(MAX_ITER), str(alpha)],
        input="\n".join(lines),
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    conv, iters, decs, llrs = [], [], [], []
    for line in out.strip().splitlines():
        parts = line.split()
        conv.append(int(parts[1]))
        iters.append(int(parts[3]))
        decs.append([int(v) for v in parts[5 : 5 + n]])
        llrs.append([float(v) for v in parts[6 + n : 6 + 2 * n]])
    return (
        np.array(conv, np.uint8),
        np.array(iters, np.int32),
        np.array(decs, np.uint8),
        np.array(llrs, np.float64),
    )


def main():
    data = {}
    for cname, H in CODES.items():
        m, n = H.shape
        # distinct per-bit probabilities avoid sort-tie ambiguity in the
        # serial_relative schedule
        channel = 0.05 + 0.002 * np.arange(n)
        syndromes = np.array(
            list(itertools.product([0, 1], repeat=m)), dtype=np.uint8
        )
        data[f"{cname}/pcm"] = np.asarray(H.todense(), np.uint8)
        data[f"{cname}/channel"] = channel
        data[f"{cname}/syndromes"] = syndromes
        for method, sched, alpha in CONFIGS:
            key = f"{cname}/{method}_{sched}_{alpha}"
            conv, iters, decs, llrs = run_oracle(
                H, channel, syndromes, method, sched, alpha
            )
            data[f"{key}/conv"] = conv
            data[f"{key}/iters"] = iters
            data[f"{key}/dec"] = decs
            data[f"{key}/llr"] = llrs
            print(key, "conv", conv.sum(), "/", len(conv))
    np.savez_compressed(
        __file__.rsplit("/", 1)[0] + "/bp_golden.npz", **data
    )


if __name__ == "__main__":
    main()
