"""Generate golden BP+OSD fixtures by running the reference implementation.

Same oracle setup as ``generate_bp_golden.py`` (osd_oracle.cpp compiled
against the reference headers, outside this repo). BP config is min-sum
parallel, the quantum-benchmark default. Stored in ``osd_golden.npz`` and
replayed by ``tests/test_osd_golden.py``.
"""

import itertools
import subprocess
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
from ldpc_tpu.codes import hamming_code, ring_code, surface_code  # noqa: E402

ORACLE = "/tmp/oracle/osd_oracle"
MAX_ITER = 5  # low so OSD activates often

# (osd_method, osd_order): 0=OSD_0, 1=EXHAUSTIVE, 2=COMBINATION_SWEEP
OSD_CONFIGS = [(0, 0), (1, 4), (2, 4), (2, 0)]


def build_codes():
    codes = {
        "hamming3": np.asarray(hamming_code(3).todense(), np.uint8),
        "ring8": np.asarray(ring_code(8).todense(), np.uint8),
        "surface3": np.asarray(surface_code(3).hx.todense(), np.uint8),
    }
    return codes


def syndromes_for(name, H):
    m, n = H.shape
    if m <= 8:
        return np.array(list(itertools.product([0, 1], repeat=m)), np.uint8)
    rng = np.random.default_rng(42)
    errors = (rng.random((128, n)) < 0.08).astype(np.uint8)
    return (errors @ H.T % 2).astype(np.uint8)


def run_oracle(H, channel, syndromes, osd_method, osd_order):
    m, n = H.shape
    lines = [f"{m} {n}"]
    for row in H:
        lines.append(" ".join(str(int(v)) for v in row))
    lines.append(" ".join(f"{p:.10f}" for p in channel))
    lines.append(str(len(syndromes)))
    for s in syndromes:
        lines.append(" ".join(map(str, s)))
    out = subprocess.run(
        [ORACLE, "1", "1", str(MAX_ITER), "0.625", str(osd_method), str(osd_order)],
        input="\n".join(lines),
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    conv, decs, osd0s, osdws = [], [], [], []
    for line in out.strip().splitlines():
        parts = line.split()
        conv.append(int(parts[1]))
        decs.append([int(v) for v in parts[3 : 3 + n]])
        osd0s.append([int(v) for v in parts[4 + n : 4 + 2 * n]])
        osdws.append([int(v) for v in parts[5 + 2 * n : 5 + 3 * n]])
    return (
        np.array(conv, np.uint8),
        np.array(decs, np.uint8),
        np.array(osd0s, np.uint8),
        np.array(osdws, np.uint8),
    )


def main():
    data = {}
    for cname, H in build_codes().items():
        m, n = H.shape
        channel = 0.05 + 0.002 * np.arange(n)
        syndromes = syndromes_for(cname, H)
        data[f"{cname}/pcm"] = H
        data[f"{cname}/channel"] = channel
        data[f"{cname}/syndromes"] = syndromes
        for osd_method, osd_order in OSD_CONFIGS:
            key = f"{cname}/{osd_method}_{osd_order}"
            conv, dec, osd0, osdw = run_oracle(
                H, channel, syndromes, osd_method, osd_order
            )
            data[f"{key}/conv"] = conv
            data[f"{key}/dec"] = dec
            data[f"{key}/osd0"] = osd0
            data[f"{key}/osdw"] = osdw
            print(key, "bp conv", conv.sum(), "/", len(conv))
    np.savez_compressed(__file__.rsplit("/", 1)[0] + "/osd_golden.npz", **data)


if __name__ == "__main__":
    main()
