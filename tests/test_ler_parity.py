"""Logical-error-rate parity against the actual reference implementation.

The north-star target requires throughput *at matched LER*
(BASELINE.md). This test decodes the SAME sampled syndromes with the
reference C++ BP+OSD (compiled from the read-only reference headers via
native/bench_baseline.cpp) and with this framework, and asserts the two
logical-error rates agree within combined Monte-Carlo error. Skipped when
the reference tree or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from ldpc_tpu import BpOsdDecoder
from ldpc_tpu.codes import surface_code

REF = "/root/reference"
BIN = "/tmp/ldpc_tpu_parity/bench_baseline"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src_cpp"))
    or shutil.which("g++") is None,
    reason="reference tree or C++ toolchain unavailable",
)


def _build_binary():
    if os.path.exists(BIN):
        return BIN
    os.makedirs(os.path.dirname(BIN), exist_ok=True)
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "bench_baseline.cpp",
    )
    subprocess.run(
        [
            "g++", "-O2", "-std=c++20", "-o", BIN, src,
            "-I", os.path.join(REF, "src_cpp"),
            "-I", os.path.join(REF, "include"),
        ],
        check=True,
        capture_output=True,
        timeout=600,
    )
    return BIN

def _reference_decode(H, channel, syndromes, max_iter, ms_factor):
    m, n = H.shape
    lines = [f"{m} {n}"]
    lines += [" ".join(map(str, row)) for row in H]
    lines.append(" ".join(f"{p:.10f}" for p in channel))
    lines.append(str(len(syndromes)))
    lines += [" ".join(map(str, s)) for s in syndromes]
    out = subprocess.run(
        [_build_binary(), str(max_iter), str(ms_factor), "0", "0", "1"],
        input="\n".join(lines),
        capture_output=True,
        text=True,
        check=True,
        timeout=600,
    ).stdout.splitlines()
    rows = [
        np.frombuffer(line.encode(), np.uint8) - ord("0")
        for line in out[1:]
        if line
    ]
    return np.stack(rows).astype(np.uint8)


def test_surface_d13_ler_matches_reference():
    code = surface_code(13, compute_logicals=True)
    H = np.asarray(code.hx.todense(), np.uint8)
    lx = np.asarray(code.lx.todense(), np.uint8)
    p, max_iter, alpha = 0.03, 30, 0.625
    rng = np.random.default_rng(42)
    B = 4096
    errors = (rng.random((B, H.shape[1])) < p).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)

    ref = _reference_decode(H, np.full(H.shape[1], p), syndromes, max_iter, alpha)
    assert ((ref @ H.T) % 2 == syndromes).all()
    ref_fail = (((errors ^ ref) @ lx.T % 2) != 0).any(axis=1)

    dec = BpOsdDecoder(
        code.hx,
        error_rate=p,
        max_iter=max_iter,
        bp_method="ms",
        ms_scaling_factor=alpha,
        schedule="parallel",
        osd_method="osd_0",
    )
    ours = dec.decode_batch(syndromes)
    assert ((ours @ H.T) % 2 == syndromes).all()
    our_fail = (((errors ^ ours) @ lx.T % 2) != 0).any(axis=1)

    ler_ref, ler_our = ref_fail.mean(), our_fail.mean()
    # binomial 4-sigma window on the DIFFERENCE of the two estimates
    pbar = (ler_ref + ler_our) / 2
    sigma = np.sqrt(max(2 * pbar * (1 - pbar) / B, 1e-12))
    assert abs(ler_ref - ler_our) <= max(4 * sigma, 8 / B), (
        ler_ref,
        ler_our,
    )
    # the bulk of decodings should be literally identical (same algorithm;
    # the reference runs f64 messages vs our f32, so marginal trajectories
    # diverge on a fraction of the hard cases)
    assert (ref == ours).all(axis=1).mean() > 0.8
