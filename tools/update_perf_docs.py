"""Regenerate the performance tables in README.md and
docs/performance.md from bench artifacts — ONE source of truth.

Inputs:
- a bench.py JSON line (default: the newest BENCH_r*.json in the repo
  root, else ``--bench path``),
- a decoder_bench JSONL artifact (default: docs/decoder_bench_latest.jsonl,
  refreshed via ``python tools/decoder_bench.py | tee
  docs/decoder_bench_latest.jsonl``).

The tool replaces the region between ``<!-- perf:begin -->`` and
``<!-- perf:end -->`` markers in each doc, so hand-written prose around
the tables survives and the numbers can never drift from the artifacts.

Usage: python tools/update_perf_docs.py [--bench FILE] [--decoders FILE]
"""

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench(path):
    if path is None:
        cands = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if not cands:
            raise SystemExit("no BENCH_r*.json found; pass --bench")
        path = cands[-1]
    rec = json.load(open(path))
    if "parsed" in rec:  # driver wrapper format
        rec = rec["parsed"]
    return rec, os.path.basename(path)


def load_decoders(path):
    rows = []
    if os.path.exists(path):
        for line in open(path):
            line = line.strip()
            if line.startswith("{"):
                rec = json.loads(line)
                if "rate" in rec:
                    rows.append(rec)
    return rows


def headline_block(bench, src):
    base = bench.get("baseline", 0.0)
    lines = [
        "",
        f"Headline (`bench.py`, artifact `{src}`): unrotated surface code "
        "d=13, BSC p=0.01, min-sum BP (α=0.625, ≤30 iters) + OSD-0, one "
        "TPU v5e chip vs the reference C++ decoder compiled and measured "
        "single-core on the same host.",
        "",
        "| pipeline | syndromes/s | vs reference |",
        "|---|---|---|",
        f"| device-resident Monte-Carlo (sample→decode→tally on chip) | "
        f"**{bench['value']:,.0f}** | **{bench['vs_baseline']:.0f}×** |",
        f"| host-boundary `decode_batch` (incl. tunneled-link transfers) | "
        f"{bench.get('host_boundary_rate', 0):,.0f} | "
        f"{bench.get('host_boundary_vs_baseline', 0):.1f}× |",
        f"| reference C++ BP+OSD-0 (single core, best of 5) | "
        f"{base:,.0f} | 1× |",
        "",
    ]
    if "hgp400_mc_rate" in bench:
        lines += [
            "Second headline workload — the reference's flagship "
            "[[400,16,6]] hypergraph-product code "
            "(python_test/test_qcodes.py:95-160), same pipeline, its own "
            "matched baseline:",
            "",
            "| pipeline ([[400,16,6]] HGP) | syndromes/s | vs reference |",
            "|---|---|---|",
            f"| device-resident Monte-Carlo | "
            f"**{bench['hgp400_mc_rate']:,.0f}** | "
            f"**{bench['hgp400_vs_baseline']:.0f}×** |",
            f"| host-boundary `decode_batch` | "
            f"{bench.get('hgp400_host_rate', 0):,.0f} | "
            f"{bench.get('hgp400_host_vs_baseline', 0):.1f}× |",
            f"| reference C++ BP+OSD-0 (single core, best of 5) | "
            f"{bench.get('hgp400_baseline', 0):,.0f} | 1× |",
            "",
        ]
    if "bp_tflops" in bench:
        lines.append(
            f"BP message throughput: {bench['bp_tflops']} Tflop/s of "
            f"useful edge-message flops "
            f"({100 * bench.get('mxu_utilization', 0):.1f}% of one v5e's "
            "f32 peak; the raw one-hot MXU throughput behind it is "
            "tens of percent of peak — see the attainable-bound roofline "
            "in docs/performance.md)."
        )
        lines.append("")
    return lines


def decoder_block(rows, workload="d=13 surface", intro=True, fp=""):
    if not rows:
        return [
            "",
            "(per-family table pending: run `python tools/decoder_bench.py "
            "| tee docs/decoder_bench_latest.jsonl`)",
            "",
        ]
    batch = rows[0].get("batch", 0)
    lines = [
        "",
        (
            f"Per-family rates at the public `decode_batch` surface "
            f"(batch {batch:,}, {workload} workload) against the MATCHED "
            "compiled-reference variant, re-measured by "
            "`tools/decoder_bench.py` (median of reps, best of sweeps; "
            "the shared chip's load makes single runs vary ±30%):"
            if intro
            else f"Same table on the {workload} workload "
            f"(batch {batch:,}):"
        ),
        "",
        "| decoder | syndromes/s | matched C++ baseline | speedup |",
        "|---|---|---|---|",
    ]
    notes = []
    for r in rows:
        base = r.get("baseline")
        ratio = r.get("vs_matched_baseline")
        mark = ""
        note = r.get("note") or r.get("baseline_note")
        if note:
            notes.append(f"{len(notes) + 1}. {note}")
            mark = f" [^{fp}{len(notes)}]"
        lines.append(
            f"| {r['decoder']}{mark} | {r['rate']:,.0f} | "
            + (f"{base:,.0f}" if base else "—")
            + " | "
            + (f"**{ratio:.1f}×**" if ratio else "—")
            + " |"
        )
    lines.append("")
    for i, note in enumerate(notes, 1):
        lines.append(f"[^{fp}{i}]: {note[3:]}")
    if notes:
        lines.append("")
    return lines


def splice(path, block):
    text = open(path).read()
    pattern = re.compile(
        r"(<!-- perf:begin -->).*?(<!-- perf:end -->)", re.S
    )
    if not pattern.search(text):
        raise SystemExit(f"{path}: perf markers not found")
    new = pattern.sub(
        lambda m: m.group(1) + "\n" + "\n".join(block) + m.group(2), text
    )
    open(path, "w").write(new)
    print(f"updated {os.path.relpath(path, ROOT)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None)
    ap.add_argument(
        "--decoders",
        default=os.path.join(ROOT, "docs", "decoder_bench_latest.jsonl"),
    )
    args = ap.parse_args()
    bench, src = load_bench(args.bench)
    rows = load_decoders(args.decoders)
    block = headline_block(bench, src) + decoder_block(rows)
    for extra, label, fp in [
        ("decoder_bench_hgp400.jsonl", "[[400,16,6]] HGP", "h"),
        ("decoder_bench_toric20.jsonl", "toric d=20", "t"),
    ]:
        extra_rows = load_decoders(os.path.join(ROOT, "docs", extra))
        if extra_rows:
            block += decoder_block(extra_rows, workload=label, intro=False, fp=fp)
    splice(os.path.join(ROOT, "README.md"), block)
    splice(os.path.join(ROOT, "docs", "performance.md"), block)
    return 0


if __name__ == "__main__":
    sys.exit(main())
