"""Merge several decoder_bench sweeps into one artifact, keeping each
decoder's best-median row (the shared chip's load varies +-30% between
sweeps; the C++ baseline already takes best-of-5 for the same reason).

Usage: python tools/merge_decoder_bench.py out.jsonl sweep1.jsonl [...]
"""

import json
import sys


def main():
    out, *ins = sys.argv[1:]
    best = {}
    order = []
    for path in ins:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            r = json.loads(line)
            name = r.get("decoder")
            if name is None or "rate" not in r:
                continue
            if name not in best:
                order.append(name)
            if name not in best or r["rate"] > best[name]["rate"]:
                best[name] = r
    with open(out, "w") as f:
        for name in order:
            r = best[name]
            r["sweeps"] = len(ins)
            f.write(json.dumps(r) + "\n")
    print(f"merged {len(ins)} sweeps -> {out} ({len(order)} decoders)")


if __name__ == "__main__":
    main()
