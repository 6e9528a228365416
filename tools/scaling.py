#!/usr/bin/env python3
"""Scaling-ratio report: compare two bench_full.json runs (e.g. sf0.1 vs sf1) and emit a
markdown table of per-query times and ratios, sorted by ratio descending.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> [data_factor]
data_factor (default 10) is the data-size multiple between the runs; ratios are also
reported normalized by it (norm < 1 means the query scales SUB-linearly).
"""
import sys, json

def load(p):
    with open(p) as f:
        return json.load(f)

def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sq, bq = small["queries"], big["queries"]
    rows = []
    for name in sorted(bq):
        s, b = sq.get(name), bq[name]
        if s is None or s <= 0 or b <= 0:
            rows.append((float("inf"), name, s, b))
            continue
        rows.append((b / s, name, s, b))
    rows.sort(key=lambda r: -r[0])
    print(f"| query | t({sys.argv[1].split('/')[-1]}) s | t({sys.argv[2].split('/')[-1]}) s "
          f"| ratio | ratio/{factor:g}x |")
    print("|---|---|---|---|---|")
    for ratio, name, s, b in rows:
        if s is None:
            print(f"| {name} | - | {b:.3f} | new | - |")
        elif ratio == float("inf"):
            print(f"| {name} | {s:.3f} | FAILED | - | - |")
        else:
            print(f"| {name} | {s:.3f} | {b:.3f} | {ratio:.2f}x | {ratio/factor:.2f} |")
    st, bt = small["value"], big["value"]
    print(f"\nTOTAL: {st:.1f}s -> {bt:.1f}s = {bt/st:.2f}x for {factor:g}x data "
          f"(normalized {bt/st/factor:.2f})")
    over = [(r, n) for r, n, s, b in rows if r != float("inf") and s and r > factor * 1.2]
    print(f"superlinear (> {factor*1.2:.0f}x): {[n for _, n in over] or 'none'}")

if __name__ == "__main__":
    main()
