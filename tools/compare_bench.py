#!/usr/bin/env python3
"""Diff two bench_full.json files (complete per-query maps) and flag regressions.

Usage: python3 tools/compare_bench.py <old.json> <new.json> [ratio_threshold]

Flags queries whose time grew by more than `ratio_threshold` (default 2.0) AND by
more than 0.3 s absolute (sub-0.3 s queries are dominated by per-query fixed cost
and local-box noise). Also lists added/removed queries so a silently-dropped
registration is visible.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    return d.get("queries", d)


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    old, new = load(old_path), load(new_path)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    regressions = []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if not (isinstance(a, (int, float)) and isinstance(b, (int, float))):
            continue
        if a > 0 and b / a > thresh and b - a > 0.3:
            regressions.append((b / a, name, a, b))
    regressions.sort(reverse=True)
    for ratio, name, a, b in regressions:
        print(f"REGRESSION {ratio:5.1f}x {name}: {a:.2f}s -> {b:.2f}s")
    tot_old = sum(v for v in old.values() if isinstance(v, (int, float)) and v > 0)
    tot_new = sum(v for v in new.values() if isinstance(v, (int, float)) and v > 0)
    print(f"total: {tot_old:.1f}s ({len(old)} q) -> {tot_new:.1f}s ({len(new)} q)")
    sys.exit(1 if regressions or removed else 0)


if __name__ == "__main__":
    main()
