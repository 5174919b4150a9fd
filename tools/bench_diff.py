#!/usr/bin/env python3
"""Compare two full per-query bench records (bench/rN.json) written by
graft.Bench.

Usage: python3 tools/bench_diff.py bench/r10.json bench/r11.json [ratio]

Prints every query whose median changed by more than `ratio` (default 1.3x)
in either direction, with min/max spread so machine noise (median far from
min, huge max) is visible at a glance — the r4 "q57 5x slowdown" lesson.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    qo, qn = old["queries"], new["queries"]
    so, sn = old.get("spread", {}), new.get("spread", {})
    shared = sorted(set(qo) & set(qn))
    print(f"shared queries: {len(shared)}  "
          f"only-old: {sorted(set(qo) - set(qn))}  "
          f"only-new: {sorted(set(qn) - set(qo))}")
    tot_o = sum(qo[q] for q in shared if qo[q] >= 0)
    tot_n = sum(qn[q] for q in shared if qn[q] >= 0)
    print(f"shared-total median: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)")
    flagged = []
    for q in shared:
        a, b = qo[q], qn[q]
        if a < 0 or b < 0:
            flagged.append((float("inf"), q, a, b))
        elif b > a * ratio or a > b * ratio:
            flagged.append((max(b / a, a / b), q, a, b))
    for r, q, a, b in sorted(flagged, reverse=True):
        om = so.get(q, {})
        nm = sn.get(q, {})
        print(f"{q}: {a:.2f}s -> {b:.2f}s ({b / a if a > 0 else -1:.2f}x)  "
              f"old[min {om.get('min', '?')}, max {om.get('max', '?')}]  "
              f"new[min {nm.get('min', '?')}, max {nm.get('max', '?')}]")
    if not flagged:
        print(f"no query moved more than {ratio}x")


if __name__ == "__main__":
    main()
