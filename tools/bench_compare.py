#!/usr/bin/env python3
"""Round-over-round bench comparison (the r13 verdict's habit, scripted).

Usage: python3 tools/bench_compare.py <prev_bench.json> <cur_bench.json>
       [threshold_ratio=1.5] [threshold_abs_s=0.5]

Reads two Bench records (the single-line JSON with a "queries" map of
per-query median seconds), compares the SHARED query set, and prints:
totals on shared queries, the overall ratio, per-query threshold
regressions (> ratio AND > +abs seconds — BASELINE.md's rule), the new
queries' cost, and the largest movers both ways.
"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)

def main():
    prev, cur = load(sys.argv[1]), load(sys.argv[2])
    r_thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    a_thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    pq, cq = prev["queries"], cur["queries"]
    shared = sorted(set(pq) & set(cq))
    new = sorted(set(cq) - set(pq))
    gone = sorted(set(pq) - set(cq))
    pt = sum(pq[q] for q in shared)
    ct = sum(cq[q] for q in shared)
    ratio = f"{ct / pt:.3f}x" if pt > 0 else "n/a (prev total 0)"
    print(f"shared queries: {len(shared)}  prev {pt:.1f} s  cur {ct:.1f} s  "
          f"ratio {ratio}")
    regs = [(q, pq[q], cq[q]) for q in shared
            if cq[q] > r_thresh * pq[q] and cq[q] - pq[q] > a_thresh]
    print(f"threshold regressions (> {r_thresh}x and > +{a_thresh} s): "
          f"{len(regs)}")
    for q, a, b in sorted(regs, key=lambda x: x[2] - x[1], reverse=True):
        x = f"{b / a:.2f}x" if a > 0 else "inf"
        print(f"  REG {q}: {a:.2f} -> {b:.2f} s ({x})")
    if new:
        print(f"new queries ({len(new)}): "
              + ", ".join(f"{q} {cq[q]:.1f}s" for q in new)
              + f"  (total {sum(cq[q] for q in new):.1f} s)")
    if gone:
        print(f"removed queries ({len(gone)}): {', '.join(gone)}")
    movers = sorted(shared, key=lambda q: cq[q] - pq[q])
    print("largest improvements:")
    for q in movers[:5]:
        print(f"  {q}: {pq[q]:.2f} -> {cq[q]:.2f} s ({cq[q] - pq[q]:+.2f})")
    print("largest slowdowns:")
    for q in movers[-5:][::-1]:
        print(f"  {q}: {pq[q]:.2f} -> {cq[q]:.2f} s ({cq[q] - pq[q]:+.2f})")

if __name__ == "__main__":
    main()
