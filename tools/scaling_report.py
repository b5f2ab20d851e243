#!/usr/bin/env python3
"""Emit a per-query scaling table (markdown) between two bench runs.

Usage: python3 tools/scaling_report.py A.json B.json [labelA labelB]
  (labels default to sf0.1 / sf1)

Reads two graft.Bench JSON artifacts (same query surface) and prints a
markdown table of per-query seconds and the B/A ratio, sorted by
ratio descending, plus totals. A ratio near the data growth is
linear scaling; well under it is sublinear (fixed overhead amortizing);
well over it flags a superlinear query worth a plan audit.
"""
import json
import sys


def main(p01, p1, la="sf0.1", lb="sf1"):
    a = json.load(open(p01))["queries"]
    b = json.load(open(p1))["queries"]
    common = sorted(set(a) & set(b))
    rows = [(n, a[n], b[n], b[n] / a[n]) for n in common]
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {la} s | {lb} s | ratio |")
    print("|---|---|---|---|")
    for n, x, y, r in rows:
        print(f"| {n} | {x:.2f} | {y:.2f} | {r:.1f}x |")
    ta, tb = sum(a[n] for n in common), sum(b[n] for n in common)
    print(f"| **total ({len(common)} queries)** | **{ta:.1f}** | **{tb:.1f}** "
          f"| **{tb / ta:.1f}x** |")


if __name__ == "__main__":
    main(*sys.argv[1:5])
