#!/usr/bin/env python3
"""Mechanical plan-regression gate over two bench records.

Usage: python3 tools/plan_gate.py BASELINE.json CURRENT.json [tol] [slack]

Compares the per-query "shuffle_rows" maps (written by graft.Bench via
ShuffleTally). Shuffle rows are deterministic for a deterministic query
at a fixed scale factor, so a new exchange, a lost pushdown, or a
broadcast join that silently became a shuffle join shows up as a row
jump — this diff fails (exit 1) instead of waiting for a human to read
plans. Compare records from the SAME scale factor. Queries present on
only one side are skipped (new queries have no baseline; retired ones
have nothing to defend). Records carry the min across timed passes:
partial-aggregation fallback under memory pressure inflates
recordsWritten run-to-run (same plan measured at 45k and 301k rows),
and fallback only inflates, so the per-pass min is the plan's
intrinsic count. Mirrors graft.BenchMetrics.gate, which the
sbt spec proves trips on an intentional regression.
"""
import json
import sys


def main(base_path, cur_path, tol=1.25, slack=10000):
    base = json.load(open(base_path)).get("shuffle_rows", {})
    cur = json.load(open(cur_path)).get("shuffle_rows", {})
    if not base or not cur:
        print("plan gate: one record carries no shuffle_rows map "
              "(pre-gate bench?) — nothing to compare")
        return 0
    bad = []
    compared = 0
    for q in sorted(cur):
        if q not in base or base[q] < 0 or cur[q] < 0:
            continue
        compared += 1
        if cur[q] > base[q] * tol + slack:
            bad.append(f"{q}: shuffle rows {cur[q]} > {tol}x baseline "
                       f"{base[q]} (+{slack})")
    for m in bad:
        print("REGRESSION", m)
    if not bad:
        print(f"plan gate clean: {compared} queries compared")
    return 1 if bad else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    extra = [float(args[2])] if len(args) > 2 else []
    if len(args) > 3:
        extra.append(int(args[3]))
    sys.exit(main(args[0], args[1], *extra))
