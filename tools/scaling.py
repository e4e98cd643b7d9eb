#!/usr/bin/env python3
"""Scale-up timing comparison: two Bench artifacts → ratio table.

Usage: python3 tools/scaling.py <base_bench.json> <scaled_bench.json> [ratio_floor]

Prints a markdown table of per-gate wall ratios (scaled/base) sorted
descending, plus totals and a growth-class histogram. ratio_floor
(default 2.5) marks the gates worth classifying by hand in SCALING_r{N}.md
— below it a gate is fixture- or latency-bound at this scale.
"""
import json
import sys

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
floor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.5

bq, sq = base["queries"], scaled["queries"]
common = sorted(set(bq) & set(sq))
missing = sorted(set(bq) ^ set(sq))
if missing:
    print(f"(not in both artifacts, skipped: {', '.join(missing)})\n")

rows = [(k, bq[k], sq[k], sq[k] / bq[k] if bq[k] > 0 else float("inf"))
        for k in common]
rows.sort(key=lambda r: -r[3])

tb, ts = sum(bq[k] for k in common), sum(sq[k] for k in common)
rats = sorted(r[3] for r in rows)
med = rats[len(rats) // 2]
print(f"Total: {tb:.1f}s -> {ts:.1f}s = {ts / tb:.2f}x wall over {len(common)} gates; "
      f"median per-gate ratio {med:.2f}x")
n_small = sum(1 for r in rows if r[3] < floor)
n_mid = sum(1 for r in rows if floor <= r[3] < 5)
n_big = sum(1 for r in rows if r[3] >= 5)
print(f"growth classes: {n_small} < {floor}x | {n_mid} in [{floor},5)x | {n_big} >= 5x\n")
print("| gate | base s | scaled s | ratio |")
print("|---|---|---|---|")
for k, b, s, r in rows:
    if r >= floor:
        print(f"| {k} | {b:.2f} | {s:.2f} | {r:.1f} |")
