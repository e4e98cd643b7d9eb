#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs every oracle in DuckDB against views named after the
parquet tables in <sf_dir>, and compares values with columns sorted by
name and rows sorted by all columns. Reports per-query match/mismatch.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: datetimes → iso strings, floats → round-trip repr
    # strings. The repr form matches the DRIVER's semantics (it hashes
    # bytes): repr distinguishes -0.0 from 0.0, which pandas' float
    # equality does not — r9 shipped q153 hash-red while this script's
    # old value-compare said green.
    out = {}
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime"):
            s = s.astype(str)
        elif str(s.dtype) in ("float32", "float64"):
            s = s.map(lambda v: v if pd.isna(v) else repr(float(v)))
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    names_seen = []
    for name in sorted(os.listdir(outdir)):
        rdir = os.path.join(outdir, name)
        if not os.path.isdir(rdir):
            continue
        names_seen.append(name)
        files = glob.glob(os.path.join(rdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_bad += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            status = "ROWS" if len(got) > 0 else "EMPTY!"
            print(f"{status:6s} {name}: rows={len(got)} (no oracle)")
            if len(got) == 0: n_bad += 1
            else: n_ok += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        g, e_ = canon(got), canon(exp)
        if list(g.columns) != list(e_.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e_.columns)}")
            n_bad += 1; continue
        if len(g) != len(e_):
            print(f"FAIL {name}: rows {len(g)} vs {len(e_)}"); n_bad += 1; continue
        if not g.equals(e_):
            neq = (g != e_) & ~(g.isna() & e_.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"   [{c}] row {idx}: got={g[c][idx]!r} exp={e_[c][idx]!r}")
            n_bad += 1; continue
        print(f"OK     {name}: rows={len(g)}")
        n_ok += 1
    # README staleness gate (round-7 verdict: shipped "141 queries" with
    # 144 gates and an EMPTY generated-bench block). Enforced only on a
    # FULL verify run (subset dev-loop runs have fewer results than
    # oracles and skip it): the claimed count and the generated bench
    # block's count must both equal the live registry size.
    if n_ok + n_bad >= len(oracles):
        import re
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        readme = open(os.path.join(root, "README.md")).read()
        n_reg = n_ok + n_bad
        m = re.search(r"Current gate: \*\*(\d+) queries", readme)
        if not m or int(m.group(1)) != n_reg:
            print(f"FAIL README: claims {m and m.group(1)} gate queries, registry has {n_reg}")
            n_bad += 1
        block = re.search(r"<!-- BENCH:BEGIN[^\n]*\n(.*?)<!-- BENCH:END -->",
                          readme, re.S)
        body = block.group(1).strip() if block else ""
        bm = re.search(r"over the (\d+) registered", body)
        # Source of truth for the BENCH block's gate count is the bench
        # artifact's TIMED-query count (same rule as ReadmeSpec); when a
        # gate errors during bench the block truthfully says fewer than
        # the registry and we warn instead of demanding the impossible.
        bench_path = os.path.join(root, "bench_out.json")
        n_truth = n_reg
        bench_timed, bench_errors = set(), {}
        if os.path.exists(bench_path):
            try:
                bench = json.load(open(bench_path))
                bench_timed = set(bench.get("queries", {}))
                bench_errors = bench.get("errors", {}) or {}
                n_truth = len(bench_timed)
            except Exception:
                pass
        if n_truth < n_reg:
            # A smaller artifact is only legitimate when the artifact
            # itself NAMES the gates that errored during bench; otherwise
            # it predates registry growth and a matching BENCH block is
            # stale, not truthful (round-7 stale-README class).
            missing = sorted(set(names_seen) - bench_timed)
            unexplained = [n for n in missing if n not in bench_errors]
            if unexplained:
                print(f"FAIL README: bench artifact timed {n_truth} of {n_reg} registered gates and does not name {unexplained[:5]}{'...' if len(unexplained) > 5 else ''} in its errors field — stale artifact, rerun bench")
                n_bad += 1
            else:
                print(f"WARN README: bench artifact timed {n_truth} of {n_reg} registered gates — the artifact's errors field names the missing gates")
        if not body:
            print("FAIL README: BENCH block empty — run tools/readme_bench.py")
            n_bad += 1
        elif not bm or int(bm.group(1)) != n_truth:
            print(f"FAIL README: BENCH block covers {bm and bm.group(1)} gates, bench artifact timed {n_truth} — rerun bench + tools/readme_bench.py")
            n_bad += 1
        # Correctness-claim gate (round-9 verdict: README said "all green"
        # while the shipped driver artifact had q153 hash-red). The claim
        # must be checked against the NEWEST driver correctness artifact:
        # every red row there must be named in the README, or the claim
        # is an overclaim and this check fails.
        cfiles = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
        if cfiles and "all green" in readme:
            rows = json.load(open(cfiles[-1]))
            red = sorted(n for n, r in rows.items()
                         if not (r.get("rows_match") and r.get("schema_match")
                                 and r.get("hash_match")) or r.get("err"))
            unacknowledged = [n for n in red if n not in readme]
            if unacknowledged:
                print(f"FAIL README: claims 'all green' but {os.path.basename(cfiles[-1])} has red rows not acknowledged in the README: {unacknowledged}")
                n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
