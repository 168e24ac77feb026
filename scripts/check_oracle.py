#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs graft.Verify output (parquet per query) against SparkEntry.oracleSql
executed in DuckDB over the same testdata parquet tables, and compares
values column-by-column (columns sorted by name, rows in result order).

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>
       python3 scripts/check_oracle.py            (bare: summarize the
       newest committed CORRECTNESS_r*.json instead of re-running DuckDB)
"""
import glob
import json
import math
import os
import re
import sys


def summarize_committed() -> int:
    """Bare-invocation fallback: report the newest CORRECTNESS_r*.json."""
    arts = glob.glob("CORRECTNESS_r*.json")
    if not arts:
        print(__doc__)
        print("no CORRECTNESS_r*.json found; run with <verify_out_dir> <sf_dir>")
        return 1
    path = max(arts, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    data = json.load(open(path))
    rows = data.get("queries", data)
    n_ok = n_bad = 0
    for name, r in sorted(rows.items()):
        ok = isinstance(r, dict) and not r.get("err") and \
            all(r.get(k) in (True, None) for k in ("rows_match", "schema_match",
                                                   "hash_match"))
        if ok:
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: {r}")
    print(f"{os.path.basename(path)}: {n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return repr(v)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        if not status:
            g = [tuple(canon(v) for v in r) for r in got.itertuples(index=False)]
            w = [tuple(canon(v) for v in r) for r in want.itertuples(index=False)]
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
            if diffs:
                i, a, b = diffs[0]
                status.append(f"{len(diffs)} value diffs; first at row {i}: {a} != {b}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(summarize_committed())
    sys.exit(main(sys.argv[1], sys.argv[2]))
