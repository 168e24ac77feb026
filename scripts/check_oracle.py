#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs graft.Verify output (parquet per query) against SparkEntry.oracleSql
executed in DuckDB over the same testdata parquet tables, and compares
values column-by-column (columns sorted by name, rows in result order).

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys

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
    sys.exit(main(sys.argv[1], sys.argv[2]))
