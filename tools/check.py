#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
  <outDir> must already contain Verify.scala output
  (one parquet dir per query + oracle_sql.json).

For each query: run the oracle SQL in DuckDB over views named after the
parquet tables, read the Spark result parquet, sort columns by name,
sort rows, compare cell-by-cell (exact; floats must match bit-for-bit —
that is the design contract of the queries).
"""
import json
import sys
import glob
import math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        got = pq.read_table(files[0])
        wcols = sorted(want.column_names)
        gcols = sorted(got.column_names)
        if wcols != gcols:
            print(f"SCHEMA   {name}: duckdb={wcols} spark={gcols}")
            n_fail += 1
            continue
        wrows = sorted([tuple(norm(r[c]) for c in wcols) for r in want.to_pylist()],
                       key=lambda r: tuple(str(x) for x in r))
        grows = sorted([tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()],
                       key=lambda r: tuple(str(x) for x in r))
        if len(wrows) != len(grows):
            print(f"ROWCOUNT {name}: duckdb={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        bad = None
        for i, (w, g) in enumerate(zip(wrows, grows)):
            if w != g:
                bad = (i, w, g)
                break
        if bad:
            i, w, g = bad
            print(f"VALUES   {name}: first diff row {i}\n  duckdb={w}\n  spark ={g}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(wrows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
