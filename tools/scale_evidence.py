#!/usr/bin/env python3
"""Scale-up evidence for the small TPC-H queries: time DuckDB on the base
SF dir and on a ScaleData-generated N-times dir, and combine with the two
graft.Bench JSON lines into a markdown table showing how the spark:duckdb
ratio collapses as the per-job constant amortizes.

Usage: python3 tools/scale_evidence.py <baseDir> <scaledDir> \
         <bench_base.json> <bench_scaled.json> [oracle_sql.json]
"""
import glob
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # ScaleData writes directory-parquet; driver testdata is one file
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"create view {t} as select * from read_parquet({src})")
    return con


def time_duck(con, sql, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        con.execute(sql).fetchall()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def main(base_dir, scaled_dir, bench_base, bench_scaled,
         oracle_json="/tmp/vout/oracle_sql.json"):
    b0 = json.load(open(bench_base))["queries"]
    b1 = json.load(open(bench_scaled))["queries"]
    oracle = json.load(open(oracle_json))
    con0, con1 = connect(base_dir), connect(scaled_dir)
    print("| query | spark 1x | spark 8x | growth | duckdb 1x | duckdb 8x "
          "| growth | ratio 1x | ratio 8x |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name in sorted(b0):
        sql = oracle[name]
        d0, d1 = time_duck(con0, sql), time_duck(con1, sql)
        s0, s1 = b0[name], b1[name]
        print(f"| {name} | {s0:.2f} | {s1:.2f} | {s1 / s0:.2f}x "
              f"| {d0:.2f} | {d1:.2f} | {d1 / d0:.2f}x "
              f"| {s0 / d0:.1f}x | {s1 / d1:.1f}x |")


if __name__ == "__main__":
    main(*sys.argv[1:])
