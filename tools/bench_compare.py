#!/usr/bin/env python3
"""Compare graft (Spark) headline timings against DuckDB running the
IDENTICAL oracle SQL on the same parquet — the single-node-throughput
check. Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench" | grep metric > /tmp/bench.json
  python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/bench.json
Needs oracle_sql.json from a Verify run (any SF) at /tmp/vout.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, bench_json, oracle_json="/tmp/vout/oracle_sql.json"):
    # bench output is emitted verbatim (run / outputStrategy := StdoutOutput)
    bench = json.load(open(bench_json))
    oracle = json.load(open(oracle_json))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # scaled dirs are Spark-written parquet DIRECTORIES (scale_evidence's rule)
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"create view {t} as select * from read_parquet({src})")
    rows = []
    for name, spark_s in sorted(bench["queries"].items()):
        sql = oracle.get(name)
        if not sql:
            rows.append((name, spark_s, None))
            continue
        best = None
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        rows.append((name, spark_s, best))
    print(f"| query | spark s | duckdb s | ratio |")
    print(f"|---|---|---|---|")
    tot_s = tot_d = 0.0
    for name, s, dd in rows:
        if dd is None:
            print(f"| {name} | {s:.2f} | n/a | n/a |")
        else:
            tot_s += s
            tot_d += dd
            print(f"| {name} | {s:.2f} | {dd:.2f} | {s / dd:.1f}x |")
    print(f"| **total** | **{tot_s:.2f}** | **{tot_d:.2f}** | **{tot_s / tot_d:.1f}x** |")


if __name__ == "__main__":
    main(*sys.argv[1:])
