#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the parquet written
by graft.Verify. Strict: sorted columns, sorted rows, exact values (floats
must be bit-identical; tiny-ulp diffs are reported, not forgiven).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [artifact.json]

With the optional third arg, writes a machine-diffable artifact:
{"master": ..., "sf_dir": ..., "ok": N, "fail": N, "skipped": N,
 "queries": {name: "ok"|"FAIL: ..."}} — the repeatable-leg stamp the
local-cluster run commits as VERIFY_LC.json (round-15 verdict item 5).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def main(sf_dir, out_dir, artifact=None):
    statuses = {}
    con = duckdb.connect()
    # deep-dial runs (-Dgraft.bpe.rounds=256) unroll one CTE per merge
    # round; DuckDB's default parser depth guard (1000) trips on the
    # t15/t18 oracles' 256-round chains. The driver's gate runs at the
    # default 12 rounds and never needs this.
    con.execute("SET max_expression_depth TO 10000")
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify exits 0 even when queries throw (the driver must keep comparing
    # the rest) and records the casualties in _errors.json — a crashed query
    # dumps no directory, so without reading it a crash would pass silently
    # as "undumped (skipped)": the exact round-7 failure mode this gate
    # exists to prevent. Crashes are FAILs here.
    errors = {}
    err_path = f"{out_dir}/_errors.json"
    if os.path.exists(err_path):
        errors = json.load(open(err_path))
    n_ok = n_bad = n_skip = 0
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: query threw in Verify: {msg}")
        statuses[name] = f"FAIL: threw in Verify: {msg}"
        n_bad += 1
    for name, sql in sorted(oracle.items()):
        if name in errors:
            continue  # already counted as FAIL above
        # a filtered Verify run (extra args) dumps a subset; compare only
        # what was dumped instead of flooding FAILs for the rest
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got = con.execute(
                f"select * from read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols, g_rows = canon(got.fetchall(), [d[0] for d in got.description])
            want = con.execute(sql)
            w_cols, w_rows = canon(want.fetchall(), [d[0] for d in want.description])
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            statuses[name] = f"FAIL: exception {e}"
            n_bad += 1
            continue
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} vs oracle {w_cols}")
            statuses[name] = "FAIL: column mismatch"
            n_bad += 1
        elif len(g_rows) != len(w_rows):
            print(f"FAIL {name}: {len(g_rows)} rows vs oracle {len(w_rows)}")
            statuses[name] = f"FAIL: {len(g_rows)} rows vs oracle {len(w_rows)}"
            n_bad += 1
        elif g_rows != w_rows:
            bad = [(a, b) for a, b in zip(g_rows, w_rows) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(g_rows)} differing rows; "
                  f"first: got={bad[0][0]} want={bad[0][1]}")
            statuses[name] = f"FAIL: {len(bad)}/{len(g_rows)} differing rows"
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g_rows)} rows)")
            statuses[name] = "ok"
            n_ok += 1
    skipped = f", {n_skip} undumped (skipped)" if n_skip else ""
    print(f"== {n_ok} ok, {n_bad} fail{skipped}")
    if artifact:
        run_meta = {}
        run_path = f"{out_dir}/_run.json"
        if os.path.exists(run_path):
            run_meta = json.load(open(run_path))
        with open(artifact, "w") as f:
            json.dump({"master": run_meta.get("master", "unknown"),
                       "sf_dir": sf_dir, "ok": n_ok, "fail": n_bad,
                       "skipped": n_skip, "queries": statuses}, f, indent=1,
                      sort_keys=True)
        print(f"wrote {artifact}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
