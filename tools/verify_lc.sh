#!/usr/bin/env bash
# One-command repeatable local-cluster correctness leg (round-15 verdict
# item 5): run the FULL gate with separate executor JVMs and stamp the
# per-query result into VERIFY_LC.json at the repo root, so the next
# broadcast/serialization regression is caught by a diff, not by memory.
#
# Usage: tools/verify_lc.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT=/tmp/verify_lc_out
rm -rf "$OUT"
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,16,8192]' \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/verify_local.py "$SF" "$OUT" VERIFY_LC.json
