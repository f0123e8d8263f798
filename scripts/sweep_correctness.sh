#!/bin/sh
# Two-SF oracle sweep (VERDICT r3 item 7): the 25 driver-gated queries
# vs their DuckDB oracles at the gate scale AND 10x.  Optionally set
# SPARK_GRAFT_MASTER=local-cluster[4,8,4096] to run on separate
# executor JVMs.  Results recorded in CORRECTNESS_SWEEP_r04.md.
set -e
cd "$(dirname "$0")/.."
echo "== sf0.01 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python3 scripts/check_correctness.py
echo "== sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 scripts/check_correctness.py
