#!/bin/sh
# Standing per-round gate (VERDICT r4 next-round #7): every driver-gated
# query vs its DuckDB oracle at the gate scale AND 10x, plus the
# streaming-vs-batch dedup equivalence replay.  Optionally set
# SPARK_GRAFT_MASTER=local-cluster[4,8,4096] to run on separate
# executor JVMs.  Results recorded in CORRECTNESS_SWEEP_r{N}.md.
set -e
cd "$(dirname "$0")/.."
echo "== sf0.01 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python3 scripts/check_correctness.py
echo "== sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 scripts/check_correctness.py
echo "== streaming equivalence (sf0.01) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python3 scripts/check_streaming_equivalence.py
