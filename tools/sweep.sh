#!/bin/bash
# Multi-SF correctness sweep: graft.Verify + the DuckDB t2 replica at
# each SF. Boundary-class bugs are SF-dependent (round 8 caught two at
# sf0.1 that sf0.01 could never show) — run this at least once per
# round. Usage: tools/sweep.sh [sf0.01 sf0.1 ...]   (defaults to both)
set -euo pipefail
cd "$(dirname "$0")/.."
SFS=("${@:-sf0.01 sf0.1}")
[ $# -eq 0 ] && SFS=(sf0.01 sf0.1)
for sf in "${SFS[@]}"; do
  out="/tmp/vout_sweep_$sf"
  echo "== $sf: Verify =="
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" 2>&1 \
    | grep -E '\[verify\] TOTAL'
  echo "== $sf: DuckDB value compare =="
  python3 tools/oracle_check.py "$out" "/root/testdata/$sf" \
    | grep -Ev '^PASS' || true
  if [ "$sf" = "sf0.1" ]; then
    echo "== $sf: per-entry wall-time budget gate =="
    python3 tools/check_budgets.py "$out"
  fi
done
