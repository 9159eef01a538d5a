#!/usr/bin/env bash
# One-shot correctness gate: exactly what "done" means for a query.
#   tools/gate.sh [sfDir] [outDir] [-- extra Verify env]
# Runs graft.Verify, then ALL THREE checkers (full-precision DuckDB,
# driver-replica pandas, oracle type lint), then the test suite.
# Any red => nonzero exit.
set -euo pipefail
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/gate_out}"
cd "$(dirname "$0")/.."

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF $OUT" | grep "failed:" && exit 1 || true
python3 tools/check_oracle.py "$SF" "$OUT"
python3 tools/check_driver.py "$SF" "$OUT"
python3 tools/lint_oracle_types.py "$SF" "$OUT"
sbt -batch test
echo "GATE GREEN: all oracles pass all three checkers; suite green."
