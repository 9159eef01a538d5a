#!/usr/bin/env bash
# One-shot correctness gate: exactly what "done" means for a query.
#   tools/gate.sh [sfDir] [outDir]
# Runs graft.Verify into a FRESH output dir, then ALL THREE checkers
# (full-precision DuckDB, driver-replica pandas, oracle type lint),
# then the test suite. Any red => nonzero exit.
set -euo pipefail
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/gate_out}"
cd "$(dirname "$0")/.."

# fresh dir: stale dumps from a previous run must never be validated
rm -rf "$OUT"
LOG="$(mktemp /tmp/gate_verify.XXXXXX.log)"
# capture BOTH streams (sbt routes Spark/System.err through stderr);
# set -e + pipefail propagate a nonzero sbt exit through the tee
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tee "$LOG"
if grep -q "\[verify\] .* failed:" "$LOG"; then
  echo "GATE RED: Verify reported per-query failures (see $LOG)" >&2
  exit 1
fi
python3 tools/check_oracle.py "$SF" "$OUT"
python3 tools/check_driver.py "$SF" "$OUT"
python3 tools/lint_oracle_types.py "$SF" "$OUT"
sbt -batch test
echo "GATE GREEN: all oracles pass all three checkers; suite green."
