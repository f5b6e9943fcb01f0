#!/usr/bin/env bash
# The mandatory pre-snapshot gate (r5/r6 verdicts: two rounds shipped
# ungated; this script IS the last step before any end-of-round commit).
#
# Runs, in order, appending to GATE_r07.log with timestamps + HEAD:
#   1. sbt test              (all ScalaTest suites)
#   2. graft.Verify          (full registry -> parquet + oracle_sql.json, sf0.01)
#   3. tools/check.py        (DuckDB oracle compare, driver-parity)
#   4. graft.PlanAudit       (registry-wide plan linter)
#   5. graft.Bench           (sf0.1, local[32] -> one JSON line)
#
# Exit nonzero on ANY red step. Usage: tools/gate.sh [round-tag]
set -o pipefail
cd "$(dirname "$0")/.."
TAG="${1:-r07}"
LOG="GATE_${TAG}.log"
OUT=/tmp/gate_verify_out
HEADLINE="$(git rev-parse --short HEAD) ($(git diff --stat HEAD | tail -1 | sed 's/^ *//'))"
{
  echo "=== GATE ${TAG} — started $(date -u '+%F %T') UTC (HEAD ${HEADLINE:-clean}) ==="
  echo "--- sbt test ---"
} >> "$LOG"
sbt -batch test > /tmp/gate_sbt_test.log 2>&1
RC=$?
grep -E "Tests:|All tests passed|TESTS FAILED" /tmp/gate_sbt_test.log | tail -3 >> "$LOG"
if [ $RC -ne 0 ]; then echo "GATE RED: sbt test rc=$RC" | tee -a "$LOG"; exit 1; fi

echo "--- Verify (full registry, sf0.01) ---" >> "$LOG"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" > /tmp/gate_verify.log 2>&1
RC=$?
tail -1 /tmp/gate_verify.log >> "$LOG"
if [ $RC -ne 0 ]; then echo "GATE RED: Verify rc=$RC" | tee -a "$LOG"; exit 1; fi

echo "--- check.py ---" >> "$LOG"
python3 tools/check.py /root/testdata/sf0.01 $OUT 120 > /tmp/gate_check.log 2>&1
RC=$?
# Name every non-PASS row in the gate log (r9 verdict item 1: a skip
# without a name is undiagnosable after the fact).
grep -E "^(SKIP|FAIL)" /tmp/gate_check.log >> "$LOG"
tail -3 /tmp/gate_check.log >> "$LOG"
if [ $RC -ne 0 ] || ! grep -qE "^[0-9]+/[0-9]+ pass" /tmp/gate_check.log || \
   grep -qE "FAIL|MISMATCH" /tmp/gate_check.log; then
  echo "GATE RED: check.py (see /tmp/gate_check.log)" | tee -a "$LOG"; exit 1
fi

echo "--- PlanAudit ---" >> "$LOG"
sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.01" > /tmp/gate_audit.log 2>&1
RC=$?
grep -E "audit:" /tmp/gate_audit.log | tail -1 >> "$LOG"
tail -1 /tmp/gate_audit.log >> "$LOG"
if [ $RC -ne 0 ] || ! grep -qE "audit: 0 flagged" /tmp/gate_audit.log; then
  echo "GATE RED: PlanAudit rc=$RC" | tee -a "$LOG"; exit 1
fi

echo "--- Bench (sf0.1) ---" >> "$LOG"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/gate_bench.log 2>&1
RC=$?
grep -E '\{"metric"' /tmp/gate_bench.log | tail -1 >> "$LOG"
tail -1 /tmp/gate_bench.log >> "$LOG"
if [ $RC -ne 0 ]; then echo "GATE RED: Bench rc=$RC" | tee -a "$LOG"; exit 1; fi

echo "=== GATE ${TAG} — finished $(date -u '+%F %T') UTC — ALL GREEN ===" >> "$LOG"
echo "GATE GREEN"
