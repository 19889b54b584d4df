#!/usr/bin/env bash
# The pre-round-end local gate (VERDICT r3 "missing" #1): every declared
# query oracle-compared against DuckDB at sf0.01 + the full ScalaTest suite.
# Any FAILING row or failed test is a stop-ship.
#
# Usage: tools/local_gate.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft-gate.XXXXXX)"

echo "== graft local gate: verify+oracle at $SF =="
sbt -batch "runMain graft.Verify $SF $OUT" > "$OUT/verify.log" 2>&1 \
  || { tail -20 "$OUT/verify.log"; exit 1; }
if grep "\[verify\]" "$OUT/verify.log"; then
  echo "STOP-SHIP: queries failed to dump (above)"; exit 1
fi
python3 tools/compare.py "$SF" "$OUT" | tee "$OUT/compare.out"
if ! tail -1 "$OUT/compare.out" | grep -q " 0 FAILING"; then
  echo "STOP-SHIP: oracle mismatches (see above)"; exit 1
fi

echo "== graft local gate: sbt test =="
sbt -batch test > "$OUT/test.log" 2>&1 \
  || { grep -E "FAILED|\*\*\*" "$OUT/test.log" | tail -20; exit 1; }
grep -E "Tests: succeeded" "$OUT/test.log" | tail -1

echo "== gate PASSED (artifacts in $OUT) =="
