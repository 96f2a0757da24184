#!/usr/bin/env bash
# Capped-verify lane (r13 verdict #3, the q145 lesson generalized):
# re-verify every gated/salt-capped query at sf0.1 with the caps
# FORCED TO BIND via conf, so the DuckDB oracle replays the capped
# regime literally — the sf0.01 gate alone cannot see a recall change
# that only binds above a cap (q145's undercount shipped green for a
# round that way).
#
#  - spark.graft.nsw.blockCap=32: sf0.1 cells run ~60-250 assignments,
#    so 32 salts every populated cell (the default 256 only binds at
#    sf1+). The oracle generators receive the SAME session value.
#  - spark.graft.neardup.exactMaxRows=500: sf0.1 embeddings (2000
#    rows) reroute q29/q79 to the cell-bounded candidate path; the
#    exact-pair oracle then CHECKS the full-recall-on-clustered-corpora
#    contract at a binding scale instead of assuming it.
#
# Part of the round close gates (PLANS.md). The gate FAILS unless every
# capped query dumped AND matched: a query that crashes under the
# forced confs leaves no parquet dir, check_oracle skips what does not
# exist, and a "9 ok" line must never read as green for a 10-query
# lane (r14 review finding) — so sbt's exit status is checked and the
# ok-count is asserted against EXPECTED.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/verify_capped}
EXPECTED=12   # keep in lockstep with SparkEntry.cappedQueries
rm -rf "$OUT"
LOG="$OUT.sbt.log"
if ! SPARK_GRAFT_CONF="spark.graft.nsw.blockCap=32,spark.graft.neardup.exactMaxRows=500" \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT @capped" \
    > "$LOG" 2>&1; then
  echo "capped-verify: sbt/Verify run FAILED" >&2
  tail -40 "$LOG" >&2
  exit 1
fi
grep '\[verify\]' "$LOG" || true
if grep -q '\[verify\].*failed' "$LOG"; then
  echo "capped-verify: a query failed under the forced caps" >&2
  exit 1
fi
RESULT=$(python3 scripts/check_oracle.py /root/testdata/sf0.1 "$OUT")
echo "$RESULT"
echo "$RESULT" | grep -q "== $EXPECTED ok, 0 bad ==" || {
  echo "capped-verify: expected '$EXPECTED ok, 0 bad', gate FAILED" >&2
  exit 1
}
