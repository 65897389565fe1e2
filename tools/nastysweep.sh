#!/bin/bash
# The un-skippable SURVEY §6(g)/(h) dirty-data gate (VERDICT r8 item 7):
# regenerate all four planted nasty corpora and run the FULL registered
# query surface + DuckDB oracle crosscheck against each — one command,
# nonzero exit on ANY crash or mismatch, so new operators cannot land
# without surviving the corpora that caught three real bugs in round 8.
#
#   tools/nastysweep.sh [nasty_dir] [verify_out_dir]
#
# Corpora (see tools/nastygen.py): docs (empty/CJK/punct/repeat docs),
# ev (null user/ts/props events), star (null-key/orphan-FK star schema),
# emb (zero-norm / NULL / dim-mismatched embeddings).
set -u
NASTY=${1:-/tmp/nasty}
VOUT=${2:-/tmp/verify_nasty}
LOG=${TMPDIR:-/tmp}/nastysweep_verify.log
cd "$(dirname "$0")/.."

python3 tools/nastygen.py "$NASTY" || { echo "nastygen FAILED"; exit 1; }

# one sbt invocation, four full-surface verify dumps (per-query crashes
# are caught inside Verify and printed as "[verify] <q> failed: ...")
sbt -batch \
  "runMain graft.Verify $NASTY/docs $VOUT/docs" \
  "runMain graft.Verify $NASTY/ev $VOUT/ev" \
  "runMain graft.Verify $NASTY/star $VOUT/star" \
  "runMain graft.Verify $NASTY/emb $VOUT/emb" 2>&1 | tee "$LOG"
for c in docs ev star emb; do
  [ -f "$VOUT/$c/oracle_sql.json" ] || {
    echo "verify produced no output for '$c' (sbt failure above?)"; exit 1; }
done
if grep -E "^\[verify\] .* failed" "$LOG"; then
  echo "QUERY CRASHES on nasty corpora (above)"; exit 1
fi

fails=0
for c in docs ev star emb; do
  echo "== crosscheck: $c =="
  python3 tools/crosscheck.py "$NASTY/$c" "$VOUT/$c" || fails=1
done
if [ "$fails" -ne 0 ]; then echo "NASTY SWEEP: FAIL"; else echo "NASTY SWEEP: all green"; fi
exit $fails
