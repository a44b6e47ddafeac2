#!/bin/bash
# Events fixture type-flip drill (round-11 verdict item 8): the driver has
# shipped events.parquet as BOTH timestamp[ns] and timestamp[us] across
# rounds (SURVEY.md 1.4). This one command re-runs the oracle sweep against
# a copy of the sf dir whose events ts physical type is FLIPPED to whatever
# the current fixture is NOT, proving the adaptive readers (Tables.events,
# StreamOps.eventStream) keep every key green under the next flip.
#
# Usage: scripts/events_flip_check.sh [sfDir] [keys...]
#   default sfDir: /root/testdata/sf0.001 (full sweep ~3 min)
#
# Round-12 advice hardening: pipefail (a crashed sbt Verify must fail the
# drill, not read as a pass because grep's status masked it), grep's
# no-match status 1 tolerated explicitly, and a completeness gate that
# every requested key actually produced a verify parquet before diff.py
# adjudicates — a partial sweep can no longer be mistaken for flip-proof.
set -eo pipefail
cd /root/repo
SF="${1:-/root/testdata/sf0.001}"
shift || true
OUT=/root/repo/target/events_flip
mkdir -p "$OUT"
TO=$(python3 scripts/flip_events.py "$SF" "$OUT/data")
echo "events.parquet ts flipped to timestamp[$TO]; sweeping..."
rm -rf "$OUT/verify"
sbt -batch "runMain graft.Verify $OUT/data $OUT/verify $*" 2>&1 \
  | { grep -Ev '^\[info\]|^\[success\]' || [ $? -eq 1 ]; }
# Completeness gate: Verify must have produced output for every requested
# key (or, with no key filter, for every key it declared in oracle_sql.json
# plus the non-oracle ones — approximate by requiring a non-empty dir).
if [ "$#" -gt 0 ]; then
  missing=0
  for k in "$@"; do
    if [ ! -e "$OUT/verify/$k.parquet" ] && [ ! -d "$OUT/verify/$k.parquet" ]; then
      echo "MISSING verify output for key: $k" >&2
      missing=1
    fi
  done
  [ "$missing" -eq 0 ] || { echo "flip drill INCOMPLETE — aborting before diff" >&2; exit 2; }
else
  [ -n "$(ls -A "$OUT/verify" 2>/dev/null)" ] \
    || { echo "flip drill produced no verify output — aborting" >&2; exit 2; }
fi
python3 scripts/diff.py "$OUT/data" "$OUT/verify" "$@"
