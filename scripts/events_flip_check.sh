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
set -e
cd /root/repo
SF="${1:-/root/testdata/sf0.001}"
shift || true
OUT=/root/repo/target/events_flip
mkdir -p "$OUT"
TO=$(python3 scripts/flip_events.py "$SF" "$OUT/data")
echo "events.parquet ts flipped to timestamp[$TO]; sweeping..."
sbt -batch "runMain graft.Verify $OUT/data $OUT/verify $*" 2>&1 \
  | grep -Ev '^\[info\]|^\[success\]' || true
python3 scripts/diff.py "$OUT/data" "$OUT/verify" "$@"
