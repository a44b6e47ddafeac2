#!/bin/bash
# Run Verify at a scale factor, then diff against the DuckDB oracle —
# mirrors the driver's t2 gate. Usage: scripts/verify_diff.sh [sfDir] [keys...]
set -e
cd /root/repo
SF="${1:-/root/testdata/sf0.01}"
shift || true
OUT=/root/repo/target/verify_out
sbt -batch "runMain graft.Verify $SF $OUT $*" 2>&1 | grep -Ev '^\[info\]|^\[success\]' || true
python3 scripts/diff.py "$SF" "$OUT" "$@"
