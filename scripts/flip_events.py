#!/usr/bin/env python3
"""Build a copy of an sf dir whose events.parquet ts physical type is
FLIPPED (timestamp[us] <-> timestamp[ns]).

The driver has shipped events.parquet with BOTH physical types across
rounds (SURVEY.md 1.4: timestamp[ns] needs nanosAsLong and integer
division; timestamp[us] reads natively). Tables.events / the oracle's
CAST(ts AS TIMESTAMP) are built to handle either adaptively -- this
script manufactures the *other* format so scripts/events_flip_check.sh
can prove the whole sweep is flip-proof BEFORE the driver flips again.

Usage: flip_events.py <sfDir> <outDir>
Prints the flipped-to unit on stdout ("ns" or "us").
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    sf, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    for name in os.listdir(sf):
        if not name.endswith(".parquet"):
            continue
        dst = os.path.join(out, name)
        if os.path.lexists(dst):
            os.remove(dst)
        if name != "events.parquet":
            # Untouched tables are shared by symlink -- the check is about
            # the events physical type, not a full-copy exercise.
            os.symlink(os.path.join(sf, name), dst)
    t = pq.read_table(os.path.join(sf, "events.parquet"))
    unit = t.schema.field("ts").type.unit
    to = "ns" if unit == "us" else "us"
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts",
        t.column("ts").cast(pa.timestamp(to)))
    # version=2.6 is required for the parquet nanos logical type; exact
    # for the us->ns direction, and ns->us is exact too (the generator
    # only ever produced microsecond-resolution instants).
    pq.write_table(t, os.path.join(out, "events.parquet"), version="2.6")
    print(to)


if __name__ == "__main__":
    main()
