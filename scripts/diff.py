#!/usr/bin/env python3
"""Driver-faithful mirror of the t2 correctness gate.

Round-1 lesson: the old version read the Spark parquet back THROUGH DuckDB,
which silently normalized DECIMAL->float64 and erased exactly the
representation differences the driver's pandas-level compare detects
(10 hash-fails + 6 errs shipped as false-green). This version mimics the
driver:

  * Spark side loaded with pandas.read_parquet (no type normalization)
  * oracle side via duckdb .fetchdf()
  * HARD ERROR on any Decimal / ndarray / dict / bytes cell in the dumped
    frame (SURVEY 2.0 rule 8: dumped columns must be BIGINT/INT/DOUBLE/
    VARCHAR/TIMESTAMP/BOOL only)
  * both frames sort_values over all columns (what crashes the driver on
    nested cells), then repr-level cell compare (catches Decimal('5.50')
    vs 5.5 and -0.0 vs 0.0)

Usage: python3 scripts/diff.py [sfDir] [verifyOutDir] [keys...]
       JSON artifact: set DIFF_JSON=<path> to also write a driver-shaped
       per-key correctness map (incl. no_oracle rows for dumped keys
       missing from oracle_sql.json).
"""
import duckdb, json, sys, glob, math
import numpy as np
import pandas as pd
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

import datetime
# NOTE: datetime.date deliberately NOT stable — rule 8 outlaws dumped DATE
# columns (pandas loads them as date objects vs the oracle's datetime64;
# the round-1 driver happened to equate them, but we enforce the stricter
# lint so ops can't rely on that). Cast DATE to TIMESTAMP_NTZ instead.
STABLE_SCALARS = (str, int, float, bool, np.integer, np.floating, np.bool_,
                  pd.Timestamp, type(None), type(pd.NaT))


def unstable_cols(df):
    """Columns whose cells the driver's pandas compare can't hash/sort."""
    bad = {}
    for c in df.columns:
        # Non-object dtypes hold only numpy scalars / Timestamps / NaT —
        # all STABLE_SCALARS by construction; skip the per-cell python
        # loop (it dominated multi-million-row sf1 frames).
        if df[c].dtype.kind in "iufbM":
            continue
        for v in df[c]:
            if isinstance(v, float) and math.isnan(v):
                continue
            if not isinstance(v, STABLE_SCALARS):
                bad[c] = type(v).__name__
                break
    return bad


def frames_equal_fast(osorted, ssorted, cols):
    """Sound vectorized fast path: True only when every column is
    BIT-IDENTICAL between the two sorted frames (same dtype; floats
    compared on their bit patterns, so -0.0 vs 0.0 and NaN-vs-value
    still differ — bit identity implies the faithful repr compare would
    pass). False is NOT a mismatch verdict: callers must fall back to
    the cell-level repr compare, which remains the single source of
    truth for PASS/FAIL. Exists because the faithful per-cell tuple
    build is O(rows·cols) python and took >1 h on a 27.4M-row sf1 frame
    the vectorized path clears in milliseconds."""
    for c in cols:
        a, b = osorted[c], ssorted[c]
        if str(a.dtype) != str(b.dtype) or a.dtype == object:
            return False
        try:
            if a.values.tobytes() != b.values.tobytes():
                return False
        except Exception:
            return False
    return True


def norm_cell(v):
    # Null-ish first (None / NaN / NaT are interchangeable null reprs across
    # fetchdf and read_parquet — the round-1 driver equated them; NaN check
    # must precede .item() or nan != nan).
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return "NULL"
    if isinstance(v, np.generic):
        v = v.item()
    # DATE vs TIMESTAMP midnight are equated (driver-observed: fetchdf gives
    # datetime64 for DATE, read_parquet gives datetime.date — r1 passed).
    if isinstance(v, (pd.Timestamp, datetime.date)):
        return repr(pd.Timestamp(v))
    # repr-level compare: Decimal('5.50') vs 5.5 and -0.0 vs 0.0 both differ.
    return repr(v)


def load_spark(out, name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass, fails = 0, []
    import os
    art = {}
    def rec(name, ok, srows, orows, err):
        art[name] = {"rows_match": ok if err != "no_oracle" else None,
                     "schema_match": ok if err != "no_oracle" else None,
                     "hash_match": ok if err != "no_oracle" else None,
                     "spark_rows": srows, "oracle_rows": orows, "err": err}
    dumped = sorted(d for d in (os.listdir(out) if os.path.isdir(out) else [])
                    if os.path.isdir(f"{out}/{d}"))
    for name in dumped:
        if name in oracle or (only and name not in only):
            continue
        nd = load_spark(out, name)
        rec(name, None, None if nd is None else len(nd), None, "no_oracle")
    import time as _time
    for name in sorted(oracle):
        if only and name not in only:
            continue
        _t0 = _time.time()
        sdf = load_spark(out, name)
        if sdf is None:
            fails.append((name, "NO SPARK OUTPUT (query threw)"))
            rec(name, False, None, None, "no_spark_output")
            continue
        bad = unstable_cols(sdf)
        if bad:
            fails.append((name, f"UNSTABLE OUTPUT TYPES (rule 8): {bad} — "
                          "driver's pandas compare will hash-fail or crash"))
            rec(name, False, len(sdf), None, "unstable_types")
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            fails.append((name, f"ORACLE SQL ERROR: {e}"))
            rec(name, False, len(sdf), None, "oracle_sql_error")
            continue
        if sorted(odf.columns) != sorted(sdf.columns):
            fails.append((name, f"COLUMNS oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}"))
            rec(name, False, len(sdf), len(odf), "columns")
            continue
        if len(odf) != len(sdf):
            fails.append((name, f"ROWS oracle={len(odf)} spark={len(sdf)}"))
            rec(name, False, len(sdf), len(odf), "rows")
            continue
        cols = sorted(odf.columns)
        try:
            osorted = odf[cols].sort_values(cols).reset_index(drop=True)
            ssorted = sdf[cols].sort_values(cols).reset_index(drop=True)
        except Exception as e:
            fails.append((name, f"SORT ERROR (driver would ERR too): {e}"))
            rec(name, False, len(sdf), len(odf), "sort_error")
            continue
        if frames_equal_fast(osorted, ssorted, cols):
            n_pass += 1
            rec(name, True, len(sdf), len(odf), None)
            print(f"PASS {name} ({len(odf)} rows) [{_time.time()-_t0:.1f}s]",
                  flush=True)
            continue
        of = [tuple(norm_cell(osorted[c].iloc[i]) for c in cols)
              for i in range(len(osorted))]
        sfr = [tuple(norm_cell(ssorted[c].iloc[i]) for c in cols)
               for i in range(len(ssorted))]
        if of != sfr:
            badrow = next(i for i in range(len(of)) if of[i] != sfr[i])
            fails.append((name, f"VALUES differ at sorted row {badrow}:\n"
                          f"  cols:   {cols}\n"
                          f"  oracle: {of[badrow]}\n"
                          f"  spark:  {sfr[badrow]}"))
            rec(name, False, len(sdf), len(odf), "values")
            continue
        n_pass += 1
        rec(name, True, len(sdf), len(odf), None)
        print(f"PASS {name} ({len(odf)} rows) [{_time.time()-_t0:.1f}s]", flush=True)
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    jout = os.environ.get("DIFF_JSON")
    if jout:
        json.dump(art, open(jout, "w"), indent=1)
        print(f"wrote {jout} ({len(art)} keys)")
    print(f"\n{n_pass} pass, {len(fails)} fail")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
