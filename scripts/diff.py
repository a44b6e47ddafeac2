#!/usr/bin/env python3
"""Self-run mirror of the driver's t2 gate: compare Verify's parquet dumps
against the oracle SQL replayed in DuckDB on the same scale factor.

Usage: python3 scripts/diff.py [sfDir] [verifyOutDir] [keys...]
"""
import duckdb, json, sys, glob, math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm_cell(x)) for k, x in v.items())
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return "NaN"
    if isinstance(v, np.generic):
        return v.item()
    return v


def frame(df):
    cols = sorted(df.columns)
    return [tuple(norm_cell(df[c].iloc[i]) for c in cols)
            for i in range(len(df))]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass, fails = 0, []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            fails.append((name, "NO SPARK OUTPUT (query threw)"))
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            fails.append((name, f"ORACLE SQL ERROR: {e}"))
            continue
        sdf = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
        if sorted(odf.columns) != sorted(sdf.columns):
            fails.append((name, f"COLUMNS oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}"))
            continue
        if len(odf) != len(sdf):
            fails.append((name, f"ROWS oracle={len(odf)} spark={len(sdf)}"))
            continue
        of, sfr = frame(odf), frame(sdf)
        if of != sfr:
            bad = next(i for i in range(len(of)) if of[i] != sfr[i])
            fails.append((name, f"VALUES differ at row {bad}:\n  cols:   {sorted(odf.columns)}\n  oracle: {of[bad]}\n  spark:  {sfr[bad]}"))
            continue
        # dtype check (warning only — driver may hash values, but decimals
        # must match scale; surfaced for inspection)
        otypes = {c: str(odf[c].dtype) for c in odf.columns}
        stypes = {c: str(sdf[c].dtype) for c in sdf.columns}
        note = "" if otypes == stypes else f"  [dtype note: oracle={otypes} spark={stypes}]"
        n_pass += 1
        print(f"PASS {name} ({len(odf)} rows){note}")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {len(fails)} fail")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
