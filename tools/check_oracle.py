#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

For each query result parquet in <verify_outdir>/<name>/, runs the oracle SQL
from <verify_outdir>/oracle_sql.json in DuckDB (tables = <sfdir>/*.parquet
registered as views by basename), sorts columns by name, sorts rows, and
compares values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO_RESULT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}" + (" (EMPTY!)" if len(spark_df) == 0 else "")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
            continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.fillna("__NULL__") == bv.fillna("__NULL__")) if av.dtype == object \
                    else ((av == bv) | (av.isna() & bv.isna()))
            except Exception:
                eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                mismatch = f"VALUE_MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r} ({int((~eq).sum())} diffs)"
                break
        results[name] = mismatch or f"OK rows={len(a)}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(f"{'PASS' if v.startswith('OK') or v.startswith('ROWS_ONLY rows=') and 'EMPTY' not in v else 'FAIL'}  {k}: {v}")
    print(f"\n{ok}/{len([k for k in results if k in oracle])} oracle-checked OK; {len(results)} total")

if __name__ == "__main__":
    main()
