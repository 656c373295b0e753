#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir in verifyOutDir: load the Spark parquet result, run the
matching oracle SQL (oracle_sql.json) in DuckDB over the fixture tables,
sort columns by name + rows by all columns, and compare values.
Dev tool only — not part of the Scala library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # decimals -> float, remaining objects -> str, for engine-neutral compare
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(float)
            except (ValueError, TypeError):
                df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = "ROWS_ONLY" + (" (EMPTY!)" if len(got) == 0 else f" rows={len(got)}")
            n_rowsonly += 1
            print(f"  {name:35s} {status}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  {name:35s} ORACLE_SQL_ERROR: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"  {name:35s} COLS_MISMATCH got={list(g.columns)} exp={list(e.columns)}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"  {name:35s} ROWCOUNT got={len(g)} exp={len(e)}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9)
                print(f"  {name:35s} OK rows={len(g)}")
                n_pass += 1
            except AssertionError as ex:
                print(f"  {name:35s} VALUES_MISMATCH: {str(ex).splitlines()[-1][:200]}")
                n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
