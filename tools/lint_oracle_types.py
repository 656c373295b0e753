#!/usr/bin/env python3
"""Lint oracle-SQL output types against the driver's hash-compare semantics.

Defect class (hit twice: q387 round 8, q399 round 9): DuckDB silently
promotes sum()/arithmetic on BIGINT to HUGEINT (int128); pandas renders
HUGEINT as float64, so the driver's exact value hash diverges from Spark's
long even when every value is identical. Same risk for DECIMAL outputs that
the Spark side surfaces as long/double.

For every oracle SQL: run `DESCRIBE <sql>` in DuckDB over the sf tables and
 - HARD-flag any output column typed HUGEINT/UHUGEINT (always a bug),
 - flag DECIMAL output columns whose matching Spark parquet column (when the
   verify dump is present) is NOT decimal — integer/double on the Spark side
   hashes differently from an un-CAST DuckDB decimal.

Usage: python3 tools/lint_oracle_types.py <sfDir> <verifyOutDir>
  (verifyOutDir must contain oracle_sql.json from graft.Verify; per-query
   parquet dirs are optional and only sharpen the DECIMAL check)
Dev tool only — not part of the Scala library.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq


def type_class(t: str) -> str:
    t = t.upper()
    if "HUGEINT" in t:
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
             "INT8", "INT16", "INT32", "INT64"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL", "HALF_FLOAT"):
        return "float"
    return "other"


def spark_type_classes(result_dir: str) -> dict:
    """column -> type class from the Verify parquet dump (empty if absent)."""
    files = glob.glob(os.path.join(result_dir, "*.parquet"))
    if not files:
        return {}
    schema = pq.read_schema(files[0])
    out = {}
    for field in schema:
        t = str(field.type)
        if t.startswith("decimal"):
            out[field.name] = "decimal"
        elif t in ("int8", "int16", "int32", "int64",
                   "uint8", "uint16", "uint32", "uint64"):
            out[field.name] = "int"
        elif t in ("float", "double", "halffloat", "float32", "float64"):
            out[field.name] = "float"
        else:
            out[field.name] = "other"
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_flag = n_err = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"  {name:40s} DESCRIBE_ERROR: {str(e).splitlines()[0][:160]}")
            n_err += 1
            continue
        spark_classes = spark_type_classes(os.path.join(out_dir, name))
        for col, duck_type, *_ in desc:
            cls = type_class(duck_type)
            if cls == "hugeint":
                print(f"  {name:40s} HUGEINT output column `{col}` — "
                      f"CAST it (pandas renders int128 as float64; hash diverges)")
                n_flag += 1
            elif cls == "decimal":
                sp = spark_classes.get(col)
                if sp is not None and sp != "decimal":
                    print(f"  {name:40s} DECIMAL `{col}` ({duck_type}) vs Spark "
                          f"{sp} — CAST the oracle column to match")
                    n_flag += 1
                elif sp is None:
                    # no dump to cross-check: surface as info, not a flag
                    print(f"  {name:40s} note: DECIMAL `{col}` ({duck_type}), "
                          f"no Spark dump to cross-check")
    print(f"\nlint: flags={n_flag} describe_errors={n_err} "
          f"queries={len(oracle)}")
    return 1 if (n_flag or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
