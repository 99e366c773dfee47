#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the sfDir tables, sorts columns by name,
and compares values. Dev-side only — NOT part of the library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:  # decimal -> float for loose compare
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c[0] for c in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            duck_cols = [c[0] for c in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            failures += 1
            continue
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = [tuple(norm(r[i]) for i in s_ix) for r in spark_rows]
        d = [tuple(norm(r[i]) for i in d_ix) for r in duck_rows]
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        if s != d:
            # row-order-insensitive fallback + first diff report
            if sorted(map(repr, s)) == sorted(map(repr, d)):
                print(f"WARN {name}: values match but row ORDER differs")
                failures += 1
                continue
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b)
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(s)} rows")
    print(f"== {len(oracle) - failures}/{len(oracle)} queries match ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
