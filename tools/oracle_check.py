#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the sfDir tables, sorts columns by name,
and compares values. Dev-side only — NOT part of the library.

Driver parity (round-8 hardening): values are fetched through Arrow
(`rel.arrow()`), the representation the driver's compare goes through — NOT
`fetchall()`. The difference bit round 7: DuckDB `SUM(BIGINT)` returns
HUGEINT (int128); Arrow has no int128 so the value lands as float64 and
hashes `49.0` != `49`, while `fetchall()` yields a Python int and masks the
divergence. Four shipped oracles failed the driver that way after passing
here. Belt-and-braces, every oracle's DESCRIBEd result type must also sit in
a fixed allowlist (no HUGEINT, no DECIMAL) so the hazard is caught even
before a row is compared.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types that survive the driver's Arrow fetch with value identity intact.
# HUGEINT/DECIMAL render as float64 (lossy + hash-divergent) and are BANNED:
# CAST sums back to BIGINT in the oracle SQL.
TYPE_ALLOWLIST = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
                  "DATE", "TIMESTAMP"}


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


def fetch_arrow(rel):
    """Columns + rows through Arrow — the driver's representation."""
    tbl = rel.arrow()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = {s.strip() for s in
            __import__("os").environ.get("SPARK_GRAFT_ONLY", "").split(",")
            if s.strip()}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            bad_types = [
                (cn, ct) for cn, ct, *_ in
                con.execute(f"DESCRIBE {sql}").fetchall()
                if ct not in TYPE_ALLOWLIST]
            if bad_types:
                print(f"FAIL {name}: result types outside allowlist "
                      f"(driver's Arrow fetch mangles them): {bad_types}")
                failures += 1
                continue
            spark_cols, spark_rows = fetch_arrow(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            duck_cols, duck_rows = fetch_arrow(con.execute(sql))
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
