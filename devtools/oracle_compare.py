#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: oracle_compare.py <sfDir> <verifyOutDir> [query ...]
Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over the
parquet tables in <sfDir>, and compares against the Spark parquet dump in
<verifyOutDir>/<name>/ — rows, column names (sorted), and values.
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    # relational API, not SQL interpolation: a quote in sfdir must not
    # break (or inject into) the view definition (CREATE VIEW cannot be
    # a prepared statement, so ? binding is unavailable here)
    con.read_parquet(f"{sfdir}/{t}.parquet").create_view(t)

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    try:
        o = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}"); fail += 1; continue
    s = duckdb.connect().execute(
        "SELECT * FROM read_parquet(?)", [files]).fetch_arrow_table()
    ocols, scols = sorted(o.column_names), sorted(s.column_names)
    if ocols != scols:
        print(f"{name}: SCHEMA MISMATCH oracle={ocols} spark={scols}"); fail += 1; continue
    orows = [[norm(r[c]) for c in ocols] for r in o.to_pylist()]
    srows = [[norm(r[c]) for c in scols] for r in s.to_pylist()]
    if len(orows) != len(srows):
        print(f"{name}: ROWS {len(srows)} vs oracle {len(orows)}"); fail += 1; continue
    if orows != srows:
        # unordered fallback: driver hashes in result order, but show diff
        bad = [i for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
        print(f"{name}: VALUE MISMATCH at rows {bad[:5]} of {len(orows)}")
        for i in bad[:3]:
            print(f"   oracle: {orows[i]}")
            print(f"   spark : {srows[i]}")
        fail += 1; continue
    print(f"{name}: OK ({len(orows)} rows)")
sys.exit(1 if fail else 0)
