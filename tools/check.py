#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first).

For each query: loads <outDir>/<name> parquet (Spark result), runs the
oracle SQL from oracle_sql.json in DuckDB with each fixture registered
as a view, sorts columns by name and rows by value, and compares.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            sp = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
            du = con.execute(sql)
            du_rows, du_cols = du.fetchall(), [d[0] for d in du.description]
        except Exception as e:
            print(f"[FAIL] {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        a, ac = canon(sp_rows, sp_cols)
        b, bc = canon(du_rows, du_cols)
        if ac != bc:
            print(f"[FAIL] {name}: columns differ spark={ac} duck={bc}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"[FAIL] {name}: rowcount spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"[FAIL] {name}: values differ; first diffs (spark,duck): {diffs}")
            n_fail += 1
        else:
            print(f"[PASS] {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
