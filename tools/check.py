#!/usr/bin/env python3
"""Self-check: mimic the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark output), runs the matching
oracle_sql.json query in DuckDB with views over <sfDir>/*.parquet, sorts
columns by name and rows by all columns, and compares values exactly.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(out, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        rel = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        scols = [c[0] for c in rel.description]
        srows = rel.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(srows)} rows "
                  f"{'OK' if len(srows) > 0 else 'EMPTY!'}")
            continue
        try:
            orel = con.execute(oracle[name])
            ocols = [c[0] for c in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"  [FAIL] {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"  [FAIL] {name}: schema {sc} != {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(f"  [FAIL] {name}: rows {len(sr)} != {len(orr)}")
            n_fail += 1
        elif sr != orr:
            bad = next(i for i in range(len(sr)) if sr[i] != orr[i])
            print(f"  [FAIL] {name}: value mismatch at sorted row {bad}:")
            print(f"     spark:  {sr[bad]}")
            print(f"     oracle: {orr[bad]}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"  [pass] {name}: {len(sr)} rows")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
