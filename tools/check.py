#!/usr/bin/env python3
"""Self-check: mimic the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark output), runs the matching
oracle_sql.json query in DuckDB with views over <sfDir>/*.parquet, sorts
columns by name and rows by all columns, and compares values exactly.

Type pre-flight (driver-hash semantics): the driver hashes *typed*
arrow values, so a DuckDB result whose column arrives as
decimal128/hugeint (e.g. window SUM(BIGINT) -> HUGEINT widening) can
never hash-equal Spark's int64 even when every value is numerically
equal. We therefore fetch both sides as arrow and FAIL on:
  - any decimal/hugeint-typed oracle column (unless Spark emits the
    same decimal type), and
  - any arrow type mismatch between the oracle column and the Spark
    parquet column (int width, float/double, date/timestamp, ...).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def arrow_types(tbl):
    """column name -> canonical arrow type string, nullability ignored."""
    return {f.name: str(f.type) for f in tbl.schema}

def type_preflight(name, stbl, otbl):
    """Return a list of type-mismatch error strings (empty = clean)."""
    errs = []
    st, ot = arrow_types(stbl), arrow_types(otbl)
    for col in sorted(set(st) & set(ot)):
        s, o = st[col], ot[col]
        if s == o:
            continue
        if o.startswith("decimal") or o == "hugeint":
            errs.append(f"oracle col '{col}' is {o} (Spark: {s}) — "
                        f"DuckDB widening; CAST it in the oracle SQL")
        else:
            errs.append(f"typed mismatch col '{col}': spark {s} vs oracle {o}")
    return errs

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
        stbl = con.execute(f"SELECT * FROM '{d}/*.parquet'").arrow()
        scols = stbl.column_names
        srows = [tuple(r.values()) for r in stbl.to_pylist()]
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(srows)} rows "
                  f"{'OK' if len(srows) > 0 else 'EMPTY!'}")
            continue
        try:
            otbl = con.execute(oracle[name]).arrow()
            ocols = otbl.column_names
            orows = [tuple(r.values()) for r in otbl.to_pylist()]
        except Exception as e:
            print(f"  [FAIL] {name}: oracle error: {e}")
            n_fail += 1
            continue
        terrs = type_preflight(name, stbl, otbl)
        if terrs:
            for e in terrs:
                print(f"  [FAIL] {name}: {e}")
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
    # a query that CRASHED in Verify leaves no result dir — without this
    # the self-check would silently skip it while the driver records a
    # failure (same weaker-than-driver class as the value-level compare)
    have = {os.path.basename(d) for d in glob.glob(os.path.join(out, "*"))
            if os.path.isdir(d)}
    for name in sorted(set(oracle) - have):
        print(f"  [FAIL] {name}: oracle present but no Spark output dir "
              f"(query crashed in Verify?)")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
