#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the Verify-written Spark result,
canonicalize both (columns sorted by name, rows sorted), and diff values.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(set(list(oracle.keys()) +
                       [os.path.basename(p) for p in glob.glob(out_dir + "/q_*")]))
    for name in names:
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        s = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
        scols, srows = s.columns, s.fetchall()
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(srows)})"
            continue
        try:
            o = con.sql(oracle[name])
            ocols, orows = o.columns, o.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(orr):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} oracle={len(orr)}"
        elif sr != orr:
            bad = sum(1 for a, b in zip(sr, orr) if a != b)
            ex = next((a, b) for a, b in zip(sr, orr) if a != b)
            results[name] = f"VALUE_MISMATCH {bad}/{len(sr)} rows; first diff: spark={ex[0]} oracle={ex[1]}"
        else:
            results[name] = f"OK({len(sr)})"
    ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith(('OK','ROWS_ONLY')) else 'FAIL':4} {k}: {results[k]}")
    print(f"== {ok}/{len(results)} pass")

if __name__ == "__main__":
    main()
