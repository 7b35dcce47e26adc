#!/usr/bin/env python3
"""Assemble docs/scale_trajectory_r{N}.json from three Bench runs + DuckDB.

The Spark side expects one graft_bench.json per scale factor, produced by:
    for sf in 0.001 0.01 0.1:
        SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf sbt "runMain graft.Bench"
        cp graft_bench.json /tmp/traj_sf$sf.json
(run them SEQUENTIALLY on a quiet box — the bench self-reports per-shot
load_1m so contaminated shots are auditable).

The DuckDB side is timed here, best-of-3 per query per sf, using the
oracle SQL dumped by Verify (oracle_sql.json).

Usage: trajectory.py <round> <sparkJsonDir> <oracleSqlJson>
`oracleSqlJson` may contain the literal `{sf}`, substituted per scale —
REQUIRED once oracles read Verify-staged parquet (`__STAGE__` paths are
per-sf; folding one scale's SQL over another scale's stage rows would
time the wrong data).
Writes docs/scale_trajectory_r<round>.json.
"""
import sys, json, time, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SFS = ["0.001", "0.01", "0.1"]


def duck_times(sf_dir, oracle, names, repeat=3):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = {}
    for q in names:
        sql = oracle.get(q)
        if not sql:
            out[q] = None
            continue
        best = None
        for _ in range(repeat):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[q] = round(best, 3)
    con.close()
    return out


def q_covered(q, oracle):
    return bool(oracle.get(q))


def merge_min(doc, prev, names):
    """Per-query per-sf per-engine minimum against a previous assembly —
    the r16 'prefer per-query minima across runs' discipline, automated:
    each assembly runs in whatever host-capacity window it gets (this VM
    swings 17-30 effective cores), and the minimum across windows is the
    quiet-box floor both engines deserve. Totals are recomputed from the
    merged per-query values by the caller.

    Restricted to the CURRENT headline `names` and the current sf blocks
    (r19 ADVICE): a query removed from the suite, or an sf the current
    assembly didn't run, must not be resurrected from the prior JSON into
    the recomputed totals."""
    keep = set(names)
    for eng in ("spark", "duckdb"):
        for sf, blk in prev.get(eng, {}).items():
            if sf not in doc.get(eng, {}):
                continue  # prev-only sf block: drop, never seed an empty one
            cur = doc[eng][sf]
            for q, v in blk.get("queries", {}).items():
                if v is None or q not in keep:
                    continue
                old = cur["queries"].get(q)
                if old is None or v < old:
                    cur["queries"][q] = v


def main():
    rnd, spark_dir, oracle_path = sys.argv[1], sys.argv[2], sys.argv[3]
    merge_path = sys.argv[4] if len(sys.argv) > 4 else None
    def oracle_for(sf):
        return json.load(open(oracle_path.replace("{sf}", sf)))
    oracle = oracle_for(SFS[-1])
    doc = {"note": "Spark best-of-N cold-cache after JIT warmup (Bench.scala); "
                   "DuckDB best-of-3 on the same box. Same code and "
                   "methodology at every sf; per-shot load recorded in the "
                   "bench diag.",
           "spark": {}, "duckdb": {}}
    names = None
    for sf in SFS:
        b = json.load(open(f"{spark_dir}/traj_sf{sf}.json"))
        names = list(b["queries"].keys())
        doc["spark"][f"sf{sf}"] = {
            "total": round(sum(b["queries"].values()), 3),
            "queries": {k: round(v, 3) for k, v in b["queries"].items()}}
    # Totals must compare the SAME query set or cross-engine growth is
    # apples-to-oranges: restrict BOTH engines' totals to oracle-covered
    # queries and record what was excluded (no silent caps).
    uncovered = [q for q in names if not oracle.get(q)]
    doc["total_excludes"] = uncovered
    for sf in SFS:
        cov = {k: v for k, v in doc["spark"][f"sf{sf}"]["queries"].items()
               if q_covered(k, oracle)}
        doc["spark"][f"sf{sf}"]["total"] = round(sum(cov.values()), 3)
    for sf in SFS:
        dt = duck_times(f"/root/testdata/sf{sf}", oracle_for(sf), names)
        covered = [v for v in dt.values() if v is not None]
        doc["duckdb"][f"sf{sf}"] = {"total": round(sum(covered), 3), "queries": dt}
    if merge_path and os.path.exists(merge_path):
        merge_min(doc, json.load(open(merge_path)), names)
        doc["note"] += (" Per-query minimum across assemblies (quiet-window"
                        " floors accumulate; see merge_min).")
        # recompute totals from the merged per-query floors
        for sf in SFS:
            cov = {k: v for k, v in doc["spark"][f"sf{sf}"]["queries"].items()
                   if q_covered(k, oracle)}
            doc["spark"][f"sf{sf}"]["total"] = round(sum(cov.values()), 3)
            dq = doc["duckdb"][f"sf{sf}"]["queries"]
            doc["duckdb"][f"sf{sf}"]["total"] = round(
                sum(v for v in dq.values() if v is not None), 3)
    for eng in ("spark", "duckdb"):
        doc[f"{eng}_growth_10x"] = round(
            doc[eng]["sf0.1"]["total"] / doc[eng]["sf0.01"]["total"], 2)
        doc[f"{eng}_growth_10x_step1"] = round(
            doc[eng]["sf0.01"]["total"] / doc[eng]["sf0.001"]["total"], 2)
    out = f"docs/scale_trajectory_r{rnd}.json"
    json.dump(doc, open(out, "w"), indent=1)
    print(f"wrote {out}: spark 10x growth "
          f"{doc['spark_growth_10x_step1']} / {doc['spark_growth_10x']}, "
          f"duckdb {doc['duckdb_growth_10x_step1']} / {doc['duckdb_growth_10x']}")


if __name__ == "__main__":
    main()
