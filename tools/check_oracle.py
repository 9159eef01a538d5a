#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same test tables, compare against the Spark parquet dump
from graft.Verify (columns sorted by name, values hashed).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in rows]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # With --only-dumped (paired with Verify's SPARK_GRAFT_ONLY filter),
    # check just the queries whose output directory exists — the oracle
    # SQL for the rest is skipped entirely (some are expensive at sf0.1).
    if "--only-dumped" in sys.argv:
        import os
        oracle = {k: v for k, v in oracle.items()
                  if os.path.isdir(f"{out_dir}/{k}")}
    # --only=q1,q2 pins an explicit query list (the sf0.1 sweep runs
    # one query per process so a pathological oracle can be timed out
    # without losing the rest of the sweep).
    for a in sys.argv:
        if a.startswith("--only="):
            names = set(a[len("--only="):].split(","))
            oracle = {k: v for k, v in oracle.items() if k in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.sql(sql)
            ocols = [c.lower() for c in odf.columns]
            orows = odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [c.lower() for c in sdf.columns]
            srows = sdf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns differ: oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        oh, sh = table_hash(orows, ocols), table_hash(srows, scols)
        if sorted(oh) != sorted(sh):
            diff = [i for i, (a, b) in enumerate(zip(sorted(oh), sorted(sh))) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs at sorted idx {diff}")
            for i in diff[:2]:
                print(f"   oracle: {sorted(oh)[i]}")
                print(f"   spark : {sorted(sh)[i]}")
            n_fail += 1
            continue
        if oh != sh:
            print(f"WARN {name}: values match as multiset but row ORDER differs")
        print(f"PASS {name} ({len(orows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total with oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
