#!/usr/bin/env python3
"""Driver-faithful replica of the external correctness harness.

check_oracle.py compares via DuckDB fetchall() (Python ints / Decimals,
full-precision repr) — that gate false-greened all 8 rows the round-5
driver rejected. The driver demonstrably compares via PANDAS frames
(q159's recorded err is a pandas lexsort traceback): the oracle arrives
through duckdb .df() (HUGEINT and DECIMAL become float64) while the
Spark dump arrives through pandas.read_parquet (int64 stays int64,
decimal stays Decimal objects), then rows are sorted and hashed on the
STRING form of each cell. So `882` vs `882.0` and Decimal('1.2') vs 1.2
mismatch even when the values are equal, and array cells kill the sort
("unhashable type: numpy.ndarray").

This tool replicates that path so the local gate fails exactly where the
driver would. Run it ALONGSIDE check_oracle.py — a query is done only
when BOTH are green.

Usage: check_driver.py <sfDir> <verifyOutDir> [--only-dumped]
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    # Driver-style canonicalization: the string form of whatever object
    # the pandas frame holds. float64 NaN -> "NaN" so both sides agree.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize_frame(df):
    """Coerce both sides onto the driver's common ground: DATE columns
    arrive as datetime64 from duckdb .df() but as datetime.date objects
    from pandas.read_parquet — the r5 driver greened DATE-emitting
    queries (q48/q127/q163/...), so it must view both as datetime64.
    Same for tz-aware Spark timestamps vs naive DuckDB ones."""
    import datetime
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date) \
                    and not isinstance(nn.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(s)
        if str(df[c].dtype).startswith("datetime64") \
                and getattr(df[c].dtype, "tz", None) is not None:
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df


def frame_rows(df):
    """Sort by all columns (name order) like the driver, then emit the
    per-cell canonical strings. Raises on unhashable cells (arrays) —
    exactly the failure mode the driver records as `err`."""
    df = normalize_frame(df)
    cols = sorted(df.columns)
    df = df[cols]
    # the driver's pandas sort — this is where array cells explode
    df = df.sort_values(by=cols, kind="mergesort", ignore_index=True)
    return [tuple(canon_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


def main(argv):
    sf_dir, out_dir = argv[1], argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if "--only-dumped" in argv:
        import os
        oracle = {k: v for k, v in oracle.items()
                  if os.path.isdir(f"{out_dir}/{k}")}
    # --only=q1,q2 pins an explicit query list (the sf0.1 sweep runs
    # one query per process so a pathological oracle can be timed out
    # without losing the rest of the sweep).
    for a in argv:
        if a.startswith("--only="):
            names = set(a[len("--only="):].split(","))
            oracle = {k: v for k, v in oracle.items() if k in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.sql(sql).df()          # HUGEINT/DECIMAL -> float64
            odf.columns = [c.lower() for c in odf.columns]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            sdf = pd.concat([pd.read_parquet(p) for p in parts],
                            ignore_index=True)
            sdf.columns = [c.lower() for c in sdf.columns]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f"FAIL {name}: columns differ: "
                  f"oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rowcount oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        try:
            orows = frame_rows(odf)
        except Exception as e:
            print(f"ERR  {name}: oracle frame not canonicalizable: {e}")
            n_fail += 1
            continue
        try:
            srows = frame_rows(sdf)
        except Exception as e:
            print(f"ERR  {name}: spark frame not canonicalizable: {e}")
            n_fail += 1
            continue
        if orows != srows:
            diffs = [i for i, (a, b) in enumerate(zip(orows, srows))
                     if a != b][:3]
            print(f"FAIL {name}: cell strings differ at sorted idx {diffs}")
            for i in diffs[:2]:
                print(f"   oracle: {orows[i]}")
                print(f"   spark : {srows[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(orows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total with oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
