#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Reads <outDir>/<name>/ parquet (Spark results) + <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB against the sf tables, and compares:
row count, column names (sorted), and values (rows sorted, compared with
exact equality after canonicalization).

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
"""
import json
import math
import sys

import duckdb


def canon(v):
    import numbers
    import numpy as np
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is getattr(
            __import__("pandas"), "NaT", object()):
        return ("null",)
    if isinstance(v, np.ndarray):
        return ("l",) + tuple(canon(x) for x in v.tolist())
    if isinstance(v, numbers.Integral) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, numbers.Real) and not isinstance(v, bool):
        f = float(v)
        return ("nan",) if math.isnan(f) else ("f", repr(f))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(canon(x) for x in v)
    return ("s", str(v))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        s_rows = sorted(tuple(canon(v) for v in row)
                        for row in spark_df[s_cols].itertuples(index=False))
        d_rows = sorted(tuple(canon(v) for v in row)
                        for row in duck_df[d_cols].itertuples(index=False))
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        if s_rows != d_rows:
            bad = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; "
                  f"first at sorted idx {bad[0]}:")
            print(f"  spark: {s_rows[bad[0]]}")
            print(f"  duck : {d_rows[bad[0]]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
