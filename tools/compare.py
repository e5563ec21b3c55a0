#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with views over <sfDir>/*.parquet
  - sort columns by name, sort rows by all columns, compare cell-by-cell
    (exact; floats compared bit-exactly, with near-miss diagnostics).

This is the strictest plausible interpretation of the driver's
"row/schema/hash match" — if this passes, any reasonable hash passes.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return ("NULL",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("NAN",)
        return ("f", repr(v))
    return (type(v).__name__, str(v))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        sc = sorted(spark_df.columns)
        dc = sorted(duck_df.columns)
        if [c.lower() for c in sc] != [c.lower() for c in dc]:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        srows = [tuple(norm_cell(v) for v in row)
                 for row in spark_df[sc].itertuples(index=False, name=None)]
        # map duck cols by case-insensitive name to spark order
        dmap = {c.lower(): c for c in duck_df.columns}
        dcols = [dmap[c.lower()] for c in sc]
        drows = [tuple(norm_cell(v) for v in row)
                 for row in duck_df[dcols].itertuples(index=False, name=None)]
        srows.sort()
        drows.sort()
        if srows == drows:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            diffs = [(i, a, b) for i, (a, b) in
                     enumerate(zip(srows, drows)) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs:")
            for i, a, b in diffs:
                for x, y in zip(a, b):
                    if x != y:
                        print(f"  row {i}: spark={x} duck={y}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
