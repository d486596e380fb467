"""Local simulation of the driver's correctness gate: run each contract
query on Spark and its oracle on DuckDB at a given sf dir, compare
row-count, schema (column names), and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from neural_entity_matching_spark.plans import contract
    from neural_entity_matching_spark.session import get_spark

    spark = get_spark(app_name="contract-check", master="local[8]",
                      shuffle_partitions=8, tmpfs_shuffle=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in contract.QUERIES.items():
        if only and name not in only:
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            sql = contract.ORACLES.get(name)
            if sql is None:
                print(f"{name:28s} rows={len(got)} (rows-only, no oracle)")
                continue
            exp = normalize(con.sql(sql).df())
            status = []
            if list(got.columns) != list(exp.columns):
                status.append(f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}")
            elif len(got) != len(exp):
                status.append(f"ROWS got={len(got)} exp={len(exp)}")
            else:
                eq = got.equals(exp)
                if not eq:
                    # locate first differing cell for debugging
                    diff_cols = [c for c in got.columns if not got[c].equals(exp[c])]
                    status.append(f"VALUES differ in {diff_cols}")
                    for c in diff_cols[:2]:
                        mask = got[c] != exp[c]
                        i = mask.idxmax()
                        status.append(f"  {c}[{i}]: got={got[c][i]!r} exp={exp[c][i]!r}")
            if status:
                failures.append(name)
                print(f"{name:28s} FAIL " + " | ".join(status))
            else:
                print(f"{name:28s} OK rows={len(got)}")
        except Exception as e:
            failures.append(name)
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:300]}")

    spark.stop()
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
