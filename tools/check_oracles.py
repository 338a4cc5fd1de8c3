"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its oracle_sql()
on DuckDB at the given sf dir, comparing row count, schema (column names)
and order-insensitive values.  Stricter than the driver: exact value
comparison, not just a hash.

Usage: python3 tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _kind_class(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if len(s) and isinstance(s.iloc[0], (list, np.ndarray)):
            df[c] = s.map(lambda v: str(list(v)))
        elif s.dtype.kind in "iuf":
            df[c] = s.astype("float64")
        elif s.dtype.kind == "M":  # datetimes: compare as ISO strings
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-oracles")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"create view {t} as select * from '{path}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_pd = sdf.toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(spark_pd):6d} rows "
                  f"({t_spark:.1f}s spark)  [no oracle]")
            if len(spark_pd) == 0:
                failures.append((name, "0 rows in rows-only query"))
            continue
        t1 = time.time()
        duck_pd = con.sql(oracles[name]).df()
        t_duck = time.time() - t1
        a, b = normalize(spark_pd), normalize(duck_pd)
        status = "OK"
        # the driver hashes raw values, so an int64-vs-float64 column (e.g.
        # DuckDB HUGEINT materialized as float) fails there even though the
        # normalized comparison below would pass -- catch it here first
        dtype_diffs = [
            (c, spark_pd[c].dtype, duck_pd[c].dtype)
            for c in sorted(set(spark_pd.columns) & set(duck_pd.columns))
            if _kind_class(spark_pd[c].dtype) != _kind_class(duck_pd[c].dtype)
        ]
        if dtype_diffs:
            status = f"DTYPE MISMATCH {dtype_diffs}"
        elif sorted(a.columns) != sorted(b.columns):
            status = f"SCHEMA MISMATCH {sorted(a.columns)} vs {sorted(b.columns)}"
        elif len(a) != len(b):
            status = f"ROWCOUNT {len(a)} vs {len(b)}"
        elif not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            status = f"VALUES MISMATCH ({int(bad.sum())} rows)"
            print(a[bad].head(3))
            print(b[bad].head(3))
        print(f"{name:28s} {status:12s} {len(a):6d} rows "
              f"({t_spark:.1f}s spark / {t_duck:.1f}s duck)")
        if status != "OK":
            failures.append((name, status))
    spark.stop()
    if failures:
        print("\nFAILURES:")
        for name, status in failures:
            print(f"  {name}: {status}")
        return 1
    print("\nall oracles match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
