"""Mimic the driver's correctness gate: run every __spark_entry__.queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, column names, and order-insensitive exact values.

Usage: python tools/check_oracles.py [sf_dir] [only_query_name...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bool, np.bool_)):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rows: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.array_equal(av.astype(np.float64), bv.astype(np.float64))
        else:
            ok = (pd.Series(av) == pd.Series(bv)).all()
        if not ok:
            i = int(np.argmax(~(pd.Series(av) == pd.Series(bv)).to_numpy()))
            problems.append(f"col {c}: first diff row {i}: spark={av[i]!r} duck={bv[i]!r}")
    # dtype drift report (schema-ish)
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and {ka, kb} != {"i", "i"}:
            problems.append(f"dtype {c}: spark={a[c].dtype} duck={b[c].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from geospatial_cuda_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(spark_pdf)} vs {len(duck_pdf)} rows):")
            for p in problems[:6]:
                print(f"     {p}")
        else:
            note = " (EMPTY)" if len(spark_pdf) == 0 else ""
            print(f"ok   {name}: {len(spark_pdf)} rows match{note} ({time.time()-t0:.1f}s)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
