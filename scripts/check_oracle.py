"""Driver-style correctness harness: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB, compare row count, column
names, and order-insensitive values (floats to 1e-9 rel tol).

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from lexicator_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, (list, tuple)):
                row.append(tuple(v))
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    return compare_pair(q, sql, spark, con, sf_dir)


def compare_pair(q, sql, spark, con, sf_dir: str) -> tuple[bool, str]:
    """Compare one (Spark callable, DuckDB SQL) pair — used both for
    registered queries and for retired_oracles() pytest gates."""
    sdf = q(spark, sf_dir).toPandas()
    if sql is None:
        return True, f"rows-only: {len(sdf)} rows"
    odf = con.execute(sql).fetchdf()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"row count differs: spark={len(sdf)} oracle={len(odf)}"
    a, b = _normalize(sdf), _normalize(odf)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ, first diffs: {diff}"
    return True, f"{len(sdf)} rows"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      app_name="oracle_check")
    con = duck_con(sf_dir)
    names = list(entrymod.queries())
    if only:
        names = [n for n in names if n in only]
    failures = 0
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as exc:
            ok, msg = False, f"EXCEPTION {type(exc).__name__}: {exc}"
            if os.environ.get("ORACLE_TRACE"):
                traceback.print_exc()
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
        failures += 0 if ok else 1
    print(f"\n{len(names) - failures}/{len(names)} passed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
