"""Local stand-in for the driver's correctness gate: run each catalog
query on Spark and its oracle on DuckDB over the same sf dir, compare
row count, column set, and order-insensitive values.

Usage: python tests/driver_mimic.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — the
    order-insensitive comparison the driver applies."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) in ("bool", "boolean"):
            df[c] = df[c].astype(bool)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH: spark={len(a)} duck={len(b)}"
    # The driver's value hash is exact: an int64 1234 vs a float64 1234.0
    # (DuckDB HUGEINT -> pandas float) breaks it even when values agree.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and {ka, kb} <= {"i", "u", "f"} and "f" in {ka, kb}:
            return f"DTYPE MISMATCH: col={c} spark={a[c].dtype} duck={b[c].dtype}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9)
    except AssertionError as e:
        return "VALUE MISMATCH: " + str(e).split("\n")[0]
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from oshdb_spark.queries import ORACLES, QUERIES
    from oshdb_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)
    failures = 0
    for name, fn in QUERIES.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        verdict = compare(name, sdf, ddf)
        print(f"{name}: {verdict}  ({len(sdf)} rows)")
        if verdict != "OK":
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
