"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship snapshot query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog from
``oshdb_spark.queries`` for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: snapshot counts of
    tagged entities as-of the probe timestamps (as-of join + agg)."""
    from oshdb_spark.queries import q_snapshot_count_by_ts
    from oshdb_spark.session import ensure_shipped

    ensure_shipped(spark)
    return q_snapshot_count_by_ts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from oshdb_spark.queries import QUERIES
    from oshdb_spark.session import ensure_shipped

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def call(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)  # executors need the package for pandas UDFs
            return fn(spark, sf_dir)

        return call

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from oshdb_spark.queries import ORACLES

    return dict(ORACLES)
