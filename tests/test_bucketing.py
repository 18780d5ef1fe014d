"""Bucketed-table co-location: writing the versions table bucketed by
entity_id lets every per-entity window/join stage read pre-shuffled
data — the Spark analog of the reference's affinity-colocated Ignite
caches (MapReducerIgniteLocalPeek.java:57-200) and the layout a 100 TB
deployment would bake into its Iceberg write spec. The test asserts
the plan property itself: no Exchange above the scan for a window over
the bucket key."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from oshdb_spark.sources.versions import load_versions


@pytest.fixture(scope="module")
def bucketed_table(spark, sf_dir, tmp_path_factory):
    # warehouse.dir is a static conf — the table lands in the session's
    # default warehouse and is dropped (files deleted) on teardown
    name = "versions_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        load_versions(spark, sf_dir)
        .write.bucketBy(8, "entity_id")
        .sortBy("entity_id", "version")
        .format("parquet")
        .saveAsTable(name)
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_window_over_bucket_key_has_no_exchange(spark, bucketed_table):
    t = spark.table(bucketed_table)
    w = Window.partitionBy("entity_id").orderBy("version")
    windowed = t.withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    plan = _plan_of(windowed)
    assert "Exchange" not in plan, plan  # bucketing provides the partitioning

    # sanity: the same window over the raw parquet DOES need an exchange
    raw = load_versions(spark, "/root/testdata/sf0.001").withColumn(
        "next_ts", F.lead("ts").over(w)
    )
    assert "Exchange" in _plan_of(raw)


def test_bucketed_self_join_has_no_shuffle(spark, bucketed_table):
    a = spark.table(bucketed_table).alias("a")
    b = spark.table(bucketed_table).alias("b")
    j = a.join(b, "entity_id").select("entity_id")
    plan = _plan_of(j)
    assert "Exchange hashpartitioning" not in plan, plan
    assert j.count() > 0
