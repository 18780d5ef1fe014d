"""Compute-dominated bench job for the N vs 4N scaling measurement.

The catalog suite at sf0.1 finishes in seconds and is dominated by
fixed per-query costs (JIT, Python worker pool startup), which makes a
parallelism comparison meaningless. This job deterministically
replicates the events table in-memory (no external data: replica k
shifts event_id by k * 10^7, keeping the derivation seeded purely by
the input), producing millions of versions, then runs the engine's
heavy path end-to-end:

  window (version numbering) -> as-of snapshot fan-out -> PIP kernel
  over the diamond AOI -> raster tiles -> hash aggregation

i.e. two shuffles + one Arrow kernel pass, the same stage mix a 100 TB
run spends its time in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oshdb_spark.operators.snapshot import snapshot_timestamps, snapshots
from oshdb_spark.operators.spatial import filter_polygon
from oshdb_spark.operators.tiles import raster_tiles
from oshdb_spark.queries import DIAMOND_LAT, DIAMOND_LON
from oshdb_spark.sources.versions import SNAPSHOT_TS, derive_versions


def replicated_events(spark: SparkSession, sf_dir: str, replicas: int) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the sandbox file is one small parquet -> one input partition; spread
    # the cheap pre-explode rows so the x-replicas fan-out and everything
    # downstream runs on all cores (a real 100 TB table arrives already
    # partitioned - this stands in for that)
    ev = ev.repartition(spark.sparkContext.defaultParallelism * 2)
    rep = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias("rep")
    ev = ev.select("*", rep)
    return ev.withColumn(
        "event_id", F.col("event_id") + F.col("rep").cast("long") * 10_000_000
    ).drop("rep")


def scale_job(spark: SparkSession, sf_dir: str, replicas: int = 16) -> int:
    """Returns the number of output rows (tiles + snapshot rows) —
    the 'tiles + join-output rows' throughput numerator."""
    ev = replicated_events(spark, sf_dir, replicas)
    v = derive_versions(ev, entity_mod=200 * replicas)
    t = snapshot_timestamps(spark, SNAPSHOT_TS)
    snap = snapshots(v, t)
    hit = filter_polygon(snap, DIAMOND_LON, DIAMOND_LAT, zoom=6)
    tiles = raster_tiles(hit, zoom=8)
    row = tiles.agg(
        F.count(F.lit(1)).alias("n_tiles"), F.sum("val").alias("n_join_rows")
    ).collect()[0]
    return int(row["n_tiles"]) + int(row["n_join_rows"])
