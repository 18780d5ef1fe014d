"""Snapshot view: entity state as-of each query timestamp.

Spark-first re-expression of the reference's snapshot extraction
(``oshdb-util/.../celliterator/CellIterator.java:181-347``,
``OSHEntities.getByTimestamp`` as-of rule ``OSHEntities.java:41-86``):

* each version gets a validity interval ``[ts, next_version_ts)`` via a
  ``lead()`` window over (entity, version) — this *is* the reference's
  modification-timestamp dedup (``CellIterator.java:219-240``): a query
  timestamp falls into exactly one interval, so unchanged periods are
  never recomputed by construction;
* the (tiny) query-timestamp list is broadcast and range-joined —
  a BroadcastNestedLoopJoin whose build side is a handful of rows, so
  the probe side streams with zero shuffle;
* visibility and tag filters run *before* the fan-out to timestamps,
  mirroring the reference's version filter at ``CellIterator.java:250-286``.

At 100 TB the versions table is partitioned by cell prefix; the window
shuffles once on entity_id and every later stage reuses that exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_validity(versions: DataFrame) -> DataFrame:
    """Add ``valid_to`` = next version's ts (null = open interval).

    Two versions sharing an identical ts yield an empty interval for
    the earlier one — it is never visible to any as-of probe, exactly
    like the reference where the later modification supersedes it.

    No-op if the source already carries ``valid_to`` (derive_versions
    computes it in the same window pass as the version numbering,
    avoiding a second full sort).
    """
    if "valid_to" in versions.columns:
        return versions
    w = Window.partitionBy("entity_id").orderBy("version")
    return versions.withColumn("valid_to", F.lead("ts").over(w))


def snapshots(
    versions: DataFrame,
    timestamps: DataFrame,
    predicate: Column | None = None,
    keep_invisible: bool = False,
) -> DataFrame:
    """One row per (entity, snap_ts) where the as-of version exists.

    ``timestamps`` must have a single ``snap_ts`` long column; it is
    broadcast. ``predicate`` is an arbitrary per-version Column filter
    (the ``osmEntityFilter``/``osmTag`` analog, ``MapReducer.java:422-515``).
    """
    v = with_validity(versions)
    if predicate is not None:
        v = v.filter(predicate)
    if not keep_invisible:
        v = v.filter(F.col("visible"))
    t = F.broadcast(timestamps)
    cond = (t["snap_ts"] >= v["ts"]) & (
        v["valid_to"].isNull() | (t["snap_ts"] < v["valid_to"])
    )
    return v.join(t, cond, "inner")


def snapshot_timestamps(spark, ts_list: list[int]) -> DataFrame:
    """Materialize a query-timestamp list (``MapReducer.timestamps(...)``
    analog, ``MapReducer.java:297-394``) as a 1-column DataFrame.

    Built as a JVM literal relation (explode of a literal array), NOT
    ``createDataFrame`` — the latter is an RDD-backed Python scan that
    forces Python worker startup into every join against it."""
    return lit_df(spark, "snap_ts", [int(t) for t in ts_list], "long")


def lit_df(spark, name: str, values: list, dtype: str) -> DataFrame:
    """Small literal DataFrame as a pure JVM LocalRelation."""
    arr = F.array(*[F.lit(v).cast(dtype) for v in values])
    return spark.range(1).select(F.explode(arr).alias(name))
