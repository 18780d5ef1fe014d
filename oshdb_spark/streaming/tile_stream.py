"""Structured Streaming raster-tile maintenance.

The batch engine materializes (zoom, x, y) raster tiles from a finished
table (``operators/tiles.py``); at 10^12-document scale the natural
extension is INCREMENTAL tile maintenance: version events append (e.g.
Iceberg snapshot commits read as a stream) and per-tile aggregates
update under event-time windowing with a watermark for late data —
``readStream -> pure-Column tile assignment -> windowed agg ->
writeStream``, the north rule's raster path kept warm without
re-scanning history.

Tile assignment reuses the exact batch cell math
(``grid.cell_xy_cols``, the XYGrid.java:175-199 analog), so a streamed
tile's (zoom, x, y) is bit-identical to the batch assignment — the
equality test in tests/test_streaming.py asserts the full windowed
per-tile counts match a batch computation of the same expression.

Scale shape: the only state is the windowed aggregation (one row per
live (window, tile)); the watermark bounds it, and the groupBy keys
start with the tile coordinates the physical layout partitions by, so
state and storage shard the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oshdb_spark.grid import cell_xy_cols


def stream_raster_tiles(
    events: DataFrame,
    zoom: int,
    window: str = "10 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    lon: str = "lon_e7",
    lat: str = "lat_e7",
) -> DataFrame:
    """Event-time windowed per-tile event counts over a version-event
    stream. ``ts_col`` is epoch seconds (long). Late events within the
    watermark update their tile; older ones are dropped (documented
    late-data semantics — the batch path has no such cutoff)."""
    x, y = cell_xy_cols(zoom, F.col(lon), F.col(lat))
    typed = (
        events.withColumn("event_time", F.col(ts_col).cast("timestamp"))
        .withColumn("zoom", F.lit(zoom))
        .withColumn("x", x)
        .withColumn("y", y)
    )
    return (
        typed.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "zoom", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("visible").cast("int")).alias("n_visible"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "zoom",
            "x",
            "y",
            "n_events",
            "n_visible",
        )
    )


def batch_raster_tiles_windowed(
    events: DataFrame,
    zoom: int,
    window: str = "10 minutes",
    ts_col: str = "ts",
    lon: str = "lon_e7",
    lat: str = "lat_e7",
) -> DataFrame:
    """The SAME expression over a static frame — the batch truth the
    streaming test compares against (and a usable batch operator in its
    own right: windowed tile activity rollups)."""
    x, y = cell_xy_cols(zoom, F.col(lon), F.col(lat))
    typed = (
        events.withColumn("event_time", F.col(ts_col).cast("timestamp"))
        .withColumn("zoom", F.lit(zoom))
        .withColumn("x", x)
        .withColumn("y", y)
    )
    return (
        typed.groupBy(F.window("event_time", window), "zoom", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("visible").cast("int")).alias("n_visible"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "zoom",
            "x",
            "y",
            "n_events",
            "n_visible",
        )
    )
