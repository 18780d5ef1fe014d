"""Tile materialization: (zoom, x, y)-keyed raster and vector outputs.

The reference stores data in, and answers queries over, an
equal-degree grid whose cell id decomposes into (x, y) per zoom
(``XYGrid.java:96-107,175-199``); this module materializes *query
results* on that grid — the raster↔vector tiling surface the
north-rule adds on top:

* ``assign_tiles``  — pure Column math (no UDF, whole-stage codegen):
  x/y/cell_id per row at a zoom, reference border semantics
  (border→NE, +180 wrap, pole clamp — ``XYGrid.java:110-147``)
* ``raster_tiles``  — one row per tile with an aggregate value
  (density raster); a single hash aggregation
* ``vector_tiles``  — one row per tile with the sorted feature-id list
  (``collect_list`` after an in-partition sort)

Writers partition output by (zoom, x-prefix) so a tile server prunes
on directory structure; at 100 TB the groupBy shuffle is the only
exchange and AQE coalesces small tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oshdb_spark.grid import cell_xy_cols


def assign_tiles(df: DataFrame, zoom: int, lon="lon_e7", lat="lat_e7") -> DataFrame:
    x, y = cell_xy_cols(zoom, F.col(lon), F.col(lat))
    return (
        df.withColumn("zoom", F.lit(zoom))
        .withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .withColumn("tile_id", F.col("tile_y") * (1 << zoom) + F.col("tile_x"))
    )


def raster_tiles(df: DataFrame, zoom: int, value=None) -> DataFrame:
    """Per-tile aggregate (count by default, else sum of ``value``)."""
    t = assign_tiles(df, zoom)
    agg = F.count(F.lit(1)).alias("val") if value is None else F.sum(value).alias("val")
    return t.groupBy("zoom", "tile_x", "tile_y").agg(agg)


def vector_tiles(df: DataFrame, zoom: int, feature_col: str = "entity_id") -> DataFrame:
    """Per-tile sorted feature list (deterministic vector-tile payload)."""
    t = assign_tiles(df, zoom)
    return t.groupBy("zoom", "tile_x", "tile_y").agg(
        F.array_sort(F.collect_list(feature_col)).alias("features"),
        F.count(F.lit(1)).alias("n_features"),
    )
