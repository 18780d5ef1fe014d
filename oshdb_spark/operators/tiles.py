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


def way_vector_tiles(ways: DataFrame, zoom: int) -> DataFrame:
    """Line-feature vector tiles: each way polyline is split into
    segments, fanned out to the tiles its endpoints span, CLIPPED to
    each tile's rectangle (vectorized Liang–Barsky), and aggregated to
    (tile, n_ways, total clipped length) — the real vector-tile
    materialization step (features cut at tile borders; the reference
    clips via JTS intersection, ``Geo.java:185-191``).

    ``ways`` needs (way_id, lon_arr, lat_arr); coordinates must be
    strictly inside the world range (no antimeridian wrap — holds for
    the ways fixtures by construction). Tile bounds are exact in double
    because tx * WORLD_LON < 2^45 and the divisor is a power of two.
    """
    from oshdb_spark.functions.geo import EARTH_RADIUS
    from oshdb_spark.grid import LAT_MAX, LON_MAX, WORLD_LON
    from oshdb_spark.operators.spatial import np_clip_segments

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n = 1 << zoom
    W = float(WORLD_LON)

    segs = ways.select(
        "way_id",
        F.explode(F.sequence(F.lit(0), F.size("lon_arr") - 2)).alias("j"),
        "lon_arr",
        "lat_arr",
    ).select(
        "way_id",
        F.element_at("lon_arr", F.col("j") + 1).alias("x1"),
        F.element_at("lat_arr", F.col("j") + 1).alias("y1"),
        F.element_at("lon_arr", F.col("j") + 2).alias("x2"),
        F.element_at("lat_arr", F.col("j") + 2).alias("y2"),
    )

    def tx(c):
        return F.floor(((c + F.lit(LON_MAX)) * n) / F.lit(W)).cast("long")

    def ty(c):
        return F.floor(((c + F.lit(LAT_MAX)) * n) / F.lit(W)).cast("long")

    segs = (
        segs.withColumn("min_tx", F.least(tx(F.col("x1")), tx(F.col("x2"))))
        .withColumn("max_tx", F.greatest(tx(F.col("x1")), tx(F.col("x2"))))
        .withColumn("min_ty", F.least(ty(F.col("y1")), ty(F.col("y2"))))
        .withColumn("max_ty", F.greatest(ty(F.col("y1")), ty(F.col("y2"))))
    )
    fanned = segs.select(
        "*",
        F.explode(F.sequence(F.col("min_tx"), F.col("max_tx"))).alias("tile_x"),
    ).select(
        "*",
        F.explode(F.sequence(F.col("min_ty"), F.col("max_ty"))).alias("tile_y"),
    )
    rx0 = F.floor((F.col("tile_x") * W) / n) - F.lit(LON_MAX)
    rx1 = F.floor(((F.col("tile_x") + 1) * W) / n) - F.lit(LON_MAX)
    ry0 = F.floor((F.col("tile_y") * W) / n) - F.lit(LAT_MAX)
    ry1 = F.floor(((F.col("tile_y") + 1) * W) / n) - F.lit(LAT_MAX)

    def _cliplen_fn(x1, y1, x2, y2, a, b, c, d):
        cx1, cy1, cx2, cy2, valid = np_clip_segments(
            x1.to_numpy(), y1.to_numpy(), x2.to_numpy(), y2.to_numpy(),
            a.to_numpy(), b.to_numpy(), c.to_numpy(), d.to_numpy(),
        )
        dlng = np.radians((cx2 - cx1) * 1e-7) * np.cos(
            np.radians(((cy1 + cy2) * 1e-7) / 2.0)
        )
        dlat = np.radians((cy2 - cy1) * 1e-7)
        out = EARTH_RADIUS * np.sqrt(dlng * dlng + dlat * dlat)
        # invalid clips (Liang-Barsky rejection: the segment's bbox spans
        # the tile but the segment itself never enters it) -> NULL, so the
        # way is neither counted nor summed for that tile (the reference
        # drops empty JTS intersections, Geo.java:185-191)
        return pd.Series(np.where(valid, out, np.nan))

    cliplen = pandas_udf(_cliplen_fn, "double")
    clipped = fanned.select(
        "way_id",
        "tile_x",
        "tile_y",
        cliplen(
            F.col("x1").cast("double"), F.col("y1").cast("double"),
            F.col("x2").cast("double"), F.col("y2").cast("double"),
            rx0.cast("double"), ry0.cast("double"),
            rx1.cast("double"), ry1.cast("double"),
        ).alias("len_m"),
    )
    return (
        clipped.filter(F.col("len_m").isNotNull())
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count_distinct("way_id").alias("n_ways"),
            F.round(F.sum("len_m") / 1000.0, 2).alias("len_km"),
        )
        .withColumn("zoom", F.lit(zoom))
    )
