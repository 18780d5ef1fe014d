"""k-nearest-neighbours via grid cell-ring candidate expansion.

New per the north rule (no reference implementation exists; the
ring-1 primitive is the reference's ``XYGrid.getNeighbours``,
``XYGrid.java:381-395``). Spark-first plan:

1. index points once at a chosen zoom (pure Column math);
2. explode each query into its Chebyshev-ring cells (a literal
   (dx, dy) offset array — a few dozen rows per query, broadcastable);
3. equi-join candidates on cell id — a hash join on a small build
   side instead of any distance-theta join;
4. rank candidates per query with ``row_number() over (q_id ORDER BY
   dist2, entity_id)``;
5. **exactness guarantee**: if a query found >= k candidates and its
   k-th distance is < ring_radius * cell_width, no point outside the
   ring can beat rank k (points beyond Chebyshev cell-distance R are
   at coordinate distance >= R*W). Queries failing the guarantee fall
   back to a full scan — at production density the ring path covers
   ~all queries; the fallback keeps results *exact*, matching the
   brute-force oracle bit-for-bit.

Distance is squared Euclidean in fixed-point coordinate space,
computed in double (identical IEEE ops in Spark and DuckDB, so
cross-engine hashes agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oshdb_spark.grid import WORLD_LON, cell_xy_cols


def _dist2(qlon, qlat, plon, plat):
    dlon = (qlon - plon).cast("double")
    dlat = (qlat - plat).cast("double")
    return dlon * dlon + dlat * dlat


def knn(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    zoom: int = 3,
    ring: int = 1,
) -> DataFrame:
    """Exact kNN: (q_id, rank, entity_id, dist2) with rank 1..k.

    ``points``: (entity_id, lon_e7, lat_e7); ``queries``: (q_id, q_lon,
    q_lat). Ties broken by entity_id, matching the oracle's ORDER BY.
    """
    n = 1 << zoom
    rows = 1 << (zoom - 1) if zoom > 0 else 1
    w_cell = WORLD_LON // n  # fixed-point cell width

    px, py = cell_xy_cols(zoom, F.col("lon_e7"), F.col("lat_e7"))
    pts = points.select(
        "entity_id", "lon_e7", "lat_e7", (py * n + px).alias("cell")
    )

    qx, qy = cell_xy_cols(zoom, F.col("q_lon"), F.col("q_lat"))
    q = queries.select("q_id", "q_lon", "q_lat", qx.alias("qx"), qy.alias("qy"))

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)
        ]
    )
    q_cells = (
        q.withColumn("o", F.explode(offsets))
        .withColumn("cy", F.col("qy") + F.col("o.dy"))
        .filter((F.col("cy") >= 0) & (F.col("cy") < rows))
        .withColumn("cx", ((F.col("qx") + F.col("o.dx")) % n + n) % n)
        .select("q_id", "q_lon", "q_lat", (F.col("cy") * n + F.col("cx")).alias("cell"))
        .dropDuplicates(["q_id", "cell"])
    )

    cand = F.broadcast(q_cells).join(pts, "cell").select(
        "q_id",
        "q_lon",
        "q_lat",
        "entity_id",
        _dist2(F.col("q_lon"), F.col("q_lat"), F.col("lon_e7"), F.col("lat_e7")).alias(
            "dist2"
        ),
    )

    w = Window.partitionBy("q_id").orderBy("dist2", "entity_id")
    w_all = Window.partitionBy("q_id")
    bound = float(ring * w_cell) ** 2
    # guarantee stats as window columns over the SAME partitioning as the
    # rank — one exchange, two Window nodes, no groupBy+re-join (the
    # naive stats-join plan computes the candidate subtree three times)
    ranked = (
        cand.withColumn("rank", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_dk", F.max(F.when(F.col("rank") <= k, F.col("dist2"))).over(w_all)
        )
        .withColumn("_ok", (F.col("_cnt") >= k) & (F.col("_dk") < F.lit(bound)))
    )

    exact_part = ranked.filter(F.col("_ok") & (F.col("rank") <= k))

    # fallback: queries without a ring guarantee get a full scan (exactness
    # over speed for the sparse tail; production density makes this rare)
    ok = ranked.filter(F.col("_ok")).select("q_id").distinct()
    fb_q = queries.join(F.broadcast(ok), "q_id", "left_anti")
    fb = (
        F.broadcast(fb_q)
        .join(points)
        .select(
            "q_id",
            "q_lon",
            "q_lat",
            "entity_id",
            _dist2(
                F.col("q_lon"), F.col("q_lat"), F.col("lon_e7"), F.col("lat_e7")
            ).alias("dist2"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

    return exact_part.select("q_id", "rank", "entity_id", "dist2").unionByName(
        fb.select("q_id", "rank", "entity_id", "dist2")
    )
