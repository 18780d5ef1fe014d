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
   at coordinate distance >= R*W). A ring that already covers the
   whole grid is complete by construction (its candidates are ALL
   points), so it passes the guarantee regardless of counts.
6. **escalation before concession**: queries failing the guarantee
   retry at ring 2, 4, ... ``max_ring`` — each retry is the same
   broadcast-literal ring cover over only the still-unguaranteed
   queries (cheap: the query side shrinks every level, the points
   side is the same equi-join). Only queries still unguaranteed after
   ``max_ring`` take the full-scan fallback; at production density no
   query reaches it, and the plan contains NO full-scan branch at all
   when escalation resolves everything (asserted in
   tests/test_knn_property.py) — the 100 TB posture, where one sparse
   query must not trigger a scan of the whole points table.

Escalation levels are driven by one tiny ``isEmpty`` probe per level
on the localCheckpoint'ed remainder, so resolved levels are never
recomputed and the common all-guaranteed case costs a single probe.

Distance is squared Euclidean in fixed-point coordinate space,
computed in double (identical IEEE ops in Spark and DuckDB, so
cross-engine hashes agree).
"""

from __future__ import annotations

from functools import reduce

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
    max_ring: int = 8,
) -> DataFrame:
    """Exact kNN: (q_id, rank, entity_id, dist2) with rank 1..k.

    ``points``: (entity_id, lon_e7, lat_e7); ``queries``: (q_id, q_lon,
    q_lat). Ties broken by entity_id, matching the oracle's ORDER BY.
    ``ring`` is the first ring radius tried; unguaranteed queries
    escalate by doubling up to ``max_ring`` before any full scan.
    """
    if max_ring < max(ring, 1):
        # the escalation loop body would never run, leaving exact_parts
        # empty and the final union a TypeError instead of the intended
        # full-scan fallback — reject the nonsensical bound up front
        raise ValueError(
            f"max_ring ({max_ring}) must be >= the first ring tried "
            f"(max(ring, 1) = {max(ring, 1)})"
        )
    n = 1 << zoom
    rows = 1 << (zoom - 1) if zoom > 0 else 1
    w_cell = WORLD_LON // n  # fixed-point cell width

    px, py = cell_xy_cols(zoom, F.col("lon_e7"), F.col("lat_e7"))
    pts = points.select(
        "entity_id", "lon_e7", "lat_e7", (py * n + px).alias("cell")
    )

    w = Window.partitionBy("q_id").orderBy("dist2", "entity_id")
    w_all = Window.partitionBy("q_id")

    def ranked_at(qdf: DataFrame, r: int) -> DataFrame:
        """Ring-r candidates of ``qdf`` ranked, with the per-query
        exactness flag ``_ok``."""
        qx, qy = cell_xy_cols(zoom, F.col("q_lon"), F.col("q_lat"))
        q = qdf.select("q_id", "q_lon", "q_lat", qx.alias("qx"), qy.alias("qy"))
        offsets = F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in range(-r, r + 1)
                for dy in range(-r, r + 1)
            ]
        )
        q_cells = (
            q.withColumn("o", F.explode(offsets))
            .withColumn("cy", F.col("qy") + F.col("o.dy"))
            .filter((F.col("cy") >= 0) & (F.col("cy") < rows))
            .withColumn("cx", ((F.col("qx") + F.col("o.dx")) % n + n) % n)
            .select(
                "q_id", "q_lon", "q_lat", (F.col("cy") * n + F.col("cx")).alias("cell")
            )
            .dropDuplicates(["q_id", "cell"])
        )
        cand = F.broadcast(q_cells).join(pts, "cell").select(
            "q_id",
            "entity_id",
            _dist2(
                F.col("q_lon"), F.col("q_lat"), F.col("lon_e7"), F.col("lat_e7")
            ).alias("dist2"),
        )
        bound = float(r * w_cell) ** 2
        # a ring covering every lon column (wraps) and every lat row
        # (clipped at the poles) IS the whole grid: candidates = all
        # points, so the ranking is exact with no distance bound needed
        complete = (2 * r + 1 >= n) and (r >= rows - 1)
        # guarantee stats as window columns over the SAME partitioning as
        # the rank — one exchange, two Window nodes, no groupBy+re-join
        # (the naive stats-join plan computes the candidate subtree 3x)
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .withColumn("_cnt", F.count(F.lit(1)).over(w_all))
            .withColumn(
                "_dk", F.max(F.when(F.col("rank") <= k, F.col("dist2"))).over(w_all)
            )
            .withColumn(
                "_ok",
                F.lit(complete)
                | ((F.col("_cnt") >= k) & (F.col("_dk") < F.lit(bound))),
            )
        )

    exact_parts: list[DataFrame] = []
    remaining = queries
    r = max(ring, 1)
    need_fallback = True
    while r <= max_ring:
        # the remainder is checkpointed: the probe below, the ok-set
        # anti-join, and (if taken) the next level all reuse one
        # computed frame instead of re-running every prior level
        ranked = ranked_at(remaining, r).localCheckpoint(eager=False)
        exact_parts.append(
            ranked.filter(F.col("_ok") & (F.col("rank") <= k)).select(
                "q_id", "rank", "entity_id", "dist2"
            )
        )
        ok = ranked.filter(F.col("_ok")).select("q_id").distinct()
        remaining = remaining.join(
            F.broadcast(ok), "q_id", "left_anti"
        ).localCheckpoint(eager=True)
        if remaining.isEmpty():
            need_fallback = False
            break
        r *= 2

    out = reduce(DataFrame.unionByName, exact_parts)
    if need_fallback:
        # exactness over speed for whatever survived max_ring (empty at
        # production density; never reached when a ring covers the grid)
        fb = (
            F.broadcast(remaining.select("q_id", "q_lon", "q_lat"))
            .join(points)
            .select(
                "q_id",
                "entity_id",
                _dist2(
                    F.col("q_lon"), F.col("q_lat"), F.col("lon_e7"), F.col("lat_e7")
                ).alias("dist2"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "entity_id", "dist2")
        )
        out = out.unionByName(fb)
    return out
