"""Multipolygon assembly from relation member arcs + hole-aware
measures.

Re-expresses the reference's relation geometry build
(``OSHDBGeometryBuilder.java:188-370``: collect member ways, chain
them into closed rings by endpoint matching — reversing arcs whose
orientation doesn't fit — then classify outer shells vs inner holes)
as one JVM aggregation + one Arrow-batched kernel:

1. ``collect_member_arcs`` — groupBy (rel_id, version): the member
   as-of state is already resolved per version (denormalized model,
   SURVEY §2.4); arcs gather into a single array column. Pure JVM.
2. ``assemble_multipolygons`` — a pandas UDF over the arc array:
   deterministic endpoint-chaining per relation (arcs sorted by
   (arc_idx, first-vertex), each ring closed by matching/reversing
   arcs), plus the hole-aware Chamberlain–Duquette area
   ``sum |outer ring| - sum |inner ring|`` accumulated in a fixed
   left-to-right order so the DuckDB oracle can mirror the exact
   float op sequence.

Scale shape: one shuffle on (rel_id, version) for the arc gather; the
kernel is per-relation but Arrow-batched (thousands of relations per
batch), and ring assembly is O(arcs) per relation with a dict —
exactly the reference's per-entity work distributed by relation id.
Skewed giant relations (coastline-style, thousands of members) are the
known hot keys; they ride the same salting machinery as hot cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from oshdb_spark.functions.geo import EARTH_RADIUS

ARC_SCHEMA = (
    "array<struct<role:string,arc_idx:int,lon_arr:array<long>,lat_arr:array<long>>>"
)
RINGS_SCHEMA = (
    "struct<rings:array<struct<role:string,lon:array<long>,lat:array<long>>>,"
    "area_m2:double,n_outer:int,n_inner:int,closed:boolean>"
)


def collect_member_arcs(members: DataFrame) -> DataFrame:
    """One row per relation version with all member arcs gathered:
    (rel_id, version, ts, valid_to, visible, arcs). The single shuffle
    of the assembly pipeline."""
    arc = F.struct(
        F.col("role"), F.col("arc_idx"), F.col("lon_arr"), F.col("lat_arr")
    )
    return members.groupBy("rel_id", "version").agg(
        F.first("ts").alias("ts"),
        F.first("valid_to").alias("valid_to"),
        F.first("visible").alias("visible"),
        F.collect_list(arc).alias("arcs"),
    )


def _ring_signed_area_m2(lon_e7: list[int], lat_e7: list[int]) -> float:
    """Chamberlain–Duquette signed area of one closed ring, accumulated
    strictly left-to-right over the rolled terms — the same op order the
    SQL oracle's symbolic expansion uses (see functions/geo.rings_area
    for the batched variant; this scalar form pins the sum order)."""
    x = np.radians(np.asarray(lon_e7, dtype=np.float64) * 1e-7)
    y = np.radians(np.asarray(lat_e7, dtype=np.float64) * 1e-7)
    terms = (np.roll(x, -2) - x) * np.sin(np.roll(y, -1))
    acc = 0.0
    for t in terms:
        acc += t
    return acc * EARTH_RADIUS * EARTH_RADIUS / 2.0


def _assemble(arcs: list[dict]) -> dict:
    """Chain arcs into closed rings (the OSHDBGeometryBuilder.java
    endpoint-matching loop, re-derived): pick the first unused arc in
    deterministic order, extend the open end by the arc sharing its
    endpoint (reversed if stored backwards), close, repeat.

    O(total arcs) via an endpoint index: (role, point) -> candidate arc
    ranks, so coastline-style relations with thousands of members cost
    one dict probe per extension, not a linear scan. Rank order (by
    arc_idx then first vertex) breaks every tie deterministically."""
    parsed = []
    for a in arcs:
        lon = [int(v) for v in a["lon_arr"]]
        lat = [int(v) for v in a["lat_arr"]]
        parsed.append((a["role"], lon, lat))
    order = sorted(
        range(len(parsed)),
        key=lambda i: (int(arcs[i]["arc_idx"]), parsed[i][1][0], parsed[i][2][0]),
    )
    rank_of = {i: r for r, i in enumerate(order)}
    # endpoint index: (role, point) -> sorted list of arc ids touching it
    by_end: dict[tuple, list[int]] = {}
    for i, (role, lon, lat) in enumerate(parsed):
        for pt in {(lon[0], lat[0]), (lon[-1], lat[-1])}:
            by_end.setdefault((role, pt), []).append(i)
    for lst in by_end.values():
        lst.sort(key=rank_of.__getitem__)
    used = [False] * len(parsed)
    rings, closed_all = [], True
    for start in order:
        if used[start]:
            continue
        used[start] = True
        role, alon, alat = parsed[start]
        lon, lat = list(alon), list(alat)
        while (lon[0], lat[0]) != (lon[-1], lat[-1]):
            end = (lon[-1], lat[-1])
            nxt = None
            for j in by_end.get((role, end), ()):
                if not used[j]:
                    nxt = j
                    break
            if nxt is None:
                closed_all = False  # dangling member: emit unclosed ring
                break
            used[nxt] = True
            _, bl, bt = parsed[nxt]
            if (bl[0], bt[0]) == end:
                lon += bl[1:]
                lat += bt[1:]
            else:
                lon += bl[-2::-1]
                lat += bt[-2::-1]
        rings.append({"role": role, "lon": lon, "lat": lat})
    # hole-aware area in ring order: sum of |outer| first, then - |inner|
    outer_acc = 0.0
    inner_acc = 0.0
    for r in rings:
        if (r["lon"][0], r["lat"][0]) != (r["lon"][-1], r["lat"][-1]):
            continue  # unclosed rings contribute no area (reference drops them)
        area = abs(_ring_signed_area_m2(r["lon"], r["lat"]))
        if r["role"] == "outer":
            outer_acc += area
        else:
            inner_acc += area
    n_outer = sum(1 for r in rings if r["role"] == "outer")
    return {
        "rings": rings,
        "area_m2": outer_acc - inner_acc,
        "n_outer": n_outer,
        "n_inner": len(rings) - n_outer,
        "closed": closed_all,
    }


def assemble_multipolygons(gathered: DataFrame, arcs_col: str = "arcs") -> DataFrame:
    """Adds ``mp`` (rings/area_m2/n_outer/n_inner/closed) per relation
    version via one Arrow-batched kernel."""

    @pandas_udf(RINGS_SCHEMA)
    def kernel(arc_series: pd.Series) -> pd.DataFrame:
        out = [_assemble(list(arcs)) for arcs in arc_series]
        return pd.DataFrame(out)

    return gathered.withColumn("mp", kernel(F.col(arcs_col)))


def _rings_contain(rings: list[dict], px: int, py: int) -> bool:
    """Even-odd ray cast over ALL closed rings at once: a point inside a
    shell and inside a hole crosses an even number of edges — holes fall
    out of the parity rule with no outer/inner classification needed
    (the even-odd formulation of the reference's hole-aware containment,
    ``FastPointInPolygon`` + inner-ring subtraction)."""
    crossings = 0
    for r in rings:
        lon, lat = r["lon"], r["lat"]
        if (lon[0], lat[0]) != (lon[-1], lat[-1]):
            continue  # unclosed rings don't bound area
        x = np.asarray(lon, dtype=np.float64)
        y = np.asarray(lat, dtype=np.float64)
        x1, x2 = x[:-1], x[1:]
        y1, y2 = y[:-1], y[1:]
        straddles = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        crossings += int(np.count_nonzero(straddles & (px < xi)))
    return crossings % 2 == 1


def multipolygon_contains(
    assembled: DataFrame, px, py, out_col: str = "contains", mp_col: str = "mp"
) -> DataFrame:
    """Per-row hole-aware containment of the point column pair
    (px, py) — one Arrow-batched kernel over the assembled rings."""

    @pandas_udf("boolean")
    def kernel(rings: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _rings_contain(list(r), int(x), int(y))
                for r, x, y in zip(rings, xs, ys)
            ]
        )

    return assembled.withColumn(
        out_col,
        kernel(
            F.col(f"{mp_col}.rings"),
            px.cast("long"),
            py.cast("long"),
        ),
    )
