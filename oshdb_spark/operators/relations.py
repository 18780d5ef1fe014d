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
   deterministic endpoint-chaining per relation, then shell-vs-hole
   classification and the hole-aware Chamberlain–Duquette area
   ``sum |outer ring| - sum |inner ring|`` accumulated in a fixed
   left-to-right order so the DuckDB oracle can mirror the exact
   float op sequence.

Chaining is keyed by ENDPOINT only; the member ``role`` is a
deterministic tie-break *hint* (same-role arcs are preferred at an
ambiguous junction), never a hard key — real OSM relations carry
wrong or empty roles, and an arc labelled ``inner`` must still be
able to close an outer ring when the geometry says it does
(``OSHDBGeometryBuilder.java:188-258`` also chains role-blind).
Shells and holes are then classified GEOMETRICALLY: a closed ring
whose representative vertex lies inside an odd number of the other
closed rings is a hole, even (incl. zero) a shell — the even-odd
reading of the reference's STRtree + prepared-contains nesting pass
(``OSHDBGeometryBuilder.java:260-308``).

Ring areas are batched ACROSS the Arrow batch: every closed ring's
vertices concatenate into one flat array, the C–D terms evaluate in
one vectorized pass, and ``np.add.reduceat`` (strictly sequential
left-to-right within each segment — the documented op order the SQL
oracles expand symbolically) reduces per-ring sums without per-ring
numpy allocations. Only the inherently sequential endpoint chaining
remains per-relation Python.

Scale shape: one shuffle on (rel_id, version) for the arc gather; the
kernel is per-relation but Arrow-batched (thousands of relations per
batch), and ring assembly is O(arcs) per relation with a dict —
exactly the reference's per-entity work distributed by relation id.
Skewed giant relations (coastline-style, thousands of members) are the
known hot keys; ``collect_member_arcs(salt=S)`` spreads the gather of a
hot key over S partial reducers before one flatten (the groupBy analog
of hot-cell salting — see tests/test_relations.py's giant-relation
probe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from oshdb_spark.functions.geo import EARTH_RADIUS

ARC_SCHEMA = (
    "array<struct<role:string,arc_ord:int,lon_arr:array<long>,lat_arr:array<long>>>"
)
RINGS_SCHEMA = (
    "struct<rings:array<struct<role:string,lon:array<long>,lat:array<long>>>,"
    "area_m2:double,n_outer:int,n_inner:int,closed:boolean>"
)


def collect_member_arcs(members: DataFrame, salt: int | None = None) -> DataFrame:
    """One row per relation version with all member arcs gathered:
    (rel_id, version, ts, valid_to, visible, arcs). The single shuffle
    of the assembly pipeline.

    The per-arc ordering column is ``arc_ord`` (the decoded within-
    version ordinal) when present, else the source ``arc_idx`` — the
    two are distinct ids (see sources/relations.docs_to_relation_members)
    and assembly only needs *a* deterministic rank, never their join.

    ``salt`` enables the hot-key path for skewed giant relations
    (coastline-style, thousands of members): arcs first gather into
    ``salt`` partial arrays per (rel_id, version) — spreading the wide
    key over ``salt`` reducers — then a second aggregation flattens the
    partials. The hot key's final row is built from ``salt``
    pre-combined arrays instead of thousands of shuffle records, so the
    sort/merge pressure of the skewed reducer drops by ~|arcs|/salt.
    Assembly is arc-order-invariant (tested), so the two-stage gather is
    result-identical to the direct one."""
    ord_col = "arc_ord" if "arc_ord" in members.columns else "arc_idx"
    arc = F.struct(
        F.col("role"),
        F.col(ord_col).alias("arc_ord"),
        F.col("lon_arr"),
        F.col("lat_arr"),
    )
    if salt is None:
        return members.groupBy("rel_id", "version").agg(
            F.first("ts").alias("ts"),
            F.first("valid_to").alias("valid_to"),
            F.first("visible").alias("visible"),
            F.collect_list(arc).alias("arcs"),
        )
    partial = (
        members.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(F.col(ord_col), F.element_at(F.col("lon_arr"), 1)),
                F.lit(salt),
            ),
        )
        .groupBy("rel_id", "version", "_salt")
        .agg(
            F.first("ts").alias("ts"),
            F.first("valid_to").alias("valid_to"),
            F.first("visible").alias("visible"),
            F.collect_list(arc).alias("part"),
        )
    )
    return partial.groupBy("rel_id", "version").agg(
        F.first("ts").alias("ts"),
        F.first("valid_to").alias("valid_to"),
        F.first("visible").alias("visible"),
        F.flatten(F.collect_list("part")).alias("arcs"),
    )


def _ring_signed_area_m2(lon_e7: list[int], lat_e7: list[int]) -> float:
    """Chamberlain–Duquette signed area of one closed ring, accumulated
    strictly left-to-right over the rolled terms — the same op order the
    SQL oracle's symbolic expansion uses (and the same order the batched
    ``_batch_ring_areas`` reproduces via ``np.add.reduceat``)."""
    x = np.radians(np.asarray(lon_e7, dtype=np.float64) * 1e-7)
    y = np.radians(np.asarray(lat_e7, dtype=np.float64) * 1e-7)
    terms = (np.roll(x, -2) - x) * np.sin(np.roll(y, -1))
    acc = 0.0
    for t in terms:
        acc += t
    return acc * EARTH_RADIUS * EARTH_RADIUS / 2.0


def _batch_ring_areas(
    flat_lon: np.ndarray, flat_lat: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """|C–D area| of many variable-length closed rings with the term
    math in ONE numpy pass: rings are concatenated into flat e7
    coordinate arrays with per-ring (start, len) segments, and the
    rolled radians/sin/product terms — the expensive part — are fully
    vectorized. Only the per-ring SUM runs as a plain sequential float
    loop: the SQL oracles expand the sum symbolically left-to-right,
    and neither ``np.add.reduceat`` nor ``np.sum`` honors that order
    (pairwise reduction — a 1-ulp divergence the property test
    caught), while Python float adds are exactly the scalar
    ``_ring_signed_area_m2`` accumulation."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.float64)
    x = np.radians(flat_lon.astype(np.float64) * 1e-7)
    y = np.radians(flat_lat.astype(np.float64) * 1e-7)
    starts_rep = np.repeat(starts, lens)
    lens_rep = np.repeat(lens, lens)
    p = np.arange(len(x), dtype=np.int64) - starts_rep
    i2 = starts_rep + (p + 2) % lens_rep
    i1 = starts_rep + (p + 1) % lens_rep
    terms = ((x[i2] - x) * np.sin(y[i1])).tolist()
    out = np.empty(len(starts), dtype=np.float64)
    pos = 0
    for k, n in enumerate(lens.tolist()):
        acc = 0.0
        for j in range(pos, pos + n):
            acc += terms[j]
        pos += n
        # op order matters: ((sum * R) * R) / 2, exactly like the
        # scalar form and the SQL oracles' symbolic expansion
        out[k] = abs(acc * EARTH_RADIUS * EARTH_RADIUS / 2.0)
    return out


def _point_in_ring(lon: list[int], lat: list[int], px: int, py: int) -> bool:
    """Even-odd ray cast of one point against one closed ring. Plain
    Python below 64 edges (no numpy alloc for the common tiny ring),
    vectorized above (coastline-scale rings)."""
    n = len(lon) - 1
    if n < 3:
        return False
    if n >= 64:
        x = np.asarray(lon, dtype=np.float64)
        y = np.asarray(lat, dtype=np.float64)
        x1, x2, y1, y2 = x[:-1], x[1:], y[:-1], y[1:]
        straddles = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        return int(np.count_nonzero(straddles & (px < xi))) % 2 == 1
    crossings = 0
    for i in range(n):
        y1, y2 = lat[i], lat[i + 1]
        if (y1 > py) != (y2 > py):
            xi = lon[i] + (py - y1) * (lon[i + 1] - lon[i]) / (y2 - y1)
            if px < xi:
                crossings += 1
    return crossings % 2 == 1


def _chain_rings(arcs: list[dict]) -> tuple[list[dict], bool]:
    """Chain arcs into rings by ENDPOINT matching (the
    OSHDBGeometryBuilder.java endpoint loop, re-derived): pick the
    first unused arc in deterministic order, extend the open end by an
    arc sharing its endpoint (reversed if stored backwards), close,
    repeat. Role is only a tie-break preference at junctions touched
    by arcs of several roles — wrong or empty roles still assemble.

    O(total arcs) via an endpoint index: point -> candidate arc ranks,
    so coastline-style relations with thousands of members cost one
    dict probe per extension, not a linear scan. Rank order (by
    arc_ord then first vertex) breaks every tie deterministically.

    Returns (rings, closed_all); each ring carries ``hint`` = the seed
    arc's role (used only as the fallback label for unclosed rings —
    closed rings are classified geometrically afterwards)."""
    # arcs with no coordinates (a member way whose nodes all failed to
    # resolve — the incomplete-data family) carry no geometry: skip them
    # rather than crash; the reference's contract is a non-throwing
    # build from whatever members survive
    arcs = [a for a in arcs if len(a["lon_arr"]) > 0]
    parsed = []
    for a in arcs:
        lon = [int(v) for v in a["lon_arr"]]
        lat = [int(v) for v in a["lat_arr"]]
        parsed.append((a["role"], lon, lat))
    order = sorted(
        range(len(parsed)),
        key=lambda i: (int(arcs[i]["arc_ord"]), parsed[i][1][0], parsed[i][2][0]),
    )
    rank_of = {i: r for r, i in enumerate(order)}
    # endpoint index: point -> arc ids touching it (role-blind)
    by_end: dict[tuple, list[int]] = {}
    for i, (_role, lon, lat) in enumerate(parsed):
        for pt in {(lon[0], lat[0]), (lon[-1], lat[-1])}:
            by_end.setdefault(pt, []).append(i)
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
            fallback = None
            for j in by_end.get(end, ()):
                if used[j]:
                    continue
                if parsed[j][0] == role:
                    nxt = j  # same-role hint wins at a mixed junction
                    break
                if fallback is None:
                    fallback = j
            if nxt is None:
                nxt = fallback
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
        rings.append({"hint": role, "lon": lon, "lat": lat})
    return rings, closed_all


def _point_on_ring(lon: list[int], lat: list[int], px, py) -> bool:
    """Is (px, py) ON the boundary of the closed ring? Exact for e7
    integer coordinates via the collinearity cross product + segment
    bbox test. Coordinate DELTAS fit int64 (|delta| <= 3.6e9), but the
    cross-product TERMS can reach ~1.3e19 > 2^63 for long segments far
    from the probe point, so the two products are taken in Python ints
    (numpy object dtype) — exact at any e7 coordinate, no silent wrap.
    This is driver-side per-relation code over short vertex arrays; the
    object-dtype multiply costs nothing measurable here."""
    x = np.asarray(lon, dtype=np.int64)
    y = np.asarray(lat, dtype=np.int64)
    x1, x2, y1, y2 = x[:-1], x[1:], y[:-1], y[1:]
    cross = (x2 - x1).astype(object) * (py - y1) - (y2 - y1).astype(object) * (px - x1)
    within = (
        (np.minimum(x1, x2) <= px)
        & (px <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= py)
        & (py <= np.maximum(y1, y2))
    )
    return bool(np.any((cross == 0) & within))


def _classify_rings(rings: list[dict]) -> None:
    """Shell-vs-hole by geometry: a closed ring nested inside an odd
    number of the OTHER closed rings is ``inner``, else ``outer``
    (matching the containment pass of
    ``OSHDBGeometryBuilder.java:260-308``; even-odd nesting depth makes
    islands-in-lakes outers again).

    TOUCHING RINGS (the reference repairs them with buffer(0),
    ``OSHDBGeometryBuilder.java:289-293``): the representative point
    must not lie ON another closed ring's edge — a ray cast from a
    boundary point is ill-defined (a hole touching its shell at a
    vertex would classify as a second shell). The probe is therefore
    the FIRST vertex of the ring that is on no other closed ring's
    boundary (deterministic); if every vertex touches (degenerate,
    e.g. a ring traced entirely along another's edges), the first
    edge's midpoint is used. Unclosed rings keep their seed arc's role
    hint. Mutates ``rings`` in place, adding ``role``."""
    closed = [
        r for r in rings if (r["lon"][0], r["lat"][0]) == (r["lon"][-1], r["lat"][-1])
    ]
    # bbox fast-reject (the STRtree-lite of OSHDBGeometryBuilder's
    # prepared-contains pass): a point outside the other ring's bbox can
    # never be inside it — giant relations with many disjoint shells
    # would otherwise pay O(R^2) full ray casts
    boxes = [
        (min(r["lon"]), max(r["lon"]), min(r["lat"]), max(r["lat"])) for r in closed
    ]

    def on_any_other_boundary(r, px, py) -> bool:
        for other, bb in zip(closed, boxes):
            if other is r:
                continue
            if px < bb[0] or px > bb[1] or py < bb[2] or py > bb[3]:
                continue
            if _point_on_ring(other["lon"], other["lat"], px, py):
                return True
        return False

    for r in rings:
        if (r["lon"][0], r["lat"][0]) != (r["lon"][-1], r["lat"][-1]):
            r["role"] = r["hint"]
            continue
        probe = None
        for px, py in zip(r["lon"][:-1], r["lat"][:-1]):
            if not on_any_other_boundary(r, px, py):
                probe = (px, py)
                break
        if probe is None:
            probe = (
                (r["lon"][0] + r["lon"][1]) / 2.0,
                (r["lat"][0] + r["lat"][1]) / 2.0,
            )
        px, py = probe
        depth = 0
        for other, bb in zip(closed, boxes):
            if other is r:
                continue
            if px < bb[0] or px > bb[1] or py < bb[2] or py > bb[3]:
                continue
            if _point_in_ring(other["lon"], other["lat"], px, py):
                depth += 1
        r["role"] = "inner" if depth % 2 == 1 else "outer"


def _assemble(arcs: list[dict]) -> dict:
    """Single-relation assembly (kept for the pytest ports; the Spark
    kernel uses ``_chain_rings`` + batched areas). Chains, classifies,
    and computes the hole-aware area with the scalar left-to-right
    sum."""
    rings, closed_all = _chain_rings(arcs)
    _classify_rings(rings)
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
        "rings": [{"role": r["role"], "lon": r["lon"], "lat": r["lat"]} for r in rings],
        "area_m2": outer_acc - inner_acc,
        "n_outer": n_outer,
        "n_inner": len(rings) - n_outer,
        "closed": closed_all,
    }


def assemble_multipolygons(gathered: DataFrame, arcs_col: str = "arcs") -> DataFrame:
    """Adds ``mp`` (rings/area_m2/n_outer/n_inner/closed) per relation
    version via one Arrow-batched kernel. Chaining + classification run
    per relation (inherently sequential); ring AREAS batch across the
    whole Arrow batch through ``_batch_ring_areas`` (one flat numpy
    pass + ``reduceat``), eliminating the per-ring 5-element numpy
    allocations that dominated the round-2 profile."""

    @pandas_udf(RINGS_SCHEMA)
    def kernel(arc_series: pd.Series) -> pd.DataFrame:
        per_row: list[tuple[list[dict], bool]] = []
        flat_lon: list[list[int]] = []
        flat_lat: list[list[int]] = []
        ring_rows: list[int] = []  # batch-flat ring -> row index
        ring_refs: list[dict] = []
        for rowno, arcs in enumerate(arc_series):
            rings, closed_all = _chain_rings(list(arcs))
            _classify_rings(rings)
            per_row.append((rings, closed_all))
            for r in rings:
                if (r["lon"][0], r["lat"][0]) == (r["lon"][-1], r["lat"][-1]):
                    flat_lon.append(r["lon"])
                    flat_lat.append(r["lat"])
                    ring_rows.append(rowno)
                    ring_refs.append(r)
        if flat_lon:
            lens = np.array([len(v) for v in flat_lon], dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            areas = _batch_ring_areas(
                np.concatenate([np.asarray(v, dtype=np.int64) for v in flat_lon]),
                np.concatenate([np.asarray(v, dtype=np.int64) for v in flat_lat]),
                starts,
                lens,
            )
        else:
            areas = np.empty(0, dtype=np.float64)
        # per-row hole-aware sum in ring order (outer_acc - inner_acc,
        # scalar adds only — mirrors _assemble / the SQL expansion)
        outer_acc = [0.0] * len(per_row)
        inner_acc = [0.0] * len(per_row)
        for k, (rowno, r) in enumerate(zip(ring_rows, ring_refs)):
            if r["role"] == "outer":
                outer_acc[rowno] += float(areas[k])
            else:
                inner_acc[rowno] += float(areas[k])
        out = []
        for rowno, (rings, closed_all) in enumerate(per_row):
            n_outer = sum(1 for r in rings if r["role"] == "outer")
            out.append(
                {
                    "rings": [
                        {"role": r["role"], "lon": r["lon"], "lat": r["lat"]}
                        for r in rings
                    ],
                    "area_m2": outer_acc[rowno] - inner_acc[rowno],
                    "n_outer": n_outer,
                    "n_inner": len(rings) - n_outer,
                    "closed": closed_all,
                }
            )
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
