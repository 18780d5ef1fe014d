"""Equal-degree multi-zoom grid index (XYGrid / XYGridTree / ZGrid analog).

Reimplements — from scratch, in exact integer arithmetic — the cell
math of the reference engine:

* point -> cell id per zoom, with border-to-NE, +180 wrap and
  north-pole clamp semantics (reference: ``oshdb/.../index/XYGrid.java:110-147``)
* cell id layout ``cell = y * 2^zoom + x`` with ``2^zoom`` columns and
  ``2^(zoom-1)`` rows of equal degree width (``XYGrid.java:96-107``)
* bbox -> cell-id ranges incl. antimeridian split, out-of-bounds
  sentinel and the ``enlarge`` one-cell-SW expansion
  (``XYGrid.java:292-371``)
* insert-level rule: deepest zoom whose estimated cell count for a
  bbox is <= 2, anchored at the bbox SW corner
  (``XYGridTree.java:89-97``, ``XYGrid.java:203-214``)
* Morton/Z-order prefix key with zoom in the top byte — the
  hierarchical H3/S2-style partition key (``oshdb-tool/etl/.../util/ZGrid.java:31-75``)

Where the reference uses double division by ``cellWidth`` we use exact
rational floor arithmetic ``(v * 2^zoom) // 3_600_000_000`` — identical
for every representable fixed-point coordinate except double-ulp border
cases, and stable across Python / numpy / Spark SQL / DuckDB, which is
what the cross-engine oracle checks require.

Three implementations of the same math live here on purpose:

* plain Python — driver-side cover generation + frozen test vectors
* numpy — vectorized kernels inside Arrow-batched pandas UDFs
* pyspark ``Column`` expressions — the hot path; stays inside
  whole-stage codegen, no Python at all
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:  # Column builders are optional so the oracle can import this file without a JVM
    from pyspark.sql import Column
    from pyspark.sql import functions as F
except Exception:  # pragma: no cover
    Column = None
    F = None

PREC = 10_000_000  # fixed-point: degrees * 1e7 (reference OSHDB.java:8)
MAXZOOM = 15  # reference OSHDB.java:5
WORLD_LON = 360 * PREC  # 3_600_000_000
WORLD_LAT = 180 * PREC  # 1_800_000_000
LON_MAX = 180 * PREC
LAT_MAX = 90 * PREC

INVALID_CELL = -1


# ---------------------------------------------------------------------------
# plain-Python core (exact semantics, used by tests + driver-side covers)
# ---------------------------------------------------------------------------

def xy(zoom: int, lon_e7: int, lat_e7: int) -> tuple[int, int]:
    """(column, row) of the cell containing a fixed-point coordinate.

    Border coordinates go to the northern/eastern cell; +180 deg wraps to
    the westernmost column; the north pole is clamped into the
    northernmost row (XYGrid.java:110-147 semantics).
    """
    if lon_e7 > LON_MAX or lon_e7 < -LON_MAX or lat_e7 > LAT_MAX or lat_e7 < -LAT_MAX:
        return (-1, -1)
    lon = lon_e7 + LON_MAX
    lat = lat_e7 + LAT_MAX
    if lon == WORLD_LON:  # +180 wraps to -180
        lon = 0
    if lat == WORLD_LAT:  # north pole clamp
        lat -= 1
    x = (lon << zoom) // WORLD_LON
    y = (lat << zoom) // WORLD_LON  # same cell width in both axes
    return (x, y)


def cell_id(zoom: int, lon_e7: int, lat_e7: int) -> int:
    """Cell id ``y * 2^zoom + x`` (or -1 outside the coordinate range)."""
    x, y = xy(zoom, lon_e7, lat_e7)
    if x < 0:
        return INVALID_CELL
    return y * (1 << zoom) + x


def pack_cell(zoom: int, cid: int) -> int:
    """One-long cell key ``zoom << 56 | id`` (CellId.java:36-48 layout)."""
    return (zoom << 56) | cid


def unpack_cell(packed: int) -> tuple[int, int]:
    return (packed >> 56) & 0xFF, packed & ((1 << 56) - 1)


def cell_bounds(zoom: int, cid: int) -> tuple[int, int, int, int]:
    """(min_lon, min_lat, max_lon, max_lat) fixed-point bbox of a cell.

    Northernmost row extends to the pole; max edges are inclusive
    (one fixed-point unit below the next cell's min), matching
    ``XYGrid.getCellDimensions`` (XYGrid.java:175-199).
    """
    n = 1 << zoom
    x = cid % n
    y = cid // n
    min_lon = (x * WORLD_LON) // n - LON_MAX
    min_lat = (y * WORLD_LON) // n - LAT_MAX
    max_lon = ((x + 1) * WORLD_LON) // n - LON_MAX - 1
    if zoom == 0:
        return (min_lon, -LAT_MAX, max_lon, LAT_MAX)
    if y == (1 << (zoom - 1)) - 1:  # top row reaches the pole
        return (min_lon, min_lat, max_lon, LAT_MAX)
    max_lat = ((y + 1) * WORLD_LON) // n - LAT_MAX - 1
    return (min_lon, min_lat, max_lon, max_lat)


def _floordiv(a: int, num: int, den: int) -> int:
    return (a * num) // den


def _ceildiv(a: int, num: int, den: int) -> int:
    return -((-a * num) // den)


def estimated_id_count(zoom: int, bbox: tuple[int, int, int, int]) -> int:
    """Cell-count estimate of a bbox at one zoom (XYGrid.java:203-214):
    ``max(ceil(maxLon/w) - floor(minLon/w), ceil(maxLat/w) - floor(minLat/w))``
    computed on raw signed fixed-point coords."""
    min_lon, min_lat, max_lon, max_lat = bbox
    n = 1 << zoom
    return max(
        _ceildiv(max_lon, n, WORLD_LON) - _floordiv(min_lon, n, WORLD_LON),
        _ceildiv(max_lat, n, WORLD_LON) - _floordiv(min_lat, n, WORLD_LON),
    )


def insert_cell(bbox: tuple[int, int, int, int], maxzoom: int = MAXZOOM) -> tuple[int, int]:
    """(zoom, cell_id) where an extended feature is stored: the deepest
    zoom whose estimate is <= 2, anchored at the SW corner
    (XYGridTree.java:89-97)."""
    min_lon, min_lat, _, _ = bbox
    for z in range(maxzoom, -1, -1):
        if estimated_id_count(z, bbox) <= 2:
            return z, cell_id(z, min_lon, min_lat)
    return 0, cell_id(0, min_lon, min_lat)


def bbox_cell_ranges(
    zoom: int, bbox: tuple[int, int, int, int], enlarge: bool = False
) -> set[tuple[int, int]]:
    """Set of inclusive (start, end) cell-id ranges intersecting a bbox.

    Replicates XYGrid.java:292-371: out-of-range edges are clamped and
    flagged with the (-1, -1) sentinel range, a bbox crossing the
    antimeridian is split in two, and ``enlarge`` extends the cover one
    cell to the south-west (never across the antimeridian) so features
    anchored in the lower-left neighbour cell are caught.
    """
    min_lon, min_lat, max_lon, max_lat = bbox
    result: set[tuple[int, int]] = set()
    if min_lat > max_lat:
        return result
    if min_lon < -LON_MAX or min_lon > LON_MAX:
        result.add((INVALID_CELL, INVALID_CELL))
        min_lon = -LON_MAX
    if min_lat < -LAT_MAX or min_lat > LAT_MAX:
        result.add((INVALID_CELL, INVALID_CELL))
        min_lat = -LAT_MAX
    if max_lon > LON_MAX or max_lon < -LON_MAX:
        result.add((INVALID_CELL, INVALID_CELL))
        max_lon = LON_MAX
    if max_lat > LAT_MAX or max_lat < -LAT_MAX:
        result.add((INVALID_CELL, INVALID_CELL))
        max_lat = LAT_MAX

    if min_lon == LON_MAX:
        min_lon = LON_MAX - 1
    if max_lon == LON_MAX:
        max_lon = LON_MAX - 1
    if min_lat == LAT_MAX:
        min_lat = LAT_MAX - 1
    if max_lat == LAT_MAX:
        max_lat = LAT_MAX - 1

    if min_lon > max_lon:  # antimeridian crossing: split east part off
        result |= bbox_cell_ranges(zoom, (min_lon, min_lat, LON_MAX - 1, max_lat), enlarge)
        min_lon = -LON_MAX

    n = 1 << zoom
    colmin = ((min_lon + LON_MAX) * n) // WORLD_LON
    colmax = ((max_lon + LON_MAX) * n) // WORLD_LON
    rowmin = ((min_lat + LAT_MAX) * n) // WORLD_LON
    rowmax = ((max_lat + LAT_MAX) * n) // WORLD_LON
    if enlarge:
        if colmin > 0:
            colmin -= 1
        if rowmin > 0:
            rowmin -= 1
    for row in range(rowmin, rowmax + 1):
        result.add((row * n + colmin, row * n + colmax))
    return result


def bbox_cover_cells(
    bbox: tuple[int, int, int, int],
    enlarge: bool = True,
    maxzoom: int = MAXZOOM,
) -> list[tuple[int, int]]:
    """All (zoom, cell_id) pairs a query over ``bbox`` must scan —
    every zoom level 0..maxzoom (XYGridTree.java:219-248 query rule).
    Used to build the partition-pruning predicate."""
    cells: list[tuple[int, int]] = []
    for z in range(maxzoom + 1):
        for start, end in bbox_cell_ranges(z, bbox, enlarge):
            if start == INVALID_CELL:
                continue
            cells.extend((z, c) for c in range(start, end + 1))
    return cells


def neighbours(zoom: int, cid: int) -> set[tuple[int, int]]:
    """Cell-id ranges of the 3x3 neighbourhood (the ring-1 primitive,
    XYGrid.java:381-395): the cell bbox padded by one fixed-point unit,
    run through ``bbox_cell_ranges``."""
    min_lon, min_lat, max_lon, max_lat = cell_bounds(zoom, cid)
    return bbox_cell_ranges(zoom, (min_lon - 1, min_lat - 1, max_lon + 1, max_lat + 1), False)


def ring_cells(zoom: int, cid: int, ring: int) -> set[int]:
    """Cells at Chebyshev distance <= ring from ``cid`` (kNN candidate
    expansion). Ring 1 equals the reference's getNeighbours cover; higher
    rings generalize it. Wraps in longitude, clamps in latitude."""
    n = 1 << zoom
    rows = 1 << (zoom - 1) if zoom > 0 else 1
    x0, y0 = cid % n, cid // n
    out: set[int] = set()
    for dy in range(-ring, ring + 1):
        y = y0 + dy
        if y < 0 or y >= rows:
            continue
        for dx in range(-ring, ring + 1):
            out.add(y * n + (x0 + dx) % n)
    return out


# ---------------------------------------------------------------------------
# Morton / Z-order partition key (ZGrid analog)
# ---------------------------------------------------------------------------

def _part1by1(v: int) -> int:
    v &= 0x0000_0000_FFFF_FFFF
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def morton_key(zoom: int, x: int, y: int) -> int:
    """Hierarchical prefix key: zoom in the top byte, interleaved x/y bits
    below (ZGrid.java:31-75 layout idea). ``parent(key) = ((key & MASK) >> 2)``
    with zoom-1 — prefix-hierarchical like H3/S2 cell ids, so range
    predicates on the key prune whole subtrees."""
    return (zoom << 56) | (_part1by1(x) | (_part1by1(y) << 1))


def morton_parent(key: int) -> int:
    zoom = (key >> 56) & 0xFF
    if zoom == 0:
        return key
    return ((zoom - 1) << 56) | ((key & ((1 << 56) - 1)) >> 2)


# ---------------------------------------------------------------------------
# numpy vectorized (for pandas-UDF kernels)
# ---------------------------------------------------------------------------

def np_cell_id(zoom: int, lon_e7: np.ndarray, lat_e7: np.ndarray) -> np.ndarray:
    """Vectorized ``cell_id`` over int64 fixed-point arrays."""
    lon = lon_e7.astype(np.int64) + LON_MAX
    lat = lat_e7.astype(np.int64) + LAT_MAX
    lon = np.where(lon == WORLD_LON, 0, lon)
    lat = np.where(lat == WORLD_LAT, lat - 1, lat)
    x = (lon << zoom) // WORLD_LON
    y = (lat << zoom) // WORLD_LON
    out = y * (1 << zoom) + x
    bad = (lon < 0) | (lon > WORLD_LON) | (lat < 0) | (lat > WORLD_LAT)
    return np.where(bad, INVALID_CELL, out)


# ---------------------------------------------------------------------------
# Spark Column expressions (JVM-side, codegen'd — the hot path)
# ---------------------------------------------------------------------------

def cell_id_col(zoom: int, lon_e7: "Column", lat_e7: "Column") -> "Column":
    """Cell id as a pure Column expression: two shifts, two integer
    divisions, no UDF. `div` floor-divides positives, so border points
    land NE exactly like the reference."""
    lon = lon_e7 + F.lit(LON_MAX)
    lat = lat_e7 + F.lit(LAT_MAX)
    lon = F.when(lon == F.lit(WORLD_LON), F.lit(0)).otherwise(lon)
    lat = F.when(lat == F.lit(WORLD_LAT), lat - F.lit(1)).otherwise(lat)
    n = F.lit(1 << zoom)
    # double division is exact-enough here: products stay < 2^47 and the
    # closest true quotient to an integer boundary is 1/3.6e9, ~40x the
    # max double rounding error, so floor never crosses a boundary
    x = F.floor((lon * n) / F.lit(float(WORLD_LON))).cast("long")
    y = F.floor((lat * n) / F.lit(float(WORLD_LON))).cast("long")
    return y * n + x


def cell_xy_cols(zoom: int, lon_e7: "Column", lat_e7: "Column") -> tuple["Column", "Column"]:
    """(x, y) tile coordinates as Column expressions (for tiles.py)."""
    lon = lon_e7 + F.lit(LON_MAX)
    lat = lat_e7 + F.lit(LAT_MAX)
    lon = F.when(lon == F.lit(WORLD_LON), F.lit(0)).otherwise(lon)
    lat = F.when(lat == F.lit(WORLD_LAT), lat - F.lit(1)).otherwise(lat)
    n = F.lit(1 << zoom)
    x = F.floor((lon * n) / F.lit(float(WORLD_LON))).cast("long")
    y = F.floor((lat * n) / F.lit(float(WORLD_LON))).cast("long")
    return x, y


def insert_level_cols(
    min_lon: "Column", min_lat: "Column", max_lon: "Column", max_lat: "Column",
    maxzoom: int = MAXZOOM,
) -> tuple["Column", "Column"]:
    """(zoom, cell_id) storage assignment of a bbox as pure Column
    expressions — the insert-level rule (deepest zoom with estimated
    cell count <= 2, anchored at the SW corner; ``XYGridTree.java:89-97``,
    estimate ``XYGrid.java:203-214``) for the whole table at once.

    Double division is exact-enough for the same reason as
    ``cell_id_col``: products stay < 2^47 and the closest quotient to an
    integer boundary is 1/3.6e9, orders of magnitude above double ulp.
    """
    W = float(WORLD_LON)

    def fdiv(c, n):
        return F.floor((c * n) / F.lit(W)).cast("long")

    def cdiv(c, n):
        return (-F.floor((-c * n) / F.lit(W))).cast("long")

    zoom_expr = None
    for z in range(maxzoom, -1, -1):
        n = F.lit(1 << z)
        est = F.greatest(
            cdiv(max_lon, n) - fdiv(min_lon, n),
            cdiv(max_lat, n) - fdiv(min_lat, n),
        )
        cond = est <= 2
        zoom_expr = (
            F.when(cond, F.lit(z)) if zoom_expr is None else zoom_expr.when(cond, F.lit(z))
        )
    zoom = zoom_expr.otherwise(F.lit(0))
    # shiftleft needs a literal bit count; pow is exact for 2^0..2^15
    nz = F.pow(F.lit(2.0), zoom.cast("double")).cast("long")
    lon = min_lon + F.lit(LON_MAX)
    lat = min_lat + F.lit(LAT_MAX)
    lon = F.when(lon == F.lit(WORLD_LON), F.lit(0)).otherwise(lon)
    lat = F.when(lat == F.lit(WORLD_LAT), lat - F.lit(1)).otherwise(lat)
    x = F.floor((lon * nz) / F.lit(W)).cast("long")
    y = F.floor((lat * nz) / F.lit(W)).cast("long")
    return zoom, y * nz + x


@dataclass(frozen=True)
class BBox:
    """Fixed-point bounding box helper."""

    min_lon: int
    min_lat: int
    max_lon: int
    max_lat: int

    @classmethod
    def of_degrees(cls, min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> "BBox":
        return cls(
            int(round(min_lon * PREC)),
            int(round(min_lat * PREC)),
            int(round(max_lon * PREC)),
            int(round(max_lat * PREC)),
        )

    def as_tuple(self) -> tuple[int, int, int, int]:
        return (self.min_lon, self.min_lat, self.max_lon, self.max_lat)

    def contains(self, lon_e7: int, lat_e7: int) -> bool:
        return (
            self.min_lon <= lon_e7 <= self.max_lon
            and self.min_lat <= lat_e7 <= self.max_lat
        )
