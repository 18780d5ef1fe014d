"""Grid-index unit vectors, porting the expectation style of the
reference's XYGridTest.java:37-190 / XYGridTreeTest.java:20-95
(border→NE, +180 wrap, pole clamp, insert-level rule, bbox ranges)."""

from __future__ import annotations

import numpy as np
import pytest

from oshdb_spark import grid

E7 = grid.PREC


@pytest.mark.parametrize(
    "zoom,lon,lat,expected",
    [
        # zoom 0: single-cell world
        (0, 0.0, 0.0, 0),
        (0, -180.0, -90.0, 0),
        (0, 180.0, 90.0, 0),  # wrap + clamp
        # zoom 1: 2 cols x 1 row, cell width 180 deg
        (1, -180.0, 0.0, 0),
        (1, -0.0000001, 0.0, 0),
        (1, 0.0, 0.0, 1),  # border goes east
        (1, 180.0, 0.0, 0),  # +180 wraps to column 0
        # zoom 2: 4 cols x 2 rows, width 90 deg
        (2, -180.0, -90.0, 0),
        (2, -90.0, -90.0, 1),  # lon border -> east cell
        (2, 0.0, 0.0, 6),  # both borders -> NE cell
        (2, 179.9999999, 89.9999999, 7),
        (2, 0.0, 90.0, 6),  # north pole clamps into top row
        (2, 180.0, 90.0, 4),  # wrap + clamp -> top row, column 0
    ],
)
def test_point_cell(zoom, lon, lat, expected):
    assert grid.cell_id(zoom, int(round(lon * E7)), int(round(lat * E7))) == expected


def test_out_of_range_is_invalid():
    assert grid.cell_id(3, 181 * E7, 0) == grid.INVALID_CELL
    assert grid.cell_id(3, 0, 91 * E7) == grid.INVALID_CELL


def test_np_cell_id_matches_scalar():
    rng = np.random.default_rng(42)
    lon = rng.integers(-180 * E7, 180 * E7, 500)
    lat = rng.integers(-90 * E7, 90 * E7, 500)
    for zoom in (0, 1, 5, 12, 15):
        vec = grid.np_cell_id(zoom, lon, lat)
        for i in range(0, 500, 37):
            assert vec[i] == grid.cell_id(zoom, int(lon[i]), int(lat[i]))


def test_cell_bounds_roundtrip():
    for zoom in (1, 3, 7):
        n = 1 << zoom
        rows = 1 << (zoom - 1)
        for cid in [0, n - 1, n * rows - 1, (rows // 2) * n + n // 2]:
            lo, la, hi, ha = grid.cell_bounds(zoom, cid)
            assert grid.cell_id(zoom, lo, la) == cid
            assert grid.cell_id(zoom, hi, min(ha, 90 * E7)) == cid


def test_insert_level_rule():
    # tiny bbox -> deepest zoom; hemisphere-wide bbox -> low zoom
    z, cid = grid.insert_cell((0, 0, 10, 10))
    assert z == grid.MAXZOOM
    z2, _ = grid.insert_cell((-90 * E7, -45 * E7, 90 * E7, 45 * E7))
    assert z2 <= 2
    # estimate <= 2 must hold at the chosen level
    bbox = (5 * E7, 5 * E7, 17 * E7, 6 * E7)
    z3, cid3 = grid.insert_cell(bbox)
    assert grid.estimated_id_count(z3, bbox) <= 2
    assert grid.estimated_id_count(z3 + 1, bbox) > 2
    # anchored at SW corner
    assert cid3 == grid.cell_id(z3, bbox[0], bbox[1])


def test_bbox_ranges_basic_and_enlarge():
    bbox = (-1 * E7, -1 * E7, 1 * E7, 1 * E7)
    plain = grid.bbox_cell_ranges(2, bbox, enlarge=False)
    # spans columns 1-2, rows 0-1 at zoom 2
    assert plain == {(1, 2), (5, 6)}
    enlarged = grid.bbox_cell_ranges(2, bbox, enlarge=True)
    assert enlarged == {(0, 2), (4, 6)}


def test_bbox_ranges_antimeridian_split():
    bbox = (170 * E7, 0, -170 * E7, 10 * E7)  # crosses the dateline
    ranges = grid.bbox_cell_ranges(2, bbox, enlarge=False)
    cells = set()
    for s, e in ranges:
        cells.update(range(s, e + 1))
    assert 7 in cells and 4 in cells  # east edge + wrapped west edge


def test_out_of_bounds_sentinel():
    ranges = grid.bbox_cell_ranges(1, (-200 * E7, 0, 0, 10 * E7), enlarge=False)
    assert (grid.INVALID_CELL, grid.INVALID_CELL) in ranges


def test_neighbours_ring():
    # interior cell at zoom 3 (8x4): 3x3 block
    cells = set()
    for s, e in grid.neighbours(3, 9 + 2):  # row 1, col 3
        cells.update(range(s, e + 1))
    assert cells == {2, 3, 4, 10, 11, 12, 18, 19, 20}
    assert grid.ring_cells(3, 11, 1) == {2, 3, 4, 10, 11, 12, 18, 19, 20}


def test_ring_wraps_longitude():
    cells = grid.ring_cells(3, 8, 1)  # row 1, col 0 -> wraps to col 7
    assert {0, 1, 7, 8, 9, 15, 16, 17, 23} == cells


def test_morton_prefix_hierarchy():
    k = grid.morton_key(4, 5, 3)
    p = grid.morton_parent(k)
    assert (p >> 56) == 3
    assert p == grid.morton_key(3, 2, 1)  # x//2, y//2


def test_pack_unpack():
    packed = grid.pack_cell(12, 34567)
    assert grid.unpack_cell(packed) == (12, 34567)


def test_insert_level_cols_match_python(spark):
    """The Column-expression insert rule must equal the scalar
    ``insert_cell`` on randomized bboxes (seeded)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for _ in range(300):
        lon = rng.randrange(-grid.LON_MAX, grid.LON_MAX - 1)
        lat = rng.randrange(-grid.LAT_MAX, grid.LAT_MAX - 1)
        w = rng.choice([0, 1, 10_000, 1_000_000, 50_000_000, 900_000_000])
        h = rng.choice([0, 1, 10_000, 1_000_000, 50_000_000, 400_000_000])
        rows.append(
            (lon, lat, min(lon + w, grid.LON_MAX), min(lat + h, grid.LAT_MAX))
        )
    df = spark.createDataFrame(
        rows, "min_lon long, min_lat long, max_lon long, max_lat long"
    )
    zoom, cell = grid.insert_level_cols(
        F.col("min_lon"), F.col("min_lat"), F.col("max_lon"), F.col("max_lat")
    )
    got = df.select(
        "min_lon", "min_lat", "max_lon", "max_lat", zoom.alias("z"), cell.alias("c")
    ).collect()
    for r in got:
        ez, ec = grid.insert_cell(
            (r["min_lon"], r["min_lat"], r["max_lon"], r["max_lat"])
        )
        assert (r["z"], r["c"]) == (ez, ec), r
