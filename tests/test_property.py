"""Property-based tests (hypothesis) for the pure kernels: grid math,
clipping, PIP — the invariants the reference's unit suites check by
enumeration (XYGridTest.java:37-190, fip/*Test), generalized to random
inputs. No SparkSession needed; these cover the same code the Column
expressions and pandas UDFs call."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oshdb_spark import grid
from oshdb_spark.operators.spatial import (
    clip_ring_convex,
    clip_segment_bbox,
    np_clip_segments,
    pip_mask,
)

lons = st.integers(min_value=-grid.LON_MAX, max_value=grid.LON_MAX)
lats = st.integers(min_value=-grid.LAT_MAX, max_value=grid.LAT_MAX)
zooms = st.integers(min_value=0, max_value=grid.MAXZOOM)


@given(zooms, lons, lats)
@settings(max_examples=300, deadline=None)
def test_cell_bounds_contain_point(zoom, lon, lat):
    cid = grid.cell_id(zoom, lon, lat)
    assert cid >= 0
    lo, la, hi, ha = grid.cell_bounds(zoom, cid)
    # border-to-NE: +180 wraps to the west column, pole clamps south —
    # those two points land in a cell that does not cover them literally
    if lon == grid.LON_MAX or lat == grid.LAT_MAX:
        return
    assert lo <= lon <= hi and la <= lat <= ha


@given(zooms, lons, lats)
@settings(max_examples=200, deadline=None)
def test_np_cell_id_matches_scalar(zoom, lon, lat):
    got = grid.np_cell_id(zoom, np.array([lon]), np.array([lat]))[0]
    assert got == grid.cell_id(zoom, lon, lat)


@given(zooms, lons, lats)
@settings(max_examples=200, deadline=None)
def test_point_cell_inside_bbox_cover(zoom, lon, lat):
    """Any point's cell must be inside the cover of any bbox containing
    the point (cover completeness, the partition-pruning soundness
    property). Points exactly at +180 deg wrap to the -180 column
    (XYGrid.java:131-134) and are excluded: a bbox ending at +180 is
    clamped east and legitimately does not cover the wrapped cell —
    querying across the antimeridian requires the split-bbox form,
    exactly as in the reference."""
    if lon == grid.LON_MAX or lat == grid.LAT_MAX:
        return
    pad_lon = min(10_000_000, grid.LON_MAX - abs(lon))
    pad_lat = min(10_000_000, grid.LAT_MAX - abs(lat))
    bbox = (lon - pad_lon, lat - pad_lat, lon + pad_lon, lat + pad_lat)
    cid = grid.cell_id(zoom, lon, lat)
    ranges = grid.bbox_cell_ranges(zoom, bbox, enlarge=False)
    assert any(s <= cid <= e for s, e in ranges if s != grid.INVALID_CELL)


@given(zooms.filter(lambda z: z >= 1), lons, lats)
@settings(max_examples=100, deadline=None)
def test_morton_parent_is_coarser_cell(zoom, lon, lat):
    x, y = grid.xy(zoom, lon, lat)
    key = grid.morton_key(zoom, x, y)
    pz, = [(key >> 56) & 0xFF]
    parent = grid.morton_parent(key)
    px, py = grid.xy(zoom - 1, lon, lat)
    # parent key equals the morton key of the zoom-1 cell — except for
    # the border/pole-clamped coordinates whose (x, y) is rule-adjusted
    if lon == grid.LON_MAX or lat == grid.LAT_MAX:
        return
    assert parent == grid.morton_key(zoom - 1, px, py)
    assert pz == zoom


coords = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@given(coords, coords, coords, coords, coords, coords)
@settings(max_examples=300, deadline=None)
def test_clip_segment_stays_in_rect_and_on_segment(x1, y1, x2, y2, cx, cy):
    rect = (cx - 5e8, cy - 5e8, cx + 5e8, cy + 5e8)
    out = clip_segment_bbox(x1, y1, x2, y2, rect)
    if out is None:
        return
    ax, ay, bx, by = out
    eps = 1e-6 * max(1.0, abs(ax), abs(bx), abs(ay), abs(by))
    assert rect[0] - eps <= ax <= rect[2] + eps
    assert rect[0] - eps <= bx <= rect[2] + eps
    assert rect[1] - eps <= ay <= rect[3] + eps
    assert rect[1] - eps <= by <= rect[3] + eps
    # clipped length never exceeds the original
    orig = np.hypot(x2 - x1, y2 - y1)
    assert np.hypot(bx - ax, by - ay) <= orig + 1e-6 * max(1.0, orig)


@given(coords, coords, coords, coords, coords, coords)
@settings(max_examples=300, deadline=None)
def test_vectorized_clip_matches_scalar(x1, y1, x2, y2, cx, cy):
    rect = (cx - 5e8, cy - 5e8, cx + 5e8, cy + 5e8)
    scalar = clip_segment_bbox(x1, y1, x2, y2, rect)
    ax, ay, bx, by, valid = np_clip_segments(
        np.array([x1]), np.array([y1]), np.array([x2]), np.array([y2]),
        np.array([rect[0]]), np.array([rect[1]]),
        np.array([rect[2]]), np.array([rect[3]]),
    )
    if scalar is None:
        assert not valid[0]
    else:
        assert valid[0]
        np.testing.assert_allclose(
            [ax[0], ay[0], bx[0], by[0]], list(scalar), rtol=1e-12, atol=1e-6
        )


@given(
    st.integers(min_value=3, max_value=9),
    st.floats(min_value=1e6, max_value=5e8, allow_nan=False),
    coords,
    coords,
    coords,
    coords,
)
@settings(max_examples=200, deadline=None)
def test_pip_on_regular_polygon_matches_radius_test(n_verts, radius, cx, cy, px, py):
    """For a regular polygon, PIP must agree with the apothem/circum
    radius bounds: strictly inside the inscribed circle => inside;
    outside the circumscribed circle => outside."""
    ang = np.linspace(0.0, 2 * np.pi, n_verts, endpoint=False)
    poly_x = cx + radius * np.cos(ang)
    poly_y = cy + radius * np.sin(ang)
    inside = pip_mask(np.array([px]), np.array([py]), poly_x, poly_y)[0]
    d = np.hypot(px - cx, py - cy)
    apothem = radius * np.cos(np.pi / n_verts)
    if d < apothem * (1 - 1e-9):
        assert inside
    elif d > radius * (1 + 1e-9):
        assert not inside


@given(coords, coords, st.floats(min_value=1e6, max_value=4e8, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_ring_clip_of_contained_square_is_identity(cx, cy, half):
    """A square fully inside the clip window survives unchanged."""
    sq_x = np.array([cx - half, cx + half, cx + half, cx - half])
    sq_y = np.array([cy - half, cy - half, cy + half, cy + half])
    win_x = np.array([cx - 3 * half, cx + 3 * half, cx + 3 * half, cx - 3 * half])
    win_y = np.array([cy - 3 * half, cy - 3 * half, cy + 3 * half, cy + 3 * half])
    ox, oy = clip_ring_convex(sq_x, sq_y, win_x, win_y)
    assert len(ox) == 4
    np.testing.assert_allclose(sorted(ox), sorted(sq_x), rtol=1e-12)
    np.testing.assert_allclose(sorted(oy), sorted(sq_y), rtol=1e-12)


# ---------------------------------------------------------------------------
# round-3 kernels: t-digest, ring chaining, batched ring areas
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1,
        max_size=400,
    ),
    st.integers(min_value=10, max_value=200),
)
@settings(max_examples=80, deadline=None)
def test_tdigest_invariants(values, delta):
    """Weight conservation, mean-range containment, sorted centroids,
    and quantile monotonicity hold for ANY input."""
    from oshdb_spark.operators.tdigest import digest_quantiles, merge_centroids

    v = np.asarray(values, dtype=np.float64)
    m, w = merge_centroids(v, np.ones_like(v), float(delta))
    assert w.sum() == np.testing.assert_allclose(w.sum(), len(v)) or True
    np.testing.assert_allclose(w.sum(), len(v))
    assert m.min() >= v.min() - 1e-9 and m.max() <= v.max() + 1e-9
    assert (np.diff(m) >= 0).all()
    qs = digest_quantiles(m, w, [0.1, 0.5, 0.9])
    assert qs[0] <= qs[1] <= qs[2]
    assert v.min() - 1e-9 <= qs[0] and qs[2] <= v.max() + 1e-9


@given(
    st.integers(min_value=3, max_value=10),
    st.integers(min_value=2, max_value=5),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_chain_rings_conserves_vertices_any_cut(n, k, rnd):
    """Cutting any simple polygon into k arcs (random cut points,
    random reversals, shuffled order, junk arc_ord) always re-chains to
    ONE closed ring with the original vertex count."""
    from oshdb_spark.operators.relations import _chain_rings

    ang = np.sort(np.array([rnd.uniform(0, 2 * np.pi) for _ in range(n)]))
    if len(set(ang)) < n:
        return
    x = (3e6 * np.cos(ang)).astype(np.int64)
    y = (3e6 * np.sin(ang)).astype(np.int64)
    ring = list(zip(x.tolist(), y.tolist()))
    if len(set(ring)) < n:
        return
    ring = ring + [ring[0]]
    k = min(k, n - 1)
    cuts = sorted(rnd.sample(range(1, n), k - 1)) if k > 1 else []
    bounds = [0] + cuts + [n]
    arcs = []
    for i in range(len(bounds) - 1):
        pts = ring[bounds[i]: bounds[i + 1] + 1]
        if rnd.random() < 0.5:
            pts = pts[::-1]
        arcs.append(
            {
                "role": rnd.choice(["outer", "inner", ""]),
                "arc_ord": rnd.randrange(100),
                "lon_arr": [p[0] for p in pts],
                "lat_arr": [p[1] for p in pts],
            }
        )
    rnd.shuffle(arcs)
    rings, closed = _chain_rings(arcs)
    assert closed and len(rings) == 1
    assert len(rings[0]["lon"]) == n + 1


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=-10**9, max_value=10**9),
                st.integers(min_value=-8 * 10**8, max_value=8 * 10**8),
            ),
            min_size=3,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=60, deadline=None)
def test_batched_ring_areas_match_scalar(rings):
    """The ragged reduceat batch equals the scalar left-to-right loop
    bit-for-bit for ANY ring set (the parity property every area oracle
    relies on)."""
    from oshdb_spark.operators.relations import (
        _batch_ring_areas,
        _ring_signed_area_m2,
    )

    closed = [r + [r[0]] for r in rings]
    lon = [np.array([p[0] for p in r], dtype=np.int64) for r in closed]
    lat = [np.array([p[1] for p in r], dtype=np.int64) for r in closed]
    lens = np.array([len(v) for v in lon], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    got = _batch_ring_areas(
        np.concatenate(lon), np.concatenate(lat), starts, lens
    )
    for i, r in enumerate(closed):
        want = abs(_ring_signed_area_m2([p[0] for p in r], [p[1] for p in r]))
        assert got[i] == want, i


@given(
    n=st.integers(min_value=4, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_chain_rings_arc_partition_invariance(n, seed, data):
    """osm-testdata generalized as a property: ANY simple star polygon,
    split into ANY arc partition of its boundary, with ANY subset of
    arcs vertex-reversed and ANY member order, must reassemble into ONE
    closed outer ring with exactly the original area and vertex count —
    the invariant behind the 7xx conformance family
    (tests/test_osm_testdata_7xx.py pins the corpus's fixed cases; this
    pins the whole input class)."""
    import numpy as np

    from oshdb_spark.operators.relations import _assemble, _ring_signed_area_m2

    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    # enforce distinct angles so the polygon is simple (star-shaped)
    if np.min(np.diff(ang, append=ang[0] + 2 * np.pi)) < 1e-3:
        ang = np.arange(n) * (2 * np.pi / n)
    r = rng.uniform(0.2, 1.0, n) * 5_000_000
    lon = np.round(r * np.cos(ang)).astype(np.int64)
    lat = np.round(r * np.sin(ang) * 0.5).astype(np.int64)
    ring_lon = list(lon) + [int(lon[0])]
    ring_lat = list(lat) + [int(lat[0])]
    # degenerate radii can collapse consecutive vertices; require a
    # genuinely simple ring for the exact-count assertion
    pts = list(zip(ring_lon[:-1], ring_lat[:-1]))
    if len(set(pts)) != len(pts):
        return
    want_area = abs(_ring_signed_area_m2(ring_lon, ring_lat))
    if want_area == 0.0:
        return

    # random partition of the closed boundary into 1..n arcs
    n_cuts = data.draw(st.integers(min_value=1, max_value=min(n, 6)))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n - 1),
                min_size=n_cuts, max_size=n_cuts, unique=True,
            )
        )
    )
    arcs = []
    for k in range(len(cuts)):
        a, b = cuts[k], cuts[(k + 1) % len(cuts)]
        idx = list(range(a, b + 1)) if a < b else list(range(a, n)) + list(
            range(0, b + 1)
        )
        al = [int(ring_lon[i]) for i in idx]
        at = [int(ring_lat[i]) for i in idx]
        if data.draw(st.booleans()):
            al, at = al[::-1], at[::-1]
        arcs.append({"role": "outer", "arc_ord": k, "lon_arr": al, "lat_arr": at})
    perm = data.draw(st.permutations(range(len(arcs))))
    arcs = [dict(arcs[i], arc_ord=j) for j, i in enumerate(perm)]

    out = _assemble(arcs)
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 0
    assert out["area_m2"] == pytest.approx(want_area, rel=1e-12)
    ring = out["rings"][0]
    assert len(ring["lon"]) == n + 1  # original vertices, closed once


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_chain_rings_hole_classification_invariance(seed, data):
    """Shell + hole under the same arc-partition invariance: a star
    polygon containing a scaled-down copy as its hole must classify
    1 outer / 1 inner with area = shell - hole for ANY arc split,
    reversal and member order, and REGARDLESS of stored roles (the
    classifier is geometric; roles are only tie-break hints)."""
    import numpy as np

    from oshdb_spark.operators.relations import _assemble, _ring_signed_area_m2

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 14))
    ang = np.arange(n) * (2 * np.pi / n) + rng.uniform(0, 0.2)
    r = rng.uniform(0.5, 1.0, n) * 8_000_000
    lon = np.round(r * np.cos(ang)).astype(np.int64)
    lat = np.round(r * np.sin(ang) * 0.5).astype(np.int64)
    hole_lon = np.round(lon * 0.3).astype(np.int64)
    hole_lat = np.round(lat * 0.3).astype(np.int64)

    def ring_of(xs, ys):
        return [int(v) for v in xs] + [int(xs[0])], [int(v) for v in ys] + [int(ys[0])]

    sl, st_ = ring_of(lon, lat)
    hl, ht = ring_of(hole_lon, hole_lat)
    pts = list(zip(sl[:-1], st_[:-1])) + list(zip(hl[:-1], ht[:-1]))
    if len(set(pts)) != len(pts):
        return
    want = abs(_ring_signed_area_m2(sl, st_)) - abs(_ring_signed_area_m2(hl, ht))
    if want <= 0.0:
        return

    def split(lon_ring, lat_ring, role, base_ord):
        m = len(lon_ring) - 1
        k = data.draw(st.integers(min_value=1, max_value=min(3, m)))
        cuts = sorted(data.draw(st.lists(
            st.integers(min_value=0, max_value=m - 1),
            min_size=k, max_size=k, unique=True)))
        out = []
        for j in range(len(cuts)):
            a, b = cuts[j], cuts[(j + 1) % len(cuts)]
            idx = list(range(a, b + 1)) if a < b else list(range(a, m)) + list(range(0, b + 1))
            al = [lon_ring[i] for i in idx]
            at = [lat_ring[i] for i in idx]
            if data.draw(st.booleans()):
                al, at = al[::-1], at[::-1]
            out.append({"role": role, "arc_ord": base_ord + j,
                        "lon_arr": al, "lat_arr": at})
        return out

    # deliberately scramble roles: classification must not depend on them
    role_shell = data.draw(st.sampled_from(["outer", "inner", ""]))
    role_hole = data.draw(st.sampled_from(["outer", "inner", ""]))
    arcs = split(sl, st_, role_shell, 0) + split(hl, ht, role_hole, 10)
    perm = data.draw(st.permutations(range(len(arcs))))
    arcs = [dict(arcs[i], arc_ord=j) for j, i in enumerate(perm)]

    out = _assemble(arcs)
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 1
    assert out["area_m2"] == pytest.approx(want, rel=1e-12)
