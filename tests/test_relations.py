"""Multipolygon ring assembly: endpoint chaining, arc reversal, shell
partitioning, holes, and degenerate (unclosed) members — the pytest
ports of the reference's relation-geometry cases
(oshdb-util/src/test/.../geometry/relations/)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.relations import _assemble, _ring_signed_area_m2


def _arc(role, idx, pts):
    return {
        "role": role,
        "arc_ord": idx,
        "lon_arr": [p[0] for p in pts],
        "lat_arr": [p[1] for p in pts],
    }


RECT = [(0, 0), (4_000_000, 0), (4_000_000, 3_000_000), (0, 3_000_000)]
SW, SE, NE, NW = RECT


def test_two_arcs_with_reversal_close_one_ring():
    arcs = [
        _arc("outer", 0, [SW, SE, NE]),
        _arc("outer", 1, [SW, NW, NE]),  # stored reversed
    ]
    out = _assemble(arcs)
    assert out["closed"] and out["n_outer"] == 1 and out["n_inner"] == 0
    ring = out["rings"][0]
    assert (ring["lon"][0], ring["lat"][0]) == (ring["lon"][-1], ring["lat"][-1])
    assert len(ring["lon"]) == 5
    # the full vertex cycle: SW,SE,NE,NW,SW (arc B consumed in reverse)
    assert list(zip(ring["lon"], ring["lat"])) == [SW, SE, NE, NW, SW]


def test_assembly_is_order_invariant():
    arcs = [
        _arc("outer", 0, [SW, SE, NE]),
        _arc("outer", 1, [SW, NW, NE]),
    ]
    shuffled = list(reversed(arcs))
    a, b = _assemble(arcs), _assemble(shuffled)
    assert a["area_m2"] == b["area_m2"]
    assert [r["role"] for r in a["rings"]] == [r["role"] for r in b["rings"]]


def test_three_arc_ring():
    arcs = [
        _arc("outer", 0, [SW, SE]),
        _arc("outer", 1, [SE, NE, NW]),
        _arc("outer", 2, [NW, SW]),
    ]
    out = _assemble(arcs)
    assert out["closed"] and out["n_outer"] == 1
    assert len(out["rings"][0]["lon"]) == 5


def test_two_disjoint_shells_partition_into_two_rings():
    shift = 10_000_000
    rect2 = [(x + shift, y) for x, y in RECT]
    arcs = [
        _arc("outer", 0, [SW, SE, NE]),
        _arc("outer", 1, [SW, NW, NE]),
        _arc("outer", 0, [rect2[0], rect2[1], rect2[2]]),
        _arc("outer", 1, [rect2[0], rect2[3], rect2[2]]),
    ]
    out = _assemble(arcs)
    assert out["closed"] and out["n_outer"] == 2
    # both shells are the same rectangle size -> double the single area
    single = _assemble(arcs[:2])["area_m2"]
    assert out["area_m2"] == pytest.approx(2 * single, rel=1e-9)


def test_hole_subtracts_area():
    inner = [(1_000_000, 750_000), (3_000_000, 750_000),
             (3_000_000, 2_250_000), (1_000_000, 2_250_000)]
    arcs = [
        _arc("outer", 0, [SW, SE, NE]),
        _arc("outer", 1, [SW, NW, NE]),
        _arc("inner", 0, [inner[0], inner[1], inner[2]]),
        _arc("inner", 1, [inner[0], inner[3], inner[2]]),
    ]
    out = _assemble(arcs)
    assert out["n_outer"] == 1 and out["n_inner"] == 1
    shell_only = _assemble(arcs[:2])["area_m2"]
    assert 0 < out["area_m2"] < shell_only


def test_unclosed_member_flags_and_contributes_nothing():
    arcs = [
        _arc("outer", 0, [SW, SE, NE]),  # missing the closing arc
    ]
    out = _assemble(arcs)
    assert not out["closed"]
    assert out["area_m2"] == 0.0


def test_ring_orientation_does_not_change_area():
    cw = [SW, NW, NE, SE, SW]  # clockwise closed ring
    ccw = [SW, SE, NE, NW, SW]
    a_cw = abs(_ring_signed_area_m2([p[0] for p in cw], [p[1] for p in cw]))
    a_ccw = abs(_ring_signed_area_m2([p[0] for p in ccw], [p[1] for p in ccw]))
    assert a_cw == pytest.approx(a_ccw, rel=1e-12)
    # signs are opposite (signed C-D area)
    s_cw = _ring_signed_area_m2([p[0] for p in cw], [p[1] for p in cw])
    s_ccw = _ring_signed_area_m2([p[0] for p in ccw], [p[1] for p in ccw])
    assert s_cw * s_ccw < 0


def test_fixture_assembly_end_to_end(spark, sf_dir):
    """The derived fixture: every relation version assembles closed,
    with 2 shells exactly when rel_id % 3 == 0, and positive area."""
    from oshdb_spark.operators.relations import (
        assemble_multipolygons,
        collect_member_arcs,
    )
    from oshdb_spark.sources.relations import SECOND_SHELL_MOD, derive_relation_members

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    m = derive_relation_members(ev).filter(F.col("version") <= 3)
    mp = assemble_multipolygons(collect_member_arcs(m)).select(
        "rel_id", "version", "mp.*"
    )
    pdf = mp.toPandas()
    assert (pdf["closed"]).all()
    assert (pdf["n_inner"] == 1).all()
    assert (pdf["area_m2"] > 0).all()
    two = pdf[pdf.rel_id % SECOND_SHELL_MOD == 0]
    one = pdf[pdf.rel_id % SECOND_SHELL_MOD != 0]
    assert (two["n_outer"] == 2).all() and (one["n_outer"] == 1).all()


# ---------------------------------------------------------------------------
# property tests: random polygons through assembly / triangulation
# ---------------------------------------------------------------------------

def _random_simple_polygon(rng, n):
    """Star-shaped simple polygon: angle-sorted vertices on noisy radii
    (always non-self-intersecting)."""
    import numpy as np

    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(2_000_000, 9_000_000, n)
    x = (rad * np.cos(ang)).astype(np.int64)
    y = (rad * np.sin(ang)).astype(np.int64)
    return x, y


def test_assembly_recovers_random_polygons_from_shuffled_reversed_arcs():
    """Split random simple polygons into k arcs, shuffle and randomly
    reverse them: assembly must recover one closed ring with the same
    vertex cycle (up to rotation/direction) and the same C-D area."""
    import numpy as np

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(5, 12))
        x, y = _random_simple_polygon(rng, n)
        ring = list(zip(x.tolist(), y.tolist())) + [(int(x[0]), int(y[0]))]
        # cut the closed ring at k random positions into arcs
        k = int(rng.integers(2, min(5, n)))
        cuts = sorted(rng.choice(np.arange(1, n), size=k - 1, replace=False).tolist())
        bounds = [0] + cuts + [n]
        arcs = []
        for i in range(len(bounds) - 1):
            pts = ring[bounds[i]: bounds[i + 1] + 1]
            if rng.random() < 0.5:
                pts = pts[::-1]
            arcs.append(
                {
                    "role": "outer",
                    "arc_ord": int(rng.integers(0, 100)),
                    "lon_arr": [p[0] for p in pts],
                    "lat_arr": [p[1] for p in pts],
                }
            )
        rng.shuffle(arcs)
        out = _assemble(arcs)
        assert out["closed"], trial
        assert out["n_outer"] == 1, trial
        got = out["rings"][0]
        assert len(got["lon"]) == n + 1, trial
        expect_area = abs(
            _ring_signed_area_m2([p[0] for p in ring], [p[1] for p in ring])
        )
        assert out["area_m2"] == pytest.approx(expect_area, rel=1e-9), trial


def test_ear_clip_random_polygons_partition_area():
    import numpy as np

    from oshdb_spark.operators.spatial import ear_clip_triangles

    rng = np.random.default_rng(23)
    for trial in range(20):
        n = int(rng.integers(4, 14))
        x, y = _random_simple_polygon(rng, n)
        px, py = x.astype(float), y.astype(float)
        tris = ear_clip_triangles(px, py)
        assert len(tris) == n - 2, trial

        def shoelace(a, b):
            return 0.5 * float(np.sum(a * np.roll(b, -1) - np.roll(a, -1) * b))

        tri_sum = sum(shoelace(tx, ty) for tx, ty in tris)
        assert tri_sum == pytest.approx(abs(shoelace(px, py)), rel=1e-9), trial


def test_relation_docs_roundtrip_preserves_assembly(spark, sf_dir):
    """Relations complete the interleaved-doc graft (ring: spans): the
    encode -> decode round trip feeds assembly to the SAME rings and
    areas as the direct member table, for every (rel, version)."""
    from oshdb_spark.operators.relations import (
        assemble_multipolygons,
        collect_member_arcs,
    )
    from oshdb_spark.sources.relations import (
        derive_relation_members,
        docs_to_relation_members,
        relations_to_docs,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = derive_relation_members(ev).filter(F.col("version") <= 4)
    decoded = docs_to_relation_members(relations_to_docs(direct))

    def result(members):
        mp = assemble_multipolygons(collect_member_arcs(members))
        return {
            (r["rel_id"], r["version"]): (
                r["mp"]["n_outer"], r["mp"]["n_inner"],
                r["mp"]["closed"], round(r["mp"]["area_m2"], 6),
            )
            for r in mp.select("rel_id", "version", "mp").collect()
        }

    a, b = result(direct), result(decoded)
    assert a == b and len(a) > 0
    # validity intervals survive the round trip too — only interior
    # versions compare (the encode saw versions <= 4, so the original
    # valid_to of version 4 points outside the encoded subset)
    want = {
        (r["rel_id"], r["version"]): r["valid_to"]
        for r in direct.filter(F.col("version") <= 3)
        .select("rel_id", "version", "valid_to")
        .distinct()
        .collect()
    }
    got = {
        (r["rel_id"], r["version"]): r["valid_to"]
        for r in decoded.filter(F.col("version") <= 3)
        .select("rel_id", "version", "valid_to")
        .distinct()
        .collect()
    }
    assert want == got


# ---------------------------------------------------------------------------
# geometric shell/hole classification (role-blind assembly)
# ---------------------------------------------------------------------------
# Real OSM relations carry wrong or empty roles; the reference chains
# members role-blind and classifies rings geometrically
# (OSHDBGeometryBuilder.java:260-308). These cases pin that behavior.

INNER = [(1_000_000, 750_000), (3_000_000, 750_000),
         (3_000_000, 2_250_000), (1_000_000, 2_250_000)]


def test_scrambled_roles_still_classify_geometrically():
    """Shell labelled 'inner', hole labelled 'outer': classification
    must come from containment, not the role attribute."""
    arcs = [
        _arc("inner", 0, [SW, SE, NE]),          # actually the shell
        _arc("inner", 1, [SW, NW, NE]),
        _arc("outer", 0, [INNER[0], INNER[1], INNER[2]]),  # actually the hole
        _arc("outer", 1, [INNER[0], INNER[3], INNER[2]]),
    ]
    out = _assemble(arcs)
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 1
    shell_only = _assemble(arcs[:2])["area_m2"]
    assert 0 < out["area_m2"] < abs(shell_only) or out["area_m2"] > 0
    # the ring covering the larger extent is the classified outer
    roles = {
        (min(r["lon"]), max(r["lon"])): r["role"] for r in out["rings"]
    }
    assert roles[(0, 4_000_000)] == "outer"
    assert roles[(1_000_000, 3_000_000)] == "inner"


def test_empty_roles_assemble_and_classify():
    arcs = [
        _arc("", 0, [SW, SE, NE]),
        _arc("", 1, [SW, NW, NE]),
        _arc("", 0, [INNER[0], INNER[1], INNER[2]]),
        _arc("", 1, [INNER[0], INNER[3], INNER[2]]),
    ]
    out = _assemble(arcs)
    assert out["closed"] and out["n_outer"] == 1 and out["n_inner"] == 1
    correct = _assemble([
        _arc("outer", 0, [SW, SE, NE]),
        _arc("outer", 1, [SW, NW, NE]),
        _arc("inner", 0, [INNER[0], INNER[1], INNER[2]]),
        _arc("inner", 1, [INNER[0], INNER[3], INNER[2]]),
    ])
    assert out["area_m2"] == correct["area_m2"]


def test_mixed_role_ring_closes_via_fallback():
    """One ring whose two arcs carry DIFFERENT roles: a role-keyed
    chain could never close it; endpoint chaining with the role as a
    mere tie-break hint must."""
    arcs = [
        _arc("outer", 0, [SW, SE, NE]),
        _arc("inner", 1, [SW, NW, NE]),
    ]
    out = _assemble(arcs)
    assert out["closed"] and len(out["rings"]) == 1
    assert out["rings"][0]["role"] == "outer"
    assert out["area_m2"] > 0


def test_island_in_lake_is_outer_again():
    """Nesting depth 2 (shell > hole > island): even-odd classification
    makes the innermost ring an outer shell again, and its area ADDS
    (the reference's nested-multipolygon semantics)."""
    island = [(1_500_000, 1_000_000), (2_500_000, 1_000_000),
              (2_500_000, 2_000_000), (1_500_000, 2_000_000)]
    arcs = [
        _arc("outer", 0, [SW, SE, NE]),
        _arc("outer", 1, [SW, NW, NE]),
        _arc("inner", 0, [INNER[0], INNER[1], INNER[2]]),
        _arc("inner", 1, [INNER[0], INNER[3], INNER[2]]),
        # island carries a WRONG role on purpose — depth decides
        _arc("inner", 0, [island[0], island[1], island[2]]),
        _arc("inner", 1, [island[0], island[3], island[2]]),
    ]
    out = _assemble(arcs)
    assert out["closed"]
    assert out["n_outer"] == 2 and out["n_inner"] == 1

    def ring_area(pts):
        closed = pts + [pts[0]]
        return abs(_ring_signed_area_m2(
            [p[0] for p in closed], [p[1] for p in closed]))

    expect = ring_area(RECT) - ring_area(INNER) + ring_area(island)
    assert out["area_m2"] == pytest.approx(expect, rel=1e-12)


def test_fixture_assembly_identical_under_role_scramble(spark, sf_dir):
    """End-to-end: scrambling every member role in the derived fixture
    changes NOTHING about the assembled output (rings are discovered by
    endpoint, shells/holes by geometry)."""
    from oshdb_spark.operators.relations import (
        assemble_multipolygons,
        collect_member_arcs,
    )
    from oshdb_spark.sources.relations import derive_relation_members

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    m = derive_relation_members(ev).filter(F.col("version") <= 3)
    scrambled = m.withColumn(
        "role",
        F.when(F.col("role") == "outer", F.lit("inner")).otherwise(F.lit("")),
    )

    def result(members):
        mp = assemble_multipolygons(collect_member_arcs(members))
        return {
            (r["rel_id"], r["version"]): (
                r["mp"]["n_outer"], r["mp"]["n_inner"],
                r["mp"]["closed"], r["mp"]["area_m2"],
            )
            for r in mp.select("rel_id", "version", "mp").collect()
        }

    a, b = result(m), result(scrambled)
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# touching rings (OSHDBGeometryBuilderTestOsmTestData7xxTest: 751/755/763)
# ---------------------------------------------------------------------------
# The reference repairs touching rings with buffer(0)
# (OSHDBGeometryBuilder.java:289-293); here classification must survive a
# ring whose representative vertex lies ON another ring's boundary by
# re-probing at the first non-touching vertex (or the first edge midpoint
# when every vertex touches).


def _closed(role, pts):
    """One already-closed arc (first point repeated at the end)."""
    ring = pts + [pts[0]]
    return _arc(role, 0, ring)


def _abs_ring_area(pts):
    closed = pts + [pts[0]]
    return abs(
        _ring_signed_area_m2([p[0] for p in closed], [p[1] for p in closed])
    )


def test_inner_touching_outer_at_node():
    """Reference test755: inner ring touching the outer IN a shared
    node. The inner's first vertex sits on the outer boundary; the
    classifier must re-probe and still call it a hole."""
    outer = [(0, 0), (4_000_000, 0), (4_000_000, 1_500_000),
             (4_000_000, 3_000_000), (0, 3_000_000)]
    inner = [(4_000_000, 1_500_000), (3_000_000, 500_000),
             (2_000_000, 1_500_000), (3_000_000, 2_500_000)]
    out = _assemble([_closed("", outer), _closed("", inner)])
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 1
    expect = _abs_ring_area(outer) - _abs_ring_area(inner)
    assert out["area_m2"] == pytest.approx(expect, rel=1e-12)


def test_two_inners_touching_each_other():
    """Reference test751: valid multipolygon with touching inner rings
    (two holes sharing one vertex inside the shell)."""
    a = [(1_000_000, 1_500_000), (1_500_000, 1_000_000),
         (2_000_000, 1_500_000), (1_500_000, 2_000_000)]
    b = [(2_000_000, 1_500_000), (2_500_000, 1_000_000),
         (3_000_000, 1_500_000), (2_500_000, 2_000_000)]
    out = _assemble([_closed("", RECT), _closed("", a), _closed("", b)])
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 2
    expect = _abs_ring_area(RECT) - _abs_ring_area(a) - _abs_ring_area(b)
    assert out["area_m2"] == pytest.approx(expect, rel=1e-12)


def test_four_outers_touching_in_single_point():
    """Reference test763: four outer rings (petals) all sharing ONE
    vertex. Every petal's first vertex lies on the other three rings'
    boundaries; each must still classify as a shell (depth 0)."""
    petals = [
        [(0, 0), (1_000_000, -500_000), (2_000_000, 0), (1_000_000, 500_000)],
        [(0, 0), (500_000, 1_000_000), (0, 2_000_000), (-500_000, 1_000_000)],
        [(0, 0), (-1_000_000, 500_000), (-2_000_000, 0), (-1_000_000, -500_000)],
        [(0, 0), (-500_000, -1_000_000), (0, -2_000_000), (500_000, -1_000_000)],
    ]
    out = _assemble([_closed("", p) for p in petals])
    assert out["closed"]
    assert out["n_outer"] == 4 and out["n_inner"] == 0
    expect = sum(_abs_ring_area(p) for p in petals)
    assert out["area_m2"] == pytest.approx(expect, rel=1e-12)


def test_every_vertex_touching_falls_back_to_edge_midpoint():
    """Degenerate: a hole whose EVERY vertex lies on the shell boundary
    (diamond inscribed at the square's edge midpoints). No vertex
    qualifies as a probe; the first-edge midpoint must, and it
    classifies the diamond as a hole."""
    square = [(0, 0), (4_000_000, 0), (4_000_000, 4_000_000), (0, 4_000_000)]
    diamond = [(2_000_000, 0), (4_000_000, 2_000_000),
               (2_000_000, 4_000_000), (0, 2_000_000)]
    out = _assemble([_closed("", square), _closed("", diamond)])
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 1
    expect = _abs_ring_area(square) - _abs_ring_area(diamond)
    assert out["area_m2"] == pytest.approx(expect, rel=1e-12)


def test_point_on_ring_predicate():
    from oshdb_spark.operators.relations import _point_on_ring

    ring = [p[0] for p in RECT] + [RECT[0][0]], [p[1] for p in RECT] + [RECT[0][1]]
    assert _point_on_ring(*ring, 0, 0)                    # vertex
    assert _point_on_ring(*ring, 2_000_000, 0)            # mid-edge
    assert not _point_on_ring(*ring, 2_000_000, 1)        # just inside
    assert not _point_on_ring(*ring, 2_000_000, -1)       # just outside
    assert not _point_on_ring(*ring, 4_000_001, 0)        # past the corner


# ---------------------------------------------------------------------------
# skew probe: one giant relation through the salted gather
# ---------------------------------------------------------------------------

def test_giant_relation_salted_gather(spark):
    """Hot-key probe (the coastline-style skew case claimed in
    operators/relations.py): ONE relation with 1000 member arcs (500
    disjoint shells) next to small relations. The salted two-stage
    gather must (a) produce byte-identical assembly results to the
    direct groupBy, and (b) actually add the second aggregation stage
    to the plan (two exchanges)."""
    import numpy as np

    from oshdb_spark.operators.relations import (
        _ring_signed_area_m2,
        assemble_multipolygons,
        collect_member_arcs,
    )

    rows = []
    # giant relation 1: 500 disjoint rect shells, each split in 2 arcs
    for i in range(500):
        ox = i * 20_000_000
        r = [(ox, 0), (ox + 4_000_000, 0), (ox + 4_000_000, 3_000_000), (ox, 3_000_000)]
        rows.append((1, 1, 0, None, True, "outer", 2 * i,
                     [r[0][0], r[1][0], r[2][0]], [r[0][1], r[1][1], r[2][1]]))
        rows.append((1, 1, 0, None, True, "outer", 2 * i + 1,
                     [r[0][0], r[3][0], r[2][0]], [r[0][1], r[3][1], r[2][1]]))
    # two normal relations
    for rel in (2, 3):
        off = rel * 7_000_000
        r = [(off, off), (off + 4_000_000, off),
             (off + 4_000_000, off + 3_000_000), (off, off + 3_000_000)]
        rows.append((rel, 1, 0, None, True, "outer", 0,
                     [r[0][0], r[1][0], r[2][0]], [r[0][1], r[1][1], r[2][1]]))
        rows.append((rel, 1, 0, None, True, "outer", 1,
                     [r[0][0], r[3][0], r[2][0]], [r[0][1], r[3][1], r[2][1]]))
    m = spark.createDataFrame(
        rows,
        "rel_id long, version int, ts long, valid_to long, visible boolean, "
        "role string, arc_idx int, lon_arr array<long>, lat_arr array<long>",
    )

    def result(gathered):
        out = assemble_multipolygons(gathered).select(
            "rel_id", "mp.n_outer", "mp.n_inner", "mp.closed", "mp.area_m2"
        )
        return {r["rel_id"]: (r["n_outer"], r["n_inner"], r["closed"], r["area_m2"])
                for r in out.collect()}

    direct = result(collect_member_arcs(m))
    salted = result(collect_member_arcs(m, salt=8))
    assert direct == salted
    assert direct[1][0] == 500 and direct[1][2] is True
    off = 2 * 7_000_000  # rel 2's rect (C-D area is latitude-dependent)
    ring = [(off, off), (off + 4_000_000, off),
            (off + 4_000_000, off + 3_000_000), (off, off + 3_000_000), (off, off)]
    one = abs(_ring_signed_area_m2([p[0] for p in ring], [p[1] for p in ring]))
    assert direct[2][3] == pytest.approx(one, rel=1e-9)

    # the salted plan really has the extra partial-gather stage
    plan = collect_member_arcs(m, salt=8)._jdf.queryExecution().executedPlan().toString()
    n_agg_exchanges = plan.count("hashpartitioning")
    plain = collect_member_arcs(m)._jdf.queryExecution().executedPlan().toString()
    assert n_agg_exchanges > plain.count("hashpartitioning")
