"""Incomplete-data conformance slice, ported from the reference's
OSHDBGeometryBuilderTestPolygonIncompleteDataTest
(oshdb-util/src/test/java/.../geometry/incomplete/ + resources/
incomplete-osm/polygon.osm): multipolygon assembly must degrade
gracefully when member data is missing, never throw.

Mapping to this engine: way geometry is pre-materialized (SURVEY §7.0),
so "node reference does not resolve" arrives here as an arc with those
positions DROPPED, "way does not exist" as a missing arc, and "all
nodes of a way missing" as an empty arc. The reference's assertions —
geometry type, interior-ring count, coordinate count, area of the
expected WKT — translate to `_assemble`'s shell/hole counts, closed
coordinate totals, and the hole-aware area against the same rings.
"""

from __future__ import annotations

import pytest

from oshdb_spark.operators.relations import _assemble, _ring_signed_area_m2


def _area(ring):
    return abs(_ring_signed_area_m2([p[0] for p in ring], [p[1] for p in ring]))


# nodes of incomplete-osm/polygon.osm in e7 fixed-point
N = {
    11: (73100000, 10100000), 12: (73400000, 10100000),
    13: (73400000, 10500000), 14: (73200000, 10500000),
    15: (73200000, 10400000), 16: (73300000, 10400000),
    24: (73100000, 10400000), 25: (73300000, 10500000),
    26: (73300000, 10400000), 27: (73200000, 10400000),
    28: (73100000, 10100000),
}


def _arc(role, ord_, node_ids):
    pts = [N[i] for i in node_ids]
    return {"role": role, "arc_ord": ord_,
            "lon_arr": [p[0] for p in pts], "lat_arr": [p[1] for p in pts]}


def test_some_nodes_of_way_not_existent():
    """relation 500: two outer ways; the second way's refs to missing
    nodes 17/18 are dropped, the remainder still closes into ONE valid
    shell of 7 coordinates with the expected area (the reference's
    MULTIPOLYGON(((7.34 1.01,7.31 1.01,7.33 1.04,7.32 1.04,7.32 1.05,
    7.34 1.05,7.34 1.01))))."""
    out = _assemble([
        _arc("outer", 0, [11, 12, 13]),
        _arc("outer", 1, [13, 14, 15, 16, 11]),  # refs 17,18 dropped
    ])
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 0
    ring = [N[i] for i in (11, 12, 13, 14, 15, 16, 11)]
    assert out["area_m2"] == pytest.approx(_area(ring), rel=1e-9)
    assert len(out["rings"][0]["lon"]) == 7


def test_way_not_existent():
    """relation 501: one member way (104) does not exist at all; the
    surviving closed way (105) still yields one valid 6-coordinate
    shell with its own area."""
    out = _assemble([_arc("outer", 0, [24, 25, 26, 27, 28, 24])])
    assert out["closed"]
    assert out["n_outer"] == 1 and out["n_inner"] == 0
    ring = [N[i] for i in (24, 25, 26, 27, 28, 24)]
    assert out["area_m2"] == pytest.approx(_area(ring), rel=1e-9)
    assert len(out["rings"][0]["lon"]) == 6


def test_all_nodes_of_way_not_existent():
    """relation 502: the only member way's nodes are all missing — the
    arc is empty. Must not raise (the reference merely requires a
    non-throwing build); area is zero and nothing closes."""
    out = _assemble([
        {"role": "outer", "arc_ord": 0, "lon_arr": [], "lat_arr": []}
    ])
    assert out["area_m2"] == 0.0
    assert out["n_outer"] + out["n_inner"] >= 0  # non-throwing is the contract


def test_mixed_missing_and_valid_members():
    """Composite: a valid two-arc shell PLUS an empty arc from a fully
    missing way must assemble exactly like the shell alone — missing
    members never poison surviving geometry."""
    base = _assemble([
        _arc("outer", 0, [11, 12, 13]),
        _arc("outer", 1, [13, 14, 15, 16, 11]),
    ])
    mixed = _assemble([
        _arc("outer", 0, [11, 12, 13]),
        {"role": "outer", "arc_ord": 1, "lon_arr": [], "lat_arr": []},
        _arc("outer", 2, [13, 14, 15, 16, 11]),
    ])
    assert mixed["area_m2"] == pytest.approx(base["area_m2"], rel=1e-12)
    assert mixed["n_outer"] == base["n_outer"]
