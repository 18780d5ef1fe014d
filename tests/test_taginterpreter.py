"""TagInterpreter rule matrix (BaseTagInterpreter.java:48-158 ports):
closure requirement, explicit area=yes/no override, area-tag dictionary
membership, non-area keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from oshdb_spark.functions.taginterpreter import (
    AREA_KEY,
    BARRIER_CITY_WALL,
    BARRIER_FENCE,
    BARRIER_KEY,
    BUILDING_KEY,
    HIGHWAY_KEY,
    LANDUSE_FOREST,
    LANDUSE_KEY,
    LANDUSE_RESIDENTIAL,
    NO_VALUE,
    way_geom_kind_col,
)

CLOSED_LON = [0, 100, 100, 0, 0]
CLOSED_LAT = [0, 0, 100, 100, 0]
OPEN_LON = [0, 100, 100, 0]
OPEN_LAT = [0, 0, 100, 100]

CASES = [
    # (tags, closed?, expected kind, rule under test)
    ({BUILDING_KEY: 1}, True, "polygon", "closed + building -> area"),
    ({BUILDING_KEY: 1}, False, "line", "open ring is never an area"),
    ({BUILDING_KEY: 1, AREA_KEY: 0}, True, "line", "area=no overrides building"),
    ({HIGHWAY_KEY: 1, AREA_KEY: 1}, True, "polygon", "area=yes forces polygon"),
    ({HIGHWAY_KEY: 1}, True, "line", "highway not in the area dictionary"),
    ({}, True, "line", "no tags -> line"),
    ({AREA_KEY: 1}, False, "line", "area=yes cannot close an open way"),
    # polygon-features rule modes (DefaultTagInterpreter.java:31-81)
    ({BUILDING_KEY: NO_VALUE}, True, "line", 'mode "all" excludes building=no'),
    ({LANDUSE_KEY: LANDUSE_FOREST}, True, "polygon", "whitelisted landuse value"),
    (
        {LANDUSE_KEY: LANDUSE_RESIDENTIAL},
        True,
        "line",
        "whitelist value exception: landuse present but not area-ish",
    ),
    ({BARRIER_KEY: BARRIER_FENCE}, True, "line", "blacklisted barrier value"),
    (
        {BARRIER_KEY: BARRIER_CITY_WALL},
        True,
        "polygon",
        "non-blacklisted barrier value is area-ish",
    ),
    (
        {BUILDING_KEY: NO_VALUE, LANDUSE_KEY: LANDUSE_FOREST},
        True,
        "polygon",
        "another rule can still match past building=no",
    ),
    (
        {LANDUSE_KEY: LANDUSE_FOREST, AREA_KEY: 0},
        True,
        "line",
        "area=no overrides the whole rule table",
    ),
]


def test_rule_matrix(spark):
    rows = [
        (
            i,
            dict(tags),
            CLOSED_LON if closed else OPEN_LON,
            CLOSED_LAT if closed else OPEN_LAT,
            expect,
            note,
        )
        for i, (tags, closed, expect, note) in enumerate(CASES)
    ]
    df = spark.createDataFrame(
        rows, "i int, tags map<int,int>, lon_arr array<long>, lat_arr array<long>, expect string, note string"
    )
    got = df.withColumn(
        "kind", way_geom_kind_col(F.col("tags"), F.col("lon_arr"), F.col("lat_arr"))
    ).collect()
    for r in got:
        assert r["kind"] == r["expect"], r["note"]


def test_fixture_has_every_rule_outcome(spark, sf_dir):
    """The derived way fixture exercises all four rule branches (so the
    oracle-gated catalog query is not vacuously one-sided)."""
    from oshdb_spark.sources.ways import (
        WAY_AREA_MOD,
        WAY_AREA_YES_MOD,
        WAY_BUILDING_MOD,
        WAY_CLOSED_MOD,
        derive_ways,
        with_way_tags,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = with_way_tags(derive_ways(ev)).select("way_id").distinct()
    ids = {r["way_id"] for r in w.collect()}
    # closed + building, closed + area=no, closed + area=yes, open
    assert any(i % WAY_CLOSED_MOD == 0 and i % WAY_BUILDING_MOD == 0 and i % WAY_AREA_MOD != 0 for i in ids)
    assert any(i % WAY_CLOSED_MOD == 0 and i % WAY_AREA_MOD == 0 and i % WAY_AREA_YES_MOD != 0 for i in ids)
    assert any(i % WAY_AREA_YES_MOD == 0 for i in ids)
    assert any(i % WAY_CLOSED_MOD != 0 for i in ids)
    # the widened polygon-features modes are all exercised too
    from oshdb_spark.sources.ways import (
        WAY_BARRIER_MOD,
        WAY_BUILDING_NO_MOD,
        WAY_LANDUSE_MOD,
    )

    closed = {i for i in ids if i % WAY_CLOSED_MOD == 0 and i % WAY_AREA_MOD != 0}
    # building=no on a closed ring (mode-"all" exception)
    assert any(i % WAY_BUILDING_NO_MOD == 0 for i in closed)
    # whitelisted landuse value AND the residential exception
    assert any(i % WAY_LANDUSE_MOD == 0 and (i % 3 + 1) in (1, 3) for i in closed)
    assert any(i % WAY_LANDUSE_MOD == 0 and (i % 3 + 1) == 2 for i in closed)
    # a barrier row matching the blacklist rule (value city_wall)
    assert any(i % WAY_BARRIER_MOD == 0 and (i % 3 + 1) == 3 for i in closed)


def test_relation_dispatch_and_old_style(spark):
    """Relation-side rules (DefaultTagInterpreter.java:160-199 +
    BaseTagInterpreter.java:106-135): type drives the multipolygon /
    collection dispatch; old-style needs area-type AND one outer member
    AND no interesting tags (uninteresting keys are ignorable)."""
    from oshdb_spark.functions.taginterpreter import (
        NAME_KEY,
        SOURCE_KEY,
        TYPE_BOUNDARY,
        TYPE_KEY,
        TYPE_MULTIPOLYGON,
        TYPE_ROUTE,
        old_style_multipolygon_col,
        relation_geom_kind_col,
    )

    cases = [
        # (tags, n_outer, expect_kind, expect_old_style, note)
        ({TYPE_KEY: TYPE_MULTIPOLYGON}, 1, "multipolygon", True, "clean old-style"),
        ({TYPE_KEY: TYPE_BOUNDARY}, 1, "multipolygon", True, "boundary is area-typed"),
        ({TYPE_KEY: TYPE_MULTIPOLYGON, SOURCE_KEY: 1}, 1, "multipolygon", True,
         "uninteresting tag does not block old-style"),
        ({TYPE_KEY: TYPE_MULTIPOLYGON, NAME_KEY: 1}, 1, "multipolygon", False,
         "interesting tag blocks old-style"),
        ({TYPE_KEY: TYPE_MULTIPOLYGON}, 2, "multipolygon", False,
         "two outer members block old-style"),
        ({TYPE_KEY: TYPE_ROUTE}, 1, "collection", False, "route -> collection"),
        ({}, 1, "collection", False, "no type tag -> collection fallback"),
        ({NAME_KEY: 1}, 1, "collection", False, "typeless with tags -> collection"),
    ]
    df = spark.createDataFrame(
        [(i, dict(t), n, k, o, note) for i, (t, n, k, o, note) in enumerate(cases)],
        "i int, tags map<int,int>, n_outer int, ek string, eo boolean, note string",
    )
    got = df.select(
        "note", "ek", "eo",
        relation_geom_kind_col(F.col("tags")).alias("kind"),
        old_style_multipolygon_col(F.col("tags"), F.col("n_outer")).alias("old"),
    ).collect()
    for r in got:
        assert r["kind"] == r["ek"], r["note"]
        assert r["old"] == r["eo"], r["note"]
