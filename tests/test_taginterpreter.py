"""TagInterpreter rule matrix (BaseTagInterpreter.java:48-158 ports):
closure requirement, explicit area=yes/no override, area-tag dictionary
membership, non-area keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from oshdb_spark.functions.taginterpreter import (
    AREA_KEY,
    BUILDING_KEY,
    HIGHWAY_KEY,
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
