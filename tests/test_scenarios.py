"""Hand-written version-history scenarios ported from the reference's
kernel unit suites (oshdb-util celliterator tests,
IterateByTimestamps*/IterateByContribution* — SURVEY.md §5.2): each
test builds a tiny explicit history and asserts the snapshot /
contribution semantics the reference encodes for that scenario."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.contribution import contributions
from oshdb_spark.operators.snapshot import snapshot_timestamps, snapshots

SCHEMA = (
    "entity_id long, version int, ts long, changeset long, uid int, "
    "visible boolean, tag_building int, tag_v int, lon_e7 long, lat_e7 long"
)


def _versions(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


T = 1000  # base epoch


def test_snapshot_picks_latest_version_per_probe(spark):
    """As-of resolution: newest version with ts <= t (OSHEntities.java:41-86)."""
    v = _versions(spark, [
        (1, 1, T + 10, 1, 7, True, 0, 1, 100, 100),
        (1, 2, T + 20, 2, 7, True, 0, 2, 100, 100),
        (1, 3, T + 30, 3, 7, True, 0, 3, 100, 100),
    ])
    t = snapshot_timestamps(spark, [T + 5, T + 10, T + 25, T + 99])
    got = {
        r["snap_ts"]: r["tag_v"]
        for r in snapshots(v, t).select("snap_ts", "tag_v").collect()
    }
    assert got == {T + 10: 1, T + 25: 2, T + 99: 3}  # T+5: entity not born yet


def test_snapshot_skips_invisible_asof_version(spark):
    """A deleted (invisible) as-of version yields no snapshot row
    (CellIterator.java:250-258 visibility check)."""
    v = _versions(spark, [
        (1, 1, T + 10, 1, 7, True, 0, 1, 100, 100),
        (1, 2, T + 20, 2, 7, False, 0, 1, 100, 100),  # deleted
        (1, 3, T + 30, 3, 7, True, 0, 1, 100, 100),   # recreated
    ])
    t = snapshot_timestamps(spark, [T + 15, T + 25, T + 35])
    got = sorted(r["snap_ts"] for r in snapshots(v, t).collect())
    assert got == [T + 15, T + 35]


def test_same_timestamp_supersede(spark):
    """Two versions at the same ts: the later version wins, the earlier
    has an empty validity interval and is never visible to a probe."""
    v = _versions(spark, [
        (1, 1, T + 10, 1, 7, True, 0, 1, 100, 100),
        (1, 2, T + 10, 2, 7, True, 0, 2, 100, 100),
    ])
    t = snapshot_timestamps(spark, [T + 10, T + 50])
    rows = snapshots(v, t).select("snap_ts", "tag_v").collect()
    assert {(r["snap_ts"], r["tag_v"]) for r in rows} == {
        (T + 10, 2), (T + 50, 2)
    }


def test_contribution_classification_matrix(spark):
    """CREATION / TAG_CHANGE / GEOMETRY_CHANGE / both / DELETION over
    one history (CellIterator.java:517-696 classification)."""
    v = _versions(spark, [
        (1, 1, T + 10, 1, 7, True, 0, 1, 100, 100),   # CREATION
        (1, 2, T + 20, 2, 7, True, 0, 2, 100, 100),   # TAG_CHANGE
        (1, 3, T + 30, 3, 7, True, 0, 2, 200, 100),   # GEOMETRY_CHANGE
        (1, 4, T + 40, 4, 7, True, 0, 3, 300, 100),   # both
        (1, 5, T + 50, 5, 7, False, 0, 3, 300, 100),  # DELETION
        (1, 6, T + 60, 6, 7, True, 0, 3, 300, 100),   # CREATION (recreate)
    ])
    got = [
        (r["version"], r["contrib_type"])
        for r in contributions(v).orderBy("version").collect()
    ]
    assert got == [
        (1, "CREATION"),
        (2, "TAG_CHANGE"),
        (3, "GEOMETRY_CHANGE"),
        (4, "TAG_CHANGE,GEOMETRY_CHANGE"),
        (5, "DELETION"),
        (6, "CREATION"),
    ]


def test_changeset_collapse_keeps_only_final_of_run(spark):
    """Three edits in one changeset collapse to the last one
    (OSHEntities.java:240-267): intermediate states are invisible to
    the contribution view."""
    v = _versions(spark, [
        (1, 1, T + 10, 100, 7, True, 0, 1, 100, 100),
        (1, 2, T + 11, 200, 7, True, 0, 2, 100, 100),  # same cs 200...
        (1, 3, T + 12, 200, 7, True, 0, 3, 100, 100),
        (1, 4, T + 13, 200, 7, True, 0, 4, 100, 100),  # ...final of run
        (1, 5, T + 20, 300, 7, True, 0, 5, 100, 100),
    ])
    got = [
        (r["version"], r["contrib_type"])
        for r in contributions(v).orderBy("version").collect()
    ]
    assert got == [(1, "CREATION"), (4, "TAG_CHANGE"), (5, "TAG_CHANGE")]


def test_filter_relative_creation_and_deletion(spark):
    """Gaining the filtered tag is a CREATION, losing it a DELETION,
    even while the entity stays visible (CellIterator.java:581-594,
    639-641; views.md:48-52)."""
    v = _versions(spark, [
        (1, 1, T + 10, 1, 7, True, 0, 1, 100, 100),  # no building tag
        (1, 2, T + 20, 2, 7, True, 1, 1, 100, 100),  # gains tag -> CREATION
        (1, 3, T + 30, 3, 7, True, 1, 2, 100, 100),  # TAG_CHANGE
        (1, 4, T + 40, 4, 7, True, 0, 2, 100, 100),  # loses tag -> DELETION
    ])
    got = [
        (r["version"], r["contrib_type"])
        for r in contributions(v, predicate=(F.col("tag_building") == 1))
        .orderBy("version")
        .collect()
    ]
    assert got == [(2, "CREATION"), (3, "TAG_CHANGE"), (4, "DELETION")]


def test_reconciliation_snapshot_delta_equals_contrib_sum(spark):
    """Between two probes, snapshot-count delta == creations - deletions
    in the interval (the views.md:48-52 reconciliation invariant),
    checked on a history with all transition kinds."""
    rows = []
    # 10 entities with varied lifecycles
    for e in range(10):
        rows.append((e, 1, T + 10 + e, 1, 7, True, 1, 1, 100, 100))
        if e % 2 == 0:  # half get deleted mid-window
            rows.append((e, 2, T + 40 + e, 2, 7, False, 1, 1, 100, 100))
        if e % 4 == 0:  # some recreated near the end
            rows.append((e, 3, T + 70 + e, 3, 7, True, 1, 1, 100, 100))
    v = _versions(spark, rows)
    t0, t1 = T + 30, T + 95
    t = snapshot_timestamps(spark, [t0, t1])
    snap_counts = {
        r["snap_ts"]: r["cnt"]
        for r in snapshots(v, t)
        .groupBy("snap_ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    c = contributions(v).filter((F.col("ts") > t0) & (F.col("ts") <= t1))
    by_type = {
        r["contrib_type"]: r["cnt"]
        for r in c.groupBy("contrib_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    delta = snap_counts.get(t1, 0) - snap_counts.get(t0, 0)
    assert delta == by_type.get("CREATION", 0) - by_type.get("DELETION", 0)


def test_contributions_keep_before_surface(spark):
    """keep_before exposes the previous version's state as before_<col>
    (OSMContribution.getGeometryBefore/getEntityBefore,
    OSMContribution.java:74-139): NULL on CREATION (no before side —
    including the filter-relative re-creation case), the prior value on
    every other contribution."""
    v = _versions(spark, [
        (1, 1, T + 10, 1, 7, True, 0, 1, 100, 100),   # CREATION
        (1, 2, T + 20, 2, 7, True, 0, 1, 200, 100),   # GEOMETRY_CHANGE
        (1, 3, T + 30, 3, 7, False, 0, 1, 200, 100),  # DELETION
        (1, 4, T + 40, 4, 7, True, 0, 1, 300, 100),   # CREATION (recreate)
    ])
    rows = {
        r["version"]: (r["contrib_type"], r["before_lon_e7"])
        for r in contributions(
            v, keep_before=("lon_e7",)
        ).collect()
    }
    assert rows == {
        1: ("CREATION", None),          # no before state
        2: ("GEOMETRY_CHANGE", 100),    # prior coordinate
        3: ("DELETION", 200),           # deleted FROM this state
        4: ("CREATION", None),          # invisible before -> no state
    }
