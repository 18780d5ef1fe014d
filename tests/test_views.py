"""Temporal-view invariants ported from the reference test strategy
(SURVEY.md §5): as-of correctness vs a pandas oracle, contribution
classification, changeset collapsing, and the snapshot/contribution
reconciliation invariant (views.md:48-52)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.contribution import collapse_changesets, contributions
from oshdb_spark.operators.snapshot import snapshot_timestamps, snapshots
from oshdb_spark.sources.versions import SNAPSHOT_TS, load_versions


@pytest.fixture(scope="module")
def versions_pdf(spark, sf_dir) -> pd.DataFrame:
    return load_versions(spark, sf_dir).toPandas()


def _pandas_asof_count(pdf: pd.DataFrame, t: int, pred=None) -> int:
    """Oracle: latest version with ts <= t per entity, count if visible+pred."""
    df = pdf[pdf.ts <= t].sort_values(["entity_id", "version"])
    last = df.groupby("entity_id").tail(1)
    if pred is not None:
        last = last[pred(last)]
    return int(last.visible.sum())


def test_snapshot_counts_match_pandas_oracle(spark, sf_dir, versions_pdf):
    v = load_versions(spark, sf_dir)
    t = snapshot_timestamps(spark, SNAPSHOT_TS)
    got = {
        r["snap_ts"]: r["cnt"]
        for r in snapshots(v, t)
        .groupBy("snap_ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for ts in SNAPSHOT_TS:
        expected = _pandas_asof_count(versions_pdf, ts)
        assert got.get(ts, 0) == expected, ts


def test_snapshot_empty_interval_versions_excluded(spark, sf_dir):
    """A version superseded at the same timestamp must never appear."""
    v = load_versions(spark, sf_dir)
    t = snapshot_timestamps(spark, SNAPSHOT_TS)
    snap = snapshots(v, t)
    dupes = (
        snap.groupBy("entity_id", "snap_ts")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_changeset_collapse_keeps_last(spark, sf_dir, versions_pdf):
    v = load_versions(spark, sf_dir)
    got = collapse_changesets(v).toPandas()
    expected = (
        versions_pdf.sort_values("version")
        .groupby(["entity_id", "changeset"])
        .tail(1)
    )
    assert len(got) == len(expected)
    assert set(map(tuple, got[["entity_id", "version"]].values)) == set(
        map(tuple, expected[["entity_id", "version"]].values)
    )


def test_first_visible_version_is_creation(spark, sf_dir):
    v = load_versions(spark, sf_dir)
    c = contributions(v).toPandas()
    first = c.sort_values("version").groupby("entity_id").head(1)
    assert (first.contrib_type == "CREATION").all()


def test_reconciliation_snapshot_delta_equals_contribution_sums(spark, sf_dir):
    """Between two probe timestamps: snapshot count delta ==
    creations - deletions in the window (views.md:48-52). Uses
    uncollapsed contributions so every transition is observed."""
    v = load_versions(spark, sf_dir)
    t = snapshot_timestamps(spark, SNAPSHOT_TS)
    snap_counts = {
        r["snap_ts"]: r["cnt"]
        for r in snapshots(v, t)
        .groupBy("snap_ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    c = contributions(v, collapse=False).toPandas()
    for lo, hi in zip(SNAPSHOT_TS, SNAPSHOT_TS[1:]):
        win = c[(c.ts > lo) & (c.ts <= hi)]
        births = (win.contrib_type == "CREATION").sum()
        deaths = (win.contrib_type == "DELETION").sum()
        delta = snap_counts.get(hi, 0) - snap_counts.get(lo, 0)
        assert delta == births - deaths, (lo, hi)


def test_filter_relative_semantics(spark, sf_dir):
    """With a predicate, filtered contributions never report TAG/GEOM
    changes on rows that do not match, and CREATION appears when an
    entity starts matching."""
    pred = F.col("tag_v") >= 2
    v = load_versions(spark, sf_dir)
    c = contributions(v, predicate=pred).toPandas()
    changed = c[c.contrib_type.isin(["TAG_CHANGE", "GEOMETRY_CHANGE",
                                     "TAG_CHANGE,GEOMETRY_CHANGE", "OTHER"])]
    assert (changed.tag_v >= 2).all() and changed.visible.all()
    deletions = c[c.contrib_type == "DELETION"]
    # a filter-relative deletion row is the version that STOPPED matching:
    # it is either invisible or fails the predicate
    assert ((~deletions.visible) | (deletions.tag_v < 2)).all()


def test_contributions_full_tags_map_diff(spark, sf_dir):
    """The generalized operator can diff the FULL tags map: any change
    in any key (not just the scalar pair) classifies TAG_CHANGE; the
    scalar-pair default stays the documented fixture signal."""
    from pyspark.sql import functions as F

    from oshdb_spark.operators.contribution import contributions
    from oshdb_spark.sources.versions import load_versions

    v = load_versions(spark, sf_dir)
    scal = contributions(v)  # default: scalar pair
    full = contributions(v, tag_cols=("tags",))

    def n_tag_changes(df):
        return df.filter(F.col("contrib_type").contains("TAG_CHANGE")).count()

    # the map includes version-varying keys 3/4 on top of the scalars, so
    # map-diff TAG_CHANGEs must be a superset count-wise
    assert n_tag_changes(full) >= n_tag_changes(scal)
    assert scal.count() == full.count()  # row universe identical


def test_way_contributions_via_unified_operator(spark, sf_dir):
    """Way contributions routed through contributions() equal the
    catalog query result (one operator, two entity shapes)."""
    from pyspark.sql import functions as F

    from oshdb_spark.operators.contribution import contributions
    from oshdb_spark.queries import q_way_contrib_counts
    from oshdb_spark.sources.ways import derive_ways

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    c = contributions(
        derive_ways(ev),
        collapse=False,
        entity_col="way_id",
        tag_cols=(),
        geom_cols=("lon_arr", "lat_arr"),
    )
    got = {
        r["contrib_type"]: r["cnt"]
        for r in c.groupBy("contrib_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    expected = {
        r["contrib_type"]: r["cnt"] for r in q_way_contrib_counts(spark, sf_dir).collect()
    }
    assert got == expected
    assert "GEOMETRY_CHANGE" in got and "TAG_CHANGE" not in got


def test_attribute_contributors_child_recursion(spark):
    """getContributorUserId semantics (OSMContribution.java:211-257):
    own instants attribute to the entity's editor even when a child
    also changed at the same instant; child-induced instants attribute
    to the FIRST member in member order with a version at that instant."""
    from oshdb_spark.operators.contribution import attribute_contributors

    own = spark.createDataFrame(
        [(1, 100, 7), (1, 300, 8)], "entity_id long, ts long, uid int"
    )
    child = spark.createDataFrame(
        [
            (1, 100, 9, 0),  # coincides with an own instant: dropped
            (1, 200, 5, 1),  # member slot 1...
            (1, 200, 3, 2),  # ...beats slot 2 at the same instant
            (1, 400, 4, 2),  # plain child-induced instant
        ],
        "entity_id long, ts long, uid int, member_ord int",
    )
    out = {
        r.ts: r.contrib_uid
        for r in attribute_contributors(own, child).collect()
    }
    assert out == {100: 7, 200: 5, 300: 8, 400: 4}
