"""Fluent MapReducer-style API: each chained query must equal the
equivalent hand-built operator pipeline (the builder owns assembly
only, semantics live in operators/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oshdb_spark.plans import ContributionView, SnapshotView
from oshdb_spark.plans.builder import key_universe
from oshdb_spark.queries import BBOX, REGIONS, TILE_TS
from oshdb_spark.sources.versions import SNAPSHOT_TS, load_versions


def _as_dict(df, *keys):
    return {tuple(r[k] for k in keys[:-1]): r[keys[-1]] for r in df.collect()}


def test_snapshot_fluent_count_matches_catalog(spark, sf_dir):
    from oshdb_spark.queries import q_snapshot_count_by_ts

    v = load_versions(spark, sf_dir)
    got = (
        SnapshotView.on(v)
        .timestamps(SNAPSHOT_TS)
        .where_tag("tag_building", 1)
        .aggregate_by_timestamp()
        .count()
    )
    expected = q_snapshot_count_by_ts(spark, sf_dir)
    assert _as_dict(got, "snap_ts", "cnt") == _as_dict(expected, "snap_ts", "cnt")


def test_snapshot_fluent_bbox_and_uniq(spark, sf_dir):
    v = load_versions(spark, sf_dir)
    view = (
        SnapshotView.on(v)
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(bbox=BBOX)
        .aggregate_by_timestamp()
    )
    got = view.count_uniq("uid")
    from oshdb_spark.queries import q_snapshot_bbox_count_by_ts

    expected = q_snapshot_bbox_count_by_ts(spark, sf_dir)
    assert _as_dict(got, "snap_ts", "n_uniq") == _as_dict(
        expected, "snap_ts", "uniq_users"
    )


def test_builder_is_immutable(spark, sf_dir):
    v = load_versions(spark, sf_dir)
    base = SnapshotView.on(v).timestamps(SNAPSHOT_TS)
    filtered = base.where_tag("tag_building", 1)
    all_cnt = base.aggregate_by_timestamp().count().collect()
    tag_cnt = filtered.aggregate_by_timestamp().count().collect()
    assert sum(r["cnt"] for r in all_cnt) > sum(r["cnt"] for r in tag_cnt)


def test_contribution_fluent_interval_floor(spark, sf_dir):
    from oshdb_spark.queries import q_contrib_by_interval_type

    v = load_versions(spark, sf_dir)
    got = (
        ContributionView.on(v)
        .timestamps(SNAPSHOT_TS)
        .aggregate_by_timestamp()
        .aggregate_by("contrib_type")
        .count()
    )
    expected = q_contrib_by_interval_type(spark, sf_dir)
    assert _as_dict(got, "bucket_ts", "contrib_type", "cnt") == _as_dict(
        expected, "bucket_ts", "contrib_type", "cnt"
    )


def test_fluent_geometry_overlay_with_zerofill(spark, sf_dir):
    from oshdb_spark.queries import q_agg_by_region

    v = load_versions(spark, sf_dir)
    universe = key_universe(spark, "region_key", list(REGIONS), "string")
    got = (
        SnapshotView.on(v)
        .timestamps([TILE_TS])
        .aggregate_by_geometry(REGIONS)
        .zerofill_with(universe)
        .count()
    )
    expected = q_agg_by_region(spark, sf_dir)
    assert _as_dict(got, "region_key", "cnt") == _as_dict(expected, "region_key", "cnt")


def test_fluent_tile_terminals(spark, sf_dir):
    from oshdb_spark.queries import q_raster_tiles_z6

    v = load_versions(spark, sf_dir)
    got = (
        SnapshotView.on(v)
        .timestamps([TILE_TS])
        .raster_tiles(6)
        .select("zoom", "tile_x", "tile_y", F.col("val").cast("long").alias("val"))
    )
    expected = q_raster_tiles_z6(spark, sf_dir)
    assert _as_dict(got, "tile_x", "tile_y", "val") == _as_dict(
        expected, "tile_x", "tile_y", "val"
    )


def test_fluent_generic_reduce_and_map(spark, sf_dir):
    v = load_versions(spark, sf_dir)
    got = (
        SnapshotView.on(v)
        .timestamps([TILE_TS])
        .map(lambda df: df.withColumn("vv", F.col("tag_v") * 2))
        .aggregate_by_timestamp()
        .reduce(F.sum("vv").alias("s"), F.max("vv").alias("m"))
        .collect()
    )
    assert len(got) == 1 and got[0]["s"] > 0 and got[0]["m"] <= 8


def test_tag_value_set_equals_manual_predicate(spark, sf_dir):
    """where_tag_in == the hand-written map predicate (value-set filter,
    MapReducer.java:526-560)."""
    from oshdb_spark.sources.versions import KNOWN_TAG_KEYS

    v = load_versions(spark, sf_dir)
    got = (
        SnapshotView.on(v)
        .timestamps(SNAPSHOT_TS)
        .with_keytable(KNOWN_TAG_KEYS)
        .where_tag_in(3, [10, 11])
        .aggregate_by_timestamp()
        .count()
    )
    manual = (
        SnapshotView.on(v)
        .timestamps(SNAPSHOT_TS)
        .where(F.col("tags").getItem(3).isin([10, 11]))
        .aggregate_by_timestamp()
        .count()
    )
    assert _as_dict(got, "snap_ts", "cnt") == _as_dict(manual, "snap_ts", "cnt")


def test_or_list_equals_union_of_single_filters(spark, sf_dir):
    """where_any_tag == distinct union of the individual filters
    (MapReducer.java:606-654 OR semantics)."""
    from oshdb_spark.sources.versions import KNOWN_TAG_KEYS

    v = load_versions(spark, sf_dir)
    base = SnapshotView.on(v).timestamps(SNAPSHOT_TS).with_keytable(KNOWN_TAG_KEYS)
    got = (
        base.where_any_tag([(1, 2), 4])
        .aggregate_by_timestamp()
        .count()
    )
    a = base.where_tag_in(1, [2]).dataframe().select("entity_id", "snap_ts")
    b = base.where_tag_key(4).dataframe().select("entity_id", "snap_ts")
    manual = (
        a.unionByName(b)
        .distinct()
        .groupBy("snap_ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _as_dict(got, "snap_ts", "cnt") == _as_dict(manual, "snap_ts", "cnt")


def test_unknown_tag_key_folds_to_empty_scan(spark, sf_dir):
    """Filter on a key outside the keytable -> lit(False) -> Catalyst
    folds the whole subtree to an empty LocalRelation: no file scan in
    the optimized plan (MapReducer.java:469-474 scan-skip analog)."""
    from oshdb_spark.sources.versions import KNOWN_TAG_KEYS

    v = load_versions(spark, sf_dir)
    df = (
        SnapshotView.on(v)
        .timestamps(SNAPSHOT_TS)
        .with_keytable(KNOWN_TAG_KEYS)
        .where_tag_key(99)
        .dataframe()
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation <empty>" in optimized
    assert "parquet" not in optimized.lower()
    assert df.count() == 0


def test_contribution_zerofill_universe_drops_last_ts(spark, sf_dir):
    """getZerofillTimestamps (MapReducer.java:1908-1916): the
    contribution view's zerofill universe is the interval STARTS —
    every boundary except the final one — and zerofilling with it
    yields one row per (start, type) including zero-count groups."""
    from oshdb_spark.plans.builder import ContributionView
    from oshdb_spark.sources.versions import SNAPSHOT_TS, derive_versions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    view = (
        ContributionView.on(derive_versions(ev))
        .timestamps(SNAPSHOT_TS)
        .aggregate_by_timestamp()
    )
    uni = view.timestamp_universe()
    starts = sorted(r["bucket_ts"] for r in uni.collect())
    assert starts == SNAPSHOT_TS[:-1]

    filled = view.zerofill_with(uni).count()
    got = {r["bucket_ts"] for r in filled.collect()}
    assert got == set(SNAPSHOT_TS[:-1])  # no bucket at the final boundary
