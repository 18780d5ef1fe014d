"""Child-induced modification timestamps: non-vacuity of the membership
windowing at BOTH entity levels (relation<-way and way<-node), plus the
structural contract n_mod_ts >= own visible instants. The value-level
correctness is gated by the DuckDB interval-join oracles
(tests/test_catalog_oracles.py: relation_member_windows,
way_member_mod_ts); these assertions pin that the fixtures actually
exercise the windowing — an always-member (or never-member) resolution
cannot pass (round-3 vacuity audit discipline, CLAUDE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oshdb_spark.queries import q_relation_member_windows, q_way_member_mod_ts


def _assert_windowing_real(pdf):
    # some child instants qualify, some are windowed OUT by slot
    # inactivity — both sides nonzero, so the gate checks a real rule
    assert pdf["n_child_in_window"].sum() > 0
    assert pdf["n_windowed_out"].sum() > 0
    # and the exclusion differs per parent (not a constant offset)
    assert pdf["n_windowed_out"].nunique() > 1
    assert (pdf["n_mod_ts"] > 0).all()


def test_way_member_mod_ts_windowing_is_real(spark, sf_dir):
    pdf = q_way_member_mod_ts(spark, sf_dir).toPandas()
    _assert_windowing_real(pdf)
    # every way of the fixture universe reports (zerofill-free join
    # keeps only ways with versions; at sf0.001 all 60 exist)
    assert pdf["way_id"].is_unique


def test_relation_member_windows_windowing_is_real(spark, sf_dir):
    pdf = q_relation_member_windows(spark, sf_dir).toPandas()
    _assert_windowing_real(pdf)
    assert pdf["rel_id"].is_unique


def test_way_member_mod_ts_exceeds_own_instants(spark, sf_dir):
    """Child-induced instants strictly add to at least one way's own
    timeline — the gate is not reducible to counting way versions."""
    from oshdb_spark.sources.ways import derive_ways

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    own = (
        derive_ways(ev)
        .groupBy("way_id")
        .agg(F.count_distinct("ts").alias("n_own"))
        .toPandas()
        .set_index("way_id")["n_own"]
    )
    got = (
        q_way_member_mod_ts(spark, sf_dir)
        .toPandas()
        .set_index("way_id")["n_mod_ts"]
    )
    joined = got.to_frame().join(own.to_frame())
    assert (joined["n_mod_ts"] >= 1).all()
    assert (joined["n_mod_ts"] > joined["n_own"]).any()


def test_windowed_attribution_differs_from_always_member(spark, sf_dir):
    """The windowing must change the answer: some member-visible
    instants are excluded outright (n_windowed_out > 0, varying per
    relation), and at least one relation's contribution count or
    uid_sum differs from the attribution-only sibling (which treats
    membership as version-independent) — otherwise the gate would be
    reducible to relation_contributors."""
    from oshdb_spark.queries import (
        q_relation_contributors,
        q_relation_contributors_windowed,
    )

    w = q_relation_contributors_windowed(spark, sf_dir).toPandas().set_index("rel_id")
    assert w["n_windowed_out"].sum() > 0
    assert w["n_windowed_out"].nunique() > 1
    assert (w["n_contribs"] > 0).all()

    plain = q_relation_contributors(spark, sf_dir).toPandas().set_index("rel_id")
    j = w.join(plain, lsuffix="_w", rsuffix="_p")
    assert (
        (j["n_contribs_w"] != j["n_contribs_p"]) | (j["uid_sum_w"] != j["uid_sum_p"])
    ).any()
    # windowing only ever REMOVES child instants relative to always-member
    assert (j["n_contribs_w"] <= j["n_contribs_p"]).all()
