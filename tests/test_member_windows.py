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


def test_member_window_random_histories_match_naive_oracle(spark):
    """Adversarial randomized check of the as-of member-window merge
    against a pure-Python NAIVE per-version interval walk (the
    reference's ``current <= toTs`` algorithm, ``OSHEntities.java:
    315-478``): 120 random parent histories with duplicate version
    timestamps, invisible runs, churny slot activity, and child
    instants planted exactly ON version boundaries and one off either
    side. Catches closed-bound / same-timestamp-group regressions the
    two fixed fixtures can't."""
    import numpy as np

    from oshdb_spark.queries import _member_window_per_ts

    rng = np.random.default_rng(20260817)
    N_PARENT, SLOTS = 120, 3
    vers_rows, child_rows = [], []
    expected = {}  # (pid, ts) -> [qa, qm]

    for p in range(N_PARENT):
        k = int(rng.integers(2, 7))
        # duplicate timestamps allowed (same-changeset uploads); version
        # numbers assigned in sorted-ts order like the derive functions
        ts = np.sort(rng.choice(np.arange(100, 160), size=k, replace=True))
        visible = rng.random(k) > 0.25
        for s in range(SLOTS):
            child_id = p * SLOTS + s
            active = (rng.random(k) > 0.35) & visible
            for v in range(k):
                vers_rows.append(
                    (p, s, child_id, v + 1, int(ts[v]),
                     bool(visible[v]), bool(active[v]))
                )
            # child instants: every boundary, one off either side, noise
            cand = set()
            for v in range(k):
                cand |= {int(ts[v]) - 1, int(ts[v]), int(ts[v]) + 1}
            cand |= {int(x) for x in rng.choice(np.arange(95, 165), size=3)}
            # naive walk: closed validity interval per version
            # [ts_v, ts_{v+1}] (open-ended for the newest)
            for t in sorted(cand):
                child_rows.append((child_id, t))
                qa = qm = False
                for v in range(k):
                    lo = int(ts[v])
                    hi = int(ts[v + 1]) if v + 1 < k else None
                    if t >= lo and (hi is None or t <= hi):
                        qa = qa or bool(active[v])
                        qm = qm or bool(visible[v])
                if t >= int(ts[0]):
                    key = (p, t)
                    got = expected.setdefault(key, [False, False])
                    got[0] = got[0] or qa
                    got[1] = got[1] or qm

    vers_df = spark.createDataFrame(
        vers_rows,
        "pid long, m_ord int, child_id long, version int, ts long,"
        " visible boolean, active boolean",
    )
    child_df = spark.createDataFrame(child_rows, "child_id long, c_ts long")

    got = {
        (r["pid"], r["ts"]): (r["qa"], r["qm"])
        for r in _member_window_per_ts(vers_df, child_df, "pid").collect()
    }
    assert set(got) == set(expected)
    mismatches = [
        (k, got[k], tuple(expected[k])) for k in expected
        if got[k] != tuple(expected[k])
    ]
    assert not mismatches, mismatches[:10]

    # per_slot granularity must aggregate to the same per-parent answer
    slot = _member_window_per_ts(vers_df, child_df, "pid", per_slot=True)
    agg = {
        (r["pid"], r["ts"]): (r["qa"], r["qm"])
        for r in slot.groupBy("pid", "ts")
        .agg(F.max("qa").alias("qa"), F.max("qm").alias("qm"))
        .collect()
    }
    assert agg == got


def test_windowed_attribution_zero_active_slot_fallback(spark):
    """The zero-active-slot branch, pinned by a hand-built history
    (round-5 item): at an instant where NO member slot is active,
    - an OWN version instant still attributes the relation's own
      editor (the reference's fallback in OSMContribution.java:211-257
      when no member resolves),
    - a child edit is EXCLUDED from contributions and counted in
      n_windowed_out,
    - a child edit at exactly an own instant is absorbed by the own
      contribution (neither double-attributed nor windowed-out).

    rel 1: v1 ts=100 uid=7 (slot 0 -> way 10 ACTIVE), v2 ts=200 uid=8
    (slot present but INACTIVE — zero active slots from 200 on).
    way 10 edits: ts=150 uid=21 (attributed through the active window),
    ts=200 uid=22 (own instant wins), ts=250 uid=23 (zero active ->
    windowed out). Expected: contribs = {100/7, 150/21, 200/8},
    uid_sum = 36, n_windowed_out = 1."""
    from oshdb_spark.queries import _member_window_per_ts, _windowed_attribution_agg

    vers = spark.createDataFrame(
        [
            (1, 0, 10, 1, 100, True, True),
            (1, 0, 10, 2, 200, True, False),
        ],
        "rel_id long, m_ord int, child_id long, version int, ts long,"
        " visible boolean, active boolean",
    )
    own = spark.createDataFrame(
        [(1, 100, 7), (1, 200, 8)], "rel_id long, ts long, uid long"
    )
    way_uid = spark.createDataFrame(
        [(10, 150, 21), (10, 200, 22), (10, 250, 23)],
        "child_id long, ts long, uid long",
    )
    child_ts = way_uid.select("child_id", F.col("ts").alias("c_ts"))
    per_slot = _member_window_per_ts(vers, child_ts, "rel_id", per_slot=True)

    out = _windowed_attribution_agg(own, vers, per_slot, way_uid).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_contribs"] == 3
    assert r["n_contributors"] == 3
    assert r["uid_sum"] == 7 + 21 + 8
    assert r["n_windowed_out"] == 1
