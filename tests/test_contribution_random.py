"""Adversarial randomized check of the contribution classifier
(`operators/contribution.contributions`) against a pure-Python walk of
the reference semantics (``CellIterator.java:437-711`` +
``OSHEntities.java:240-267``): changeset collapsing keep-last,
filter-relative CREATION/DELETION (effective visibility = visible AND
matches), null-safe tag/geometry diffs, and the keep_before gating
(no before-state on CREATION). Random histories hit the combinations
the fixed fixtures can't: NULL diff columns, repeated changesets,
invisible runs, match flapping."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.contribution import contributions


def _naive(rows, pred):
    """rows: list of dicts for ONE entity, ordered by version.
    Returns {version: (contrib_type, before_lon)} per the reference walk."""
    # changeset collapsing: keep the last version of each changeset run
    # (changesets are non-decreasing per entity, so group == run)
    collapsed = {}
    for r in rows:
        collapsed[r["changeset"]] = r  # later version overwrites
    walk = sorted(collapsed.values(), key=lambda r: r["version"])

    out = {}
    prev = None
    prev_match = False
    for r in walk:
        curr_match = bool(r["visible"] and pred(r))
        ctype = None
        if curr_match and not prev_match:
            ctype = "CREATION"
        elif not curr_match and prev_match:
            ctype = "DELETION"
        elif curr_match and prev_match:
            tags = any(r[c] != prev[c] for c in ("tag_building", "tag_v"))
            geom = any(r[c] != prev[c] for c in ("lon_e7", "lat_e7"))
            if tags and geom:
                ctype = "TAG_CHANGE,GEOMETRY_CHANGE"
            elif tags:
                ctype = "TAG_CHANGE"
            elif geom:
                ctype = "GEOMETRY_CHANGE"
            else:
                ctype = "OTHER"
        if ctype is not None:
            before_lon = prev["lon_e7"] if prev_match else None
            out[r["version"]] = (ctype, before_lon)
        prev, prev_match = r, curr_match
    return out


@pytest.mark.parametrize("seed", [7, 20260817])
def test_contribution_classifier_matches_naive_walk(spark, seed):
    rng = np.random.default_rng(seed)
    data, expected = [], {}

    def maybe_null(v, p=0.15):
        return None if rng.random() < p else int(v)

    for e in range(150):
        k = int(rng.integers(2, 9))
        cs, ts = 0, 1000
        rows = []
        for v in range(1, k + 1):
            cs += int(rng.integers(0, 2))  # non-decreasing, repeats likely
            ts += int(rng.integers(1, 5))
            rows.append({
                "entity_id": e,
                "version": v,
                "ts": ts,
                "visible": bool(rng.random() > 0.2),
                "changeset": cs,
                "tag_building": maybe_null(rng.integers(0, 2)),
                "tag_v": maybe_null(rng.integers(0, 4)),
                "lon_e7": maybe_null(rng.integers(0, 3)),
                "lat_e7": int(rng.integers(0, 3)),
            })
        data += rows
        pred = lambda r: r["tag_v"] is not None and r["tag_v"] != 0
        for ver, exp in _naive(rows, pred).items():
            expected[(e, ver)] = exp

    df = spark.createDataFrame(
        data,
        "entity_id long, version int, ts long, visible boolean,"
        " changeset long, tag_building int, tag_v int,"
        " lon_e7 long, lat_e7 long",
    )
    got = {
        (r["entity_id"], r["version"]): (r["contrib_type"], r["before_lon_e7"])
        for r in contributions(
            df,
            predicate=F.col("tag_v").isNotNull() & (F.col("tag_v") != 0),
            keep_before=("lon_e7",),
        ).collect()
    }
    assert set(got) == set(expected)
    mismatches = [(k, got[k], expected[k]) for k in expected if got[k] != expected[k]]
    assert not mismatches, mismatches[:10]


def test_changeset_collapsing_is_run_based(spark):
    """The reference keeps a version iff its changeset differs from the
    NEXT version's (OSHEntities.java:255-264 newest-first walk) — an
    interrupted run (A, B, A) keeps all three versions; grouping
    globally by (entity, changeset) would wrongly drop the first A.
    Consecutive runs still collapse to their last version."""
    from oshdb_spark.operators.contribution import collapse_changesets

    rows = [
        # entity 1: interrupted run A, B, A -> all kept
        (1, 1, 10, True, 100), (1, 2, 20, True, 200), (1, 3, 30, True, 100),
        # entity 2: consecutive run A, A, B -> v2 and v3 kept
        (2, 1, 10, True, 100), (2, 2, 20, True, 100), (2, 3, 30, True, 200),
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, version int, ts long, visible boolean, changeset long"
    )
    got = {
        (r["entity_id"], r["version"])
        for r in collapse_changesets(df).collect()
    }
    assert got == {(1, 1), (1, 2), (1, 3), (2, 2), (2, 3)}


def test_ts_bucket_is_half_open(spark):
    """The aggregateByTimestamp study interval is [first, last)
    (OSHDBTimestampInterval.includes, :30-33): the final boundary
    closes the last interval — timestamps at/after it are out of
    range, exactly like timestamps before the first boundary."""
    from oshdb_spark.operators.aggregate import ts_bucket

    bounds = [100, 200, 300]
    df = spark.createDataFrame(
        [(50,), (100,), (150,), (200,), (299,), (300,), (350,)], "ts long"
    )
    got = [r["b"] for r in df.select(ts_bucket(F.col("ts"), bounds).alias("b"))
           .orderBy("ts").collect()]
    assert got == [None, 100, 100, 200, 200, None, None]
