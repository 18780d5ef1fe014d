"""kNN exactness across configurations: the ring-expansion operator
must equal brute force for ANY (zoom, ring, k) — the ring guarantee
accepts only provably-complete results and everything else takes the
exact fallback, so config choices affect speed, never answers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.knn import knn

N_POINTS = 400
N_QUERIES = 12


@pytest.fixture(scope="module")
def points_queries(spark):
    rng = np.random.default_rng(11)
    pts = pd.DataFrame(
        {
            "entity_id": np.arange(N_POINTS, dtype=np.int64),
            "lon_e7": rng.integers(-1_799_000_000, 1_799_000_000, N_POINTS),
            "lat_e7": rng.integers(-890_000_000, 890_000_000, N_POINTS),
        }
    )
    qs = pd.DataFrame(
        {
            "q_id": np.arange(N_QUERIES, dtype=np.int64),
            "q_lon": rng.integers(-1_700_000_000, 1_700_000_000, N_QUERIES),
            "q_lat": rng.integers(-800_000_000, 800_000_000, N_QUERIES),
        }
    )
    return (
        spark.createDataFrame(pts).cache(),
        spark.createDataFrame(qs).cache(),
        pts,
        qs,
    )


def _brute(pts: pd.DataFrame, qs: pd.DataFrame, k: int) -> set:
    out = set()
    for q in qs.itertuples(index=False):
        d2 = (
            (pts["lon_e7"] - q.q_lon).astype(float) ** 2
            + (pts["lat_e7"] - q.q_lat).astype(float) ** 2
        )
        order = sorted(zip(d2, pts["entity_id"]))[:k]
        for rank, (_, eid) in enumerate(order, start=1):
            out.add((q.q_id, rank, eid))
    return out


@pytest.mark.parametrize(
    "zoom,ring,k",
    [(2, 1, 3), (3, 1, 5), (3, 2, 8), (4, 1, 5), (4, 2, 10), (5, 1, 4)],
)
def test_knn_exact_for_any_config(points_queries, zoom, ring, k):
    pdf, qdf, pts, qs = points_queries
    got = {
        (r["q_id"], r["rank"], r["entity_id"])
        for r in knn(pdf, qdf, k=k, zoom=zoom, ring=ring).collect()
    }
    assert got == _brute(pts, qs, k)


def test_knn_sparse_points_all_fallback(spark):
    """Fewer points than k everywhere and escalation capped below the
    complete-cover ring: every query takes the full-scan fallback and
    still returns the full exact ranking."""
    pts = spark.createDataFrame(
        [(i, i * 100_000_000 - 400_000_000, 0) for i in range(4)],
        "entity_id long, lon_e7 long, lat_e7 long",
    )
    qs = spark.createDataFrame(
        [(0, 0, 0), (1, 900_000_000, 0)], "q_id long, q_lon long, q_lat long"
    )
    got = knn(pts, qs, k=10, zoom=4, ring=1, max_ring=2)
    per_q = got.groupBy("q_id").count().collect()
    assert {r["q_id"]: r["count"] for r in per_q} == {0: 4, 1: 4}


def test_knn_complete_ring_cover_never_full_scans(spark):
    """Fewer points than k everywhere, but escalation reaches the ring
    that covers the whole grid (zoom 4 -> ring 8): candidates are all
    points, the result is exact, and NO full-scan branch exists."""
    pts = spark.createDataFrame(
        [(i, i * 100_000_000 - 400_000_000, 0) for i in range(4)],
        "entity_id long, lon_e7 long, lat_e7 long",
    )
    qs = spark.createDataFrame(
        [(0, 0, 0), (1, 900_000_000, 0)], "q_id long, q_lon long, q_lat long"
    )
    got = knn(pts, qs, k=10, zoom=4, ring=1)
    assert "BroadcastNestedLoopJoin" not in _plan_of(got)
    per_q = got.groupBy("q_id").count().collect()
    assert {r["q_id"]: r["count"] for r in per_q} == {0: 4, 1: 4}


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_knn_sparse_corner_escalates_without_full_scan(spark):
    """The VERDICT r3 scale-killer (c): a sparse-region query must not
    trigger a scan of the whole points table. A cluster ~3 cells from
    the query at zoom 5 yields zero ring-1 candidates; escalation
    resolves it at ring 4 with the distance guarantee, the result
    equals brute force, and the plan contains NO BroadcastNestedLoopJoin
    (the full-scan fallback was never built)."""
    # zoom 5: w_cell = 3_600_000_000 / 32 = 112_500_000; the cluster
    # sits ~3.2 cell widths east of the query (Chebyshev cell dist 3)
    pts = spark.createDataFrame(
        [(i, 360_000_000 + i * 1_000_000, 0) for i in range(10)],
        "entity_id long, lon_e7 long, lat_e7 long",
    )
    qs = spark.createDataFrame([(0, 0, 0)], "q_id long, q_lon long, q_lat long")
    got = knn(pts, qs, k=3, zoom=5, ring=1)
    assert "BroadcastNestedLoopJoin" not in _plan_of(got)
    rows = {(r["q_id"], r["rank"], r["entity_id"]) for r in got.collect()}
    assert rows == {(0, 1, 0), (0, 2, 1), (0, 3, 2)}
