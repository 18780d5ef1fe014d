"""t-digest merging sketch (TDigestReducer.java parity surface):
compaction bounds, monoid merge, rank-accuracy contract, and the
distributed two-stage reducer."""

from __future__ import annotations

import numpy as np
import pytest

from oshdb_spark.operators.tdigest import (
    digest_quantiles,
    merge_centroids,
    tdigest_quantiles,
)


def exact_q(v, q):
    return float(np.quantile(v, q))


def rank_of(v, x):
    return float(np.searchsorted(np.sort(v), x) / len(v))


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal", "bimodal"])
def test_accuracy_rank_contract(dist):
    rng = np.random.default_rng(7)
    n = 50_000
    v = {
        "uniform": rng.uniform(0, 1, n),
        "normal": rng.normal(0, 1, n),
        "lognormal": rng.lognormal(0, 1, n),
        "bimodal": np.concatenate([rng.normal(-5, 1, n // 2), rng.normal(5, 1, n // 2)]),
    }[dist]
    m, w = merge_centroids(v, np.ones_like(v), delta=100.0)
    assert len(m) <= 250  # bounded by ~2*delta
    assert w.sum() == pytest.approx(len(v))
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = digest_quantiles(m, w, [q])[0]
        # rank error contract: |rank(est) - q| small, tighter at tails
        tol = 0.005 if q in (0.01, 0.99) else 0.02
        assert abs(rank_of(v, est) - q) <= tol, (dist, q)


def test_monoid_merge_matches_single_pass():
    """Merging two digests then compacting approximates the digest of
    the union — both must satisfy the same rank contract."""
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 20_000)
    b = rng.normal(3, 2, 30_000)
    ma, wa = merge_centroids(a, np.ones_like(a), delta=100.0)
    mb, wb = merge_centroids(b, np.ones_like(b), delta=100.0)
    mm, wm = merge_centroids(
        np.concatenate([ma, mb]), np.concatenate([wa, wb]), delta=100.0
    )
    assert wm.sum() == pytest.approx(50_000)
    assert len(mm) <= 250
    both = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9):
        est = digest_quantiles(mm, wm, [q])[0]
        assert abs(rank_of(both, est) - q) <= 0.02, q


def test_empty_and_single():
    m, w = merge_centroids(np.array([]), np.array([]))
    assert len(m) == 0
    assert np.isnan(digest_quantiles(m, w, [0.5])[0])
    m, w = merge_centroids(np.array([42.0]), np.array([1.0]))
    assert digest_quantiles(m, w, [0.0])[0] == 42.0
    assert digest_quantiles(m, w, [1.0])[0] == 42.0


def test_weight_and_range_invariants():
    rng = np.random.default_rng(3)
    v = rng.exponential(2.0, 10_000)
    m, w = merge_centroids(v, np.ones_like(v), delta=50.0)
    assert w.sum() == pytest.approx(len(v))
    assert m.min() >= v.min() and m.max() <= v.max()
    # means are sorted (digest invariant)
    assert (np.diff(m) >= 0).all()


def test_distributed_reducer_matches_exact_within_tolerance(spark):
    rng = np.random.default_rng(23)
    rows = []
    data = {}
    for g in (1, 2):
        v = rng.normal(g * 10.0, 3.0, 20_000)
        data[g] = v
        rows += [(int(g), float(x)) for x in v]
    df = spark.createDataFrame(rows, "g long, v double").repartition(8)
    out = tdigest_quantiles(df, "v", ["g"], [0.25, 0.5, 0.75], delta=200.0)
    got = {r["g"]: (r["q_25"], r["q_50"], r["q_75"]) for r in out.collect()}
    for g, v in data.items():
        for est, q in zip(got[g], (0.25, 0.5, 0.75)):
            assert abs(rank_of(v, est) - q) <= 0.02, (g, q)
