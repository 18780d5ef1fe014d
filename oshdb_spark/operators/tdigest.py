"""t-digest quantile sketch — the reference's estimatedMedian /
estimatedQuantiles reducer (``TDigestReducer.java:21-39``, tdunning
MergingDigest, COMPRESSION=1000) re-derived from the published
algorithm (Dunning & Ertl, "Computing extremely accurate quantiles
using t-digests") as a distributed two-stage Spark reducer:

1. **partial** — per (group, partition) the raw values collapse into a
   bounded centroid list (mean, weight) via the merging rule with the
   k1 scale function ``k(q) = (delta / 2pi) * asin(2q - 1)``: a sorted
   single pass greedily absorbs neighbours while the centroid's
   q-span stays under one k-unit. ``applyInPandas`` per group-chunk;
   all numpy, no per-row Python.
2. **merge** — centroids from all partials of a group concatenate and
   re-merge with the same rule (the t-digest monoid — merging digests
   IS running the same compaction over their centroids), then
   quantiles interpolate linearly between centroid means with the
   standard half-weight rank convention.

Scale shape: stage 1 reduces each partition's rows to <= ~2*delta
centroids, so the only shuffle moves O(groups x partitions x delta)
small arrays, never raw values — the same reason the reference ships
t-digests, not samples, between Ignite nodes. Accuracy is
rank-bounded near the tails by construction; the catalog gate asserts
the rank-tolerance contract (estimate between exact quantiles at
q +/- margin), the same surface the approx_percentile gate uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELTA = 100.0  # compression: max centroids ~ 2*delta


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    """k1 scale function (paper eq. 2): tail-biased centroid budget."""
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def merge_centroids(
    means: np.ndarray, weights: np.ndarray, delta: float = DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """One merging-digest compaction pass: sort by mean, then greedily
    absorb neighbours while the merged centroid spans < 1 k-unit.
    Accepts raw values (weight 1 each) or centroids; merging two
    digests = concatenating their centroids and re-compacting (the
    monoid operation of TDigestReducer.java:23-39)."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="stable")
    m = np.asarray(means, dtype=np.float64)[order]
    w = np.asarray(weights, dtype=np.float64)[order]
    total = w.sum()
    out_m: list[float] = [m[0]]
    out_w: list[float] = [w[0]]
    w_so_far = 0.0  # weight strictly before the open centroid
    k_lo = _k_scale(np.array([0.0]), delta)[0]
    for i in range(1, len(m)):
        cand_w = out_w[-1] + w[i]
        q_hi = (w_so_far + cand_w) / total
        if _k_scale(np.array([q_hi]), delta)[0] - k_lo <= 1.0:
            # absorb: weighted mean keeps the centroid unbiased
            out_m[-1] = (out_m[-1] * out_w[-1] + m[i] * w[i]) / cand_w
            out_w[-1] = cand_w
        else:
            w_so_far += out_w[-1]
            k_lo = _k_scale(np.array([w_so_far / total]), delta)[0]
            out_m.append(m[i])
            out_w.append(w[i])
    return np.asarray(out_m), np.asarray(out_w)


def digest_quantiles(
    means: np.ndarray, weights: np.ndarray, qs: list[float]
) -> list[float]:
    """Quantile estimates from a compacted digest: centroids anchor at
    their half-weight cumulative rank; linear interpolation between
    anchors, clamped to the extreme centroid means."""
    if len(means) == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(weights) - weights / 2.0
    total = weights.sum()
    out = []
    for q in qs:
        r = q * total
        out.append(float(np.interp(r, cum, means)))
    return out


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    qs: list[float],
    delta: float = DELTA,
) -> DataFrame:
    """Distributed t-digest quantiles per key group. Returns one row per
    group with ``q_<pct>`` estimate columns."""
    spark_qs = list(qs)
    key_fields = ", ".join(f"{k} long" for k in keys)
    part_schema = f"{key_fields}, means array<double>, weights array<double>"
    out_schema = f"{key_fields}, " + ", ".join(
        f"q_{int(q * 100)} double" for q in spark_qs
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy(dtype=np.float64)
        m, w = merge_centroids(v, np.ones_like(v), delta)
        row = {k: pdf[k].iloc[0] for k in keys}
        row["means"] = m.tolist()
        row["weights"] = w.tolist()
        return pd.DataFrame([row])

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        m, w = merge_centroids(m, w, delta)
        est = digest_quantiles(m, w, spark_qs)
        row = {k: pdf[k].iloc[0] for k in keys}
        for q, e in zip(spark_qs, est):
            row[f"q_{int(q * 100)}"] = e
        return pd.DataFrame([row])

    with_pid = df.withColumn("_pid", F.spark_partition_id())
    partials = with_pid.groupBy(*keys, "_pid").applyInPandas(partial, part_schema)
    return partials.groupBy(*keys).applyInPandas(final, out_schema)
