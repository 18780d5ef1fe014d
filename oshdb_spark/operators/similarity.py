"""Similarity search over the ``embeddings`` table (array<float>):

* ``cosine_topk`` — brute-force exact top-k: dot products computed with
  JVM higher-order functions (``zip_with`` + ``aggregate``), no Python
  in the loop. The O(Q x N) join is broadcast on the (small) query
  side; correct baseline and the verifier for the approximate path.
* ``ivf_topk`` — IVF-style approximate path for scale: vectors are
  assigned to their nearest centroid once (cheap kernel), queries probe
  only ``nprobe`` nearest centroid lists; candidate join is an
  equi-join on centroid id. Recall vs the brute-force baseline is
  asserted in tests, not assumed.

At 10^12 scale the IVF list assignment is the partition key — probing
becomes partition pruning, and the brute-force path exists only for
sampled verification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity; queries must have (q_id, q_vec).
    Ties broken by neighbour id. Self-matches (q_id == vec_id) excluded."""
    v = vectors.select(
        F.col(id_col).alias("nbr_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("v_norm", _norm(F.col("v")))
    q = queries.select(
        "q_id", F.transform(F.col("q_vec"), lambda x: x.cast("double")).alias("qv")
    ).withColumn("q_norm", _norm(F.col("qv")))

    scored = (
        F.broadcast(q)
        .join(v, F.col("q_id") != F.col("nbr_id"))
        .select(
            "q_id",
            "nbr_id",
            F.round(
                _dot(F.col("qv"), F.col("v"))
                / (F.col("q_norm") * F.col("v_norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def assign_centroids(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment in one Arrow kernel (numpy matmul
    over the whole batch)."""
    C = np.asarray(centroids, dtype=np.float64)  # (c, d)

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        M = np.array(vecs.tolist(), dtype=np.float64)  # (n, d)
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return vectors.withColumn("centroid", nearest(F.col(vec_col)))


def train_kmeans(
    vectors: DataFrame,
    k: int = 8,
    sample: int = 2048,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> list[list[float]]:
    """Deterministic sampled k-means for IVF list training: a bounded
    hash-sampled subset is collected (driver-side numpy, k-means++ init
    + Lloyd) — the standard way IVF indexes are trained (sample, fit,
    broadcast). At 10^12 scale the sample stays a few thousand rows; the
    expensive part (assignment of all vectors) remains distributed in
    ``assign_centroids``. Deterministic: hash-based sampling (no rand())
    and a fixed-seed RNG, so re-runs and resumes see identical lists."""
    n_total = vectors.count()
    if n_total > sample:
        # deterministic hash sample of ~`sample` rows (xxhash64 of the id)
        mod = max(1, n_total // sample)
        sampled = vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
    else:
        sampled = vectors
    rows = sampled.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    # k-means++ seeding
    cents = [X[int(rng.integers(len(X)))]]
    for _ in range(1, k):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(X), 1.0 / len(X))
        cents.append(X[int(rng.choice(len(X), p=probs))])
    C = np.asarray(cents)
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        for j in range(k):
            pts = X[lab == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
    return C.tolist()


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest centroid lists."""
    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        M = np.array(vecs.tolist(), dtype=np.float64)
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        # stable sort: ties break toward the lower centroid id, matching
        # the SQL oracle's ORDER BY dist, cid (default quicksort would
        # order tied distances arbitrarily)
        order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    assigned = assign_centroids(vectors, centroids, vec_col).select(
        F.col(id_col).alias("nbr_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        "centroid",
    ).withColumn("v_norm", _norm(F.col("v")))

    q = queries.select(
        "q_id",
        F.transform(F.col("q_vec"), lambda x: x.cast("double")).alias("qv"),
        F.explode(probes(F.col("q_vec"))).alias("centroid"),
    ).withColumn("q_norm", _norm(F.col("qv")))

    scored = (
        F.broadcast(q)
        .join(assigned, ["centroid"])
        .filter(F.col("q_id") != F.col("nbr_id"))
        .select(
            "q_id",
            "nbr_id",
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6
            ).alias("cosine"),
        )
        .dropDuplicates(["q_id", "nbr_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# SRP-LSH: random-hyperplane signatures for embedding near-dup at scale
# ---------------------------------------------------------------------------

SRP_SEED = 29
SRP_BITS = 32
SRP_BAND_BITS = 8


def srp_hyperplanes(
    dim: int, bits: int = SRP_BITS, seed: int = SRP_SEED
) -> list[list[float]]:
    """Deterministic random-hyperplane matrix (bits x dim). Seeded, so
    the SQL oracle can consume the exact same literals — and re-runs /
    resumes see identical signatures."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def srp_band_cols(e, planes: list[list[float]], band_bits: int = SRP_BAND_BITS):
    """Signature band Columns from JVM-side sequential dot-product
    folds (zip_with + aggregate, strictly left-to-right — the same
    accumulation order the SQL oracle's list_dot_product applies, so
    the sign of each projection matches bit-for-bit). Each band packs
    ``band_bits`` sign bits into one small int — the LSH bucket key."""
    def dot_lit(row):
        arr = F.array(*[F.lit(float(x)) for x in row])
        return F.aggregate(
            F.zip_with(e, arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bits = [(dot_lit(row) >= 0).cast("int") for row in planes]
    nb = len(planes) // band_bits
    bands = []
    for b in range(nb):
        val = F.lit(0)
        for i in range(band_bits):
            val = val + bits[b * band_bits + i] * F.lit(1 << i)
        bands.append(val.alias(f"band{b}"))
    return bands


def srp_neardup_pairs(
    vectors: DataFrame,
    threshold: float | None,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "e",
    bits: int = SRP_BITS,
    band_bits: int = SRP_BAND_BITS,
) -> DataFrame:
    """Embedding near-duplicate candidates via SRP-LSH banding:
    candidates must share at least one signature band (hash-join bucket
    keys — never an all-pairs product), then the exact cosine is
    attached per candidate. The scale path of embedding dedup: at 10^12
    rows the band columns are the shuffle/partition keys and candidate
    volume follows collision probability (1 - theta/pi)^band_bits per
    band, not n^2. Recall vs the brute-force twin is measured in
    pytest — SRP banding is a high-recall filter for HIGH thresholds
    (near-dup); at low thresholds it is deliberately lossy, which is
    why the brute-force twin stays the verifier.

    ``threshold=None`` returns every verified candidate (callers add
    their own cut); a float filters to cosine >= threshold. Returns
    (id_a, id_b, cosine) with cosine rounded to 6 decimals.
    """
    planes = srp_hyperplanes(dim, bits)
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col(vec_col), F.col(vec_col), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    sig = vectors.select(
        F.col(id_col).alias("sid"),
        F.col(vec_col).alias("sv"),
        norm.alias("sn"),
        *srp_band_cols(F.col(vec_col), planes, band_bits),
    ).localCheckpoint(eager=False)  # 32 folds: never recompute per join branch
    nb = bits // band_bits
    banded = sig.select(
        "sid",
        "sv",
        "sn",
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(nb)])).alias(
            "band_idx", "band_val"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.sid") < F.col("b.sid")),
        )
        .select(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            F.col("a.sv").alias("va"),
            F.col("b.sv").alias("vb"),
            F.col("a.sn").alias("na"),
            F.col("b.sn").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / (F.col("na") * F.col("nb"))
    out = cand.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    if threshold is not None:
        out = out.filter(F.col("cosine") >= threshold)
    return out
