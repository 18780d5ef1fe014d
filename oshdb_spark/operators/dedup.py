"""Deduplication operators over the ``documents`` table: exact,
MinHash+LSH, SimHash, and n-gram Jaccard verification.

Scale shape (the part that matters at 100 TB):

* exact / fingerprint dedup — one hash aggregation on a digest column.
* MinHash LSH — per-doc signatures in an Arrow-batched kernel (numpy,
  all documents of a batch hashed at once), then band buckets via
  ``explode`` + a self-equi-join on (band, bucket): candidate
  generation is a hash join on bucket keys, never an O(n^2) cross
  join. Verification (true Jaccard) runs only on candidate pairs.
* SimHash — 64-bit signature via vectorized bit voting; near-dup =
  identical signature (or small Hamming radius via multi-probe bands
  of the signature).

All hashing is deterministic (splitmix64 over token bytes, fixed
seeds) so results are reproducible across runs and processes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from oshdb_spark.operators.text import fingerprint_col

MERSENNE = (1 << 61) - 1
N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS

_rng = np.random.default_rng(42)
_A = _rng.integers(1, MERSENNE, N_HASHES, dtype=np.int64)
_B = _rng.integers(0, MERSENNE, N_HASHES, dtype=np.int64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4B9FF3)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _token_hashes(text: str) -> np.ndarray:
    """Hash the word 3-gram shingles of one document to uint64."""
    words = text.lower().split()
    if len(words) < 3:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    if not shingles:
        return np.zeros(1, dtype=np.uint64)
    # stable python hash replacement: polynomial over bytes, then mixed
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(1469598103934665603)
        for b in s.encode():
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return _splitmix64(out)


def _minhash_signature_udf():
    """64-permutation MinHash signature per document (UDF built lazily:
    module-level pandas_udf decorators would run at import time inside
    executors, where no SparkSession exists)."""

    @pandas_udf("array<long>")
    def minhash_signature(texts: pd.Series) -> pd.Series:
        sigs = []
        for t in texts:
            hs = _token_hashes(t or "")
            vals = (hs.astype(np.int64) % MERSENNE)[:, None]  # (S, 1)
            perm = (vals * _A[None, :] + _B[None, :]) % MERSENNE  # (S, 64)
            sigs.append(perm.min(axis=0).tolist())
        return pd.Series(sigs)

    return minhash_signature


def _simhash64_udf():
    @pandas_udf("long")
    def simhash64(texts: pd.Series) -> pd.Series:
        """64-bit SimHash: sign of per-bit votes over shingle hashes."""
        out = []
        for t in texts:
            hs = _token_hashes(t or "")
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(i)
            out.append(np.int64(sig.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return simhash64


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, dup_cnt, doc_ids) for groups with >1 member."""
    fp = fingerprint_col(F.col(text_col))
    return (
        docs.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_cnt"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("dup_cnt") > 1)
    )


def minhash_candidates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs (a < b) from LSH band buckets."""
    sigs = docs.select(
        F.col(id_col).alias("id"), _minhash_signature_udf()(F.col(text_col)).alias("sig")
    )
    bands = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.hash(*[F.col("sig")[i] for i in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)])
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame, pairs: DataFrame, threshold: float = 0.7,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact word-3-gram Jaccard on candidate pairs only (never O(n^2));
    keeps pairs with similarity >= threshold."""

    @pandas_udf("double")
    def jac(a: pd.Series, b: pd.Series) -> pd.Series:
        vals = []
        for x, y in zip(a, b):
            sa, sb = set(_token_hashes(x or "").tolist()), set(_token_hashes(y or "").tolist())
            inter = len(sa & sb)
            union = len(sa | sb)
            vals.append(inter / union if union else 0.0)
        return pd.Series(vals)

    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    joined = (
        pairs.join(F.broadcast(d).alias("da"), pairs["id_a"] == F.col("da.id"))
        .join(F.broadcast(d).alias("db"), pairs["id_b"] == F.col("db.id"))
        .select("id_a", "id_b", jac(F.col("da.t"), F.col("db.t")).alias("jaccard"))
    )
    return joined.filter(F.col("jaccard") >= threshold)


def simhash_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents sharing an identical 64-bit SimHash signature."""
    s = docs.select(F.col(id_col).alias("id"), _simhash64_udf()(F.col(text_col)).alias("sim"))
    return (
        s.groupBy("sim")
        .agg(F.count(F.lit(1)).alias("cnt"), F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.col("cnt") > 1)
    )
