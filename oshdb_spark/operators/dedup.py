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

_SEP = "\x1f"  # shingle-internal word separator (never appears in words)

# LSH band buckets above this many members are excluded from candidate
# generation: a degenerate bucket (boilerplate text, near-constant
# documents) otherwise produces O(B^2) pairs inside one bucket — the
# classic LSH blowup at corpus scale. Members of an oversized bucket are
# near-identical by construction, which is exactly the population the
# exact-fingerprint dedup pass (exact_dup_groups) already collapses in
# one hash aggregation, so dropping the bucket loses no information the
# pipeline needs; use ``oversized_buckets`` to disclose what was dropped.
DEFAULT_MAX_BUCKET = 512


def _annotate_buckets(
    bands: DataFrame, keys: list[str], extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Adds ``_bsz`` (bucket size) and ``_rep`` (the bucket's min-id
    member struct) in ONE window execution: both aggregates share the
    bucket-key partitioning, so the cap filter, the star recovery and
    both self-join sides can all read a single checkpointed annotated
    frame instead of each re-running its own window (three window
    executions per gate before this)."""
    wb = Window.partitionBy(*keys)
    rep = F.min(F.struct(F.col("id"), *[F.col(c) for c in extra_cols])).over(wb)
    return bands.withColumn("_bsz", F.count(F.lit(1)).over(wb)).withColumn(
        "_rep", rep
    )


def _cap_buckets(annotated: DataFrame, max_bucket: int | None) -> DataFrame:
    """Rows of band buckets within the cap, annotation columns dropped
    (input must be ``_annotate_buckets`` output)."""
    if max_bucket is None:
        return annotated
    return annotated.filter(F.col("_bsz") <= max_bucket).drop("_bsz", "_rep")


def _oversized(bands: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    return (
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def _star_pairs(
    annotated: DataFrame, max_bucket: int, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Linear-cost recovery pairs for OVERSIZED buckets: every member of
    a bucket with more than ``max_bucket`` rows is paired with the
    bucket's min-id representative — O(B) pairs per bucket instead of
    the O(B^2) self-join the cap exists to avoid. Downstream exact
    verification (Jaccard / Hamming) filters false positives, and for
    connected-components clustering the star keeps genuinely-similar
    bucket members reachable through the representative, so the cap no
    longer silently costs recall for non-identical near-dups stuck in a
    boilerplate bucket (member<->member pairs NOT through the rep are
    still skipped — the disclosed residual). Input must be
    ``_annotate_buckets`` output — the size and representative come
    from the one shared window pass.

    ``extra_cols`` are carried through as ``<col>_a`` (representative's
    value, taken from the same min-id struct) and ``<col>_b``."""
    out_cols = [F.col("_rep.id").alias("id_a"), F.col("id").alias("id_b")]
    for c in extra_cols:
        out_cols.append(F.col(f"_rep.{c}").alias(f"{c}_a"))
        out_cols.append(F.col(c).alias(f"{c}_b"))
    return (
        annotated.filter(F.col("_bsz") > max_bucket)
        .filter(F.col("id") != F.col("_rep.id"))
        .select(*out_cols)
        .distinct()
    )


def shingle_hashes_col(text_col) -> F.Column:
    """int64 hashes of the word 3-gram shingles of a document, built
    entirely JVM-side (lower/split/filter + slice/zip_with + xxhash64)
    so no Python string loop ever runs — docs shorter than 3 words
    collapse to a single whole-doc shingle, empty docs to the hash of ''.

    Construction is slice+zip_with, NOT element_at inside a transform
    lambda: a lambda that indexes into a *computed* array re-evaluates
    the whole split/filter subtree per element (measured quadratic —
    ~15 s for 5k docs); three slices + two zips re-evaluate it a
    constant number of times per row."""
    words = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != F.lit(""))
    n = F.size(words)
    sep = F.lit(_SEP)
    tri = F.zip_with(
        F.zip_with(
            F.slice(words, 1, n - 2),
            F.slice(words, 2, n - 2),
            lambda a, b: F.concat(a, sep, b),
        ),
        F.slice(words, 3, n - 2),
        lambda ab, c: F.concat(ab, sep, c),
    )
    shingles = (
        F.when(n >= 3, tri)
        .when(n >= 1, F.array(F.array_join(words, _SEP)))
        .otherwise(F.array(F.lit("")))
    )
    return F.transform(shingles, lambda s: F.xxhash64(s))


def _minhash_signature_udf():
    """64-permutation MinHash signature per document from the JVM-built
    shingle-hash arrays (UDF built lazily: module-level pandas_udf
    decorators would run at import time inside executors, where no
    SparkSession exists). Only the (T, 64) permutation-min matrix math
    stays in numpy; tokenization/hashing never touches Python."""

    @pandas_udf("array<long>")
    def minhash_signature(hashes: pd.Series) -> pd.Series:
        per_doc = [np.asarray(h, dtype=np.int64) for h in hashes]
        if not per_doc:
            return pd.Series([], dtype=object)
        # one (total_shingles, 64) permutation pass for the whole Arrow
        # batch, then a segmented min per document (reduceat)
        counts = np.array([len(h) for h in per_doc])
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        all_hs = np.concatenate(per_doc).astype(np.uint64)
        vals = (all_hs.astype(np.int64) % MERSENNE)[:, None]  # (T, 1)
        perm = (vals * _A[None, :] + _B[None, :]) % MERSENNE  # (T, 64)
        mins = np.minimum.reduceat(perm, starts, axis=0)  # (docs, 64)
        return pd.Series(list(mins.tolist()))

    return minhash_signature


def _simhash64_udf():
    @pandas_udf("long")
    def simhash64(hashes: pd.Series) -> pd.Series:
        """64-bit SimHash: sign of per-bit votes over the JVM-built
        shingle hashes, batched — one bit-unpack + segmented sum."""
        per_doc = [np.asarray(h, dtype=np.int64) for h in hashes]
        if not per_doc:
            return pd.Series([], dtype="int64")
        counts = np.array([len(h) for h in per_doc])
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        all_hs = np.concatenate(per_doc).astype(np.uint64)
        bits = (
            (all_hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)  # (T, 64)
        votes = np.add.reduceat(bits, starts, axis=0) * 2 - counts[:, None]
        sigs = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(sigs.astype(np.int64), dtype="int64")

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


def _minhash_bands(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, band, bucket) rows of the LSH banding. Signatures are
    materialized once: the band self-join would otherwise duplicate the
    whole signature subtree (shingles + Arrow kernel) into both join
    branches — at scale this is the "write the signature table, then
    join it" step."""
    sigs = docs.select(
        F.col(id_col).alias("id"),
        _minhash_signature_udf()(shingle_hashes_col(F.col(text_col))).alias("sig"),
    ).localCheckpoint(eager=False)
    return sigs.select(
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


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    oversized: str = "star",
) -> DataFrame:
    """Candidate near-dup pairs (a < b) from LSH band buckets. Buckets
    with more than ``max_bucket`` members never enter the O(B^2)
    self-join (see DEFAULT_MAX_BUCKET; ``minhash_oversized_buckets``
    discloses them); their members are instead star-paired with the
    bucket's min-id representative (``oversized="star"``, the default —
    O(B) pairs, recall through the rep after exact verification) or
    dropped entirely (``oversized="drop"``, the pre-round-5 behavior).
    ``max_bucket=None`` disables the cap."""
    if oversized not in ("star", "drop"):
        raise ValueError(f"oversized must be 'star' or 'drop', got {oversized!r}")
    all_bands = _minhash_bands(docs, id_col, text_col)
    if max_bucket is not None:
        # ONE window pass annotates size + representative; the
        # checkpointed annotated frame feeds the cap filter, the star
        # recovery and both self-join sides without re-running either
        # the signature kernel or the window
        all_bands = _annotate_buckets(
            all_bands, ["band", "bucket"]
        ).localCheckpoint(eager=False)
    bands = _cap_buckets(all_bands, max_bucket)
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    if max_bucket is not None and oversized == "star":
        pairs = pairs.unionByName(
            _star_pairs(all_bands, max_bucket)
        ).distinct()
    return pairs


def minhash_oversized_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Disclosure twin of ``minhash_candidates``: the (band, bucket,
    bucket_size) rows the cap excluded from candidate generation."""
    return _oversized(
        _minhash_bands(docs, id_col, text_col), ["band", "bucket"], max_bucket
    )


def jaccard_verify(
    docs: DataFrame, pairs: DataFrame, threshold: float = 0.7,
    id_col: str = "doc_id", text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Exact word-3-gram Jaccard on candidate pairs only (never O(n^2));
    keeps pairs with similarity >= threshold. Pure JVM: shingle-hash
    sets built by ``shingle_hashes_col``, intersected with
    ``array_intersect`` — zero Python in the verify path.

    ``broadcast=True`` ships the whole shingle table to every task —
    right when the doc set is small (the gate fixtures). At corpus
    scale the shingle table exceeds any broadcast budget AND its
    driver-side build is serial; pass ``broadcast=False`` for plain
    shuffle hash joins on the id keys (the 100 TB shape)."""
    d = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingle_hashes_col(F.col(text_col))).alias("hs"),
    )
    side = F.broadcast(d) if broadcast else d
    inter = F.size(F.array_intersect(F.col("da.hs"), F.col("db.hs")))
    union = F.size(F.col("da.hs")) + F.size(F.col("db.hs")) - inter
    joined = (
        pairs.join(side.alias("da"), pairs["id_a"] == F.col("da.id"))
        .join(side.alias("db"), pairs["id_b"] == F.col("db.id"))
        .select(
            "id_a",
            "id_b",
            F.when(union > 0, inter.cast("double") / union)
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)


def jaccard_similarity_join(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    tokens_col: str = "words",
) -> DataFrame:
    """All-pairs exact Jaccard >= threshold WITHOUT the O(n^2) cross
    join: prefix-filtering set-similarity join (the Vernica et al. 2010
    MapReduce formulation, standard in distributed dedup).

    If J(A,B) >= t, then under any consistent global token ordering the
    first ``|A| - ceil(t*|A|) + 1`` tokens of A and of B share at least
    one token. So: order tokens by global frequency (rarest first, the
    most selective choice), explode only each doc's prefix, equi-join
    on the prefix token to get candidates, and verify exact Jaccard on
    candidates only. Everything is JVM-side; the candidate join is a
    plain shuffle hash join on the token key.

    ``docs`` must carry ``id_col`` and an array column ``tokens_col``
    of *distinct* tokens. Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).alias("toks"),
        F.size(tokens_col).alias("n"),
    )
    tok = d.select("id", "n", F.explode("toks").alias("w"))
    df_w = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ranked = tok.join(df_w, "w").withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("df"), F.col("w"))
        ),
    )
    prefix_len = F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1
    # the prefix frame feeds BOTH sides of the candidate self-join;
    # without a checkpoint the explode + document-frequency join + rank
    # window runs twice (the shared-subtree self-join trap — measured
    # ~30% of the sf0.1 query). The materialized frame is small by
    # construction: one row per (doc, prefix token), prefix length
    # (1-t)|A|+1.
    prefix = (
        ranked.filter(F.col("rank") <= prefix_len)
        .select("id", "w")
        .localCheckpoint(eager=False)
    )

    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "w")
        .filter(F.col("pa.id") < F.col("pb.id"))
        .select(F.col("pa.id").alias("id_a"), F.col("pb.id").alias("id_b"))
        .distinct()
    )
    a = d.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"), F.col("n").alias("na"))
    b = d.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"), F.col("n").alias("nb"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return joined.select(
        "id_a", "id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= F.lit(threshold))


def simhash_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents sharing an identical 64-bit SimHash signature."""
    s = docs.select(
        F.col(id_col).alias("id"),
        _simhash64_udf()(shingle_hashes_col(F.col(text_col))).alias("sim"),
    )
    return (
        s.groupBy("sim")
        .agg(F.count(F.lit(1)).alias("cnt"), F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.col("cnt") > 1)
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Min-label propagation connected components over the near-dup
    pair graph — the step that turns pairwise matches into dedup
    clusters (keep min-id doc per cluster). ``nodes``: (id); ``edges``:
    (id_a, id_b). Returns (id, cluster_id = min id of the component).

    Iterative DataFrame joins (the standard large-scale CC shape, cf.
    GraphFrames/Pregel): each round every node takes the min of its own
    and its neighbours' labels; rounds needed = graph diameter, each
    round is one shuffle join + aggregation. ``localCheckpoint`` cuts
    the lineage so plans stay flat across iterations.
    """
    # edges is typically an expensive similarity join; the symmetric
    # union references it twice, so cut its lineage first — both union
    # branches then share one computed RDD instead of re-running the
    # join per direction (the shared-subtree checkpoint invariant)
    edges = edges.localCheckpoint(eager=False)
    sym = edges.selectExpr("id_a AS src", "id_b AS dst").unionByName(
        edges.selectExpr("id_b AS src", "id_a AS dst")
    ).localCheckpoint(eager=False)
    labels = nodes.select(F.col("id"), F.col("id").alias("lab"))
    for it in range(max_iter):
        # (a) neighbour min
        nbr_min = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        l1 = labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left").select(
            "id",
            F.least(F.col("lab"), F.coalesce(F.col("nbr_lab"), F.col("lab"))).alias(
                "lab"
            ),
        )
        # (b) pointer doubling: lab <- lab(lab) — collapses chains in
        # O(log diameter) rounds instead of O(diameter)
        parent = l1.select(F.col("id").alias("p_id"), F.col("lab").alias("p_lab"))
        l2 = l1.join(parent, l1["lab"] == parent["p_id"], "left").select(
            "id",
            F.least(F.col("lab"), F.coalesce(F.col("p_lab"), F.col("lab"))).alias(
                "lab"
            ),
        )
        new_labels = l2.localCheckpoint(eager=True)
        # convergence check is a driver action (a job per check); with
        # pointer doubling labels converge in O(log diameter) rounds, so
        # probing every 2nd round halves the driver jobs at no risk
        if (it + 1) % 2 == 0 or it == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.lab") != F.col("o.lab"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels.select(F.col("id"), F.col("lab").alias("cluster_id"))


SIMHASH_BANDS = 4  # 4 x 16-bit bands: complete for hamming <= 3


def _simhash_bands(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sim, band, val) rows of the 4x16-bit SimHash banding;
    signatures materialized once (the self-join would compute the
    shingle + kernel subtree twice otherwise)."""
    s = docs.select(
        F.col(id_col).alias("id"),
        _simhash64_udf()(shingle_hashes_col(F.col(text_col))).alias("sim"),
    ).localCheckpoint(eager=False)
    return s.select(
        "id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sim"), 16 * b).bitwiseAND(F.lit(0xFFFF))
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "val"),
    )


def _probe_masks(probe_bits: int, width: int = 16) -> list[int]:
    """All XOR masks of Hamming weight <= probe_bits over a band of
    ``width`` bits, in a fixed deterministic order (weight-0, then
    weight-1 ascending, then weight-2 lexicographic)."""
    masks = [0]
    if probe_bits >= 1:
        masks += [1 << i for i in range(width)]
    if probe_bits >= 2:
        masks += [(1 << i) | (1 << j) for i in range(width) for j in range(i + 1, width)]
    if probe_bits >= 3:
        raise ValueError("probe_bits > 2 is unsupported (probe count explodes)")
    return masks


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    probe_bits: int = 0,
    oversized: str = "star",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded: candidates
    must share one of 4 16-bit signature bands, then the exact distance
    check is a JVM ``bit_count(a ^ b)``.

    ``probe_bits`` adds multi-probe flips: each row additionally joins
    under every band value within Hamming distance ``probe_bits`` of
    its own (the standard multi-probe LSH perturbation). Pigeonhole
    over 4 bands makes candidate generation COMPLETE for signature
    distance ``4 * probe_bits + 3`` (d <= 3 at the default 0, d <= 7 at
    1, d <= 11 at 2); above that it is a high-recall heuristic. The
    probe side fans out x(1 + 16 + 120) rows at probe_bits=2 — a
    disclosed, bounded cost that keeps the join an equi-join, never
    O(n^2).

    Band buckets above ``max_bucket`` members never enter the self-join
    (the boilerplate-blowup cap; ``simhash_oversized_buckets`` discloses
    them); with ``oversized="star"`` (default) their members are
    star-paired with the bucket's min-id representative and kept iff
    the exact distance passes, ``oversized="drop"`` restores the
    pre-round-5 silent drop."""
    if oversized not in ("star", "drop"):
        raise ValueError(f"oversized must be 'star' or 'drop', got {oversized!r}")
    all_bands = _simhash_bands(docs, id_col, text_col)
    if max_bucket is not None:
        # ONE window pass annotates size + representative; the
        # checkpointed annotated frame feeds the probe side, the exact
        # side, the cap filter and the star recovery — one banding
        # computation AND one window execution
        all_bands = _annotate_buckets(
            all_bands, ["band", "val"], extra_cols=("sim",)
        ).localCheckpoint(eager=False)
    elif probe_bits > 0:
        # probe + exact sides still share one banding computation
        all_bands = all_bands.localCheckpoint(eager=False)
    bands = _cap_buckets(all_bands, max_bucket)
    if probe_bits > 0:
        masks = _probe_masks(probe_bits)
        probes = bands.select(
            "id",
            "sim",
            "band",
            F.explode(
                F.array(*[F.col("val").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("val"),
        )
    else:
        probes = bands
    cand = (
        probes.alias("a")
        .join(bands.alias("b"), ["band", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .distinct()
    )
    if max_bucket is not None and oversized == "star":
        star = _star_pairs(all_bands, max_bucket, extra_cols=("sim",))
        cand = cand.unionByName(
            star.select(
                "id_a",
                "id_b",
                F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
            )
        ).distinct()
    return cand.filter(F.col("hamming") <= max_hamming)


def simhash_oversized_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Disclosure twin of ``simhash_neardup_pairs``: the (band, val,
    bucket_size) rows the cap excluded from candidate generation."""
    return _oversized(
        _simhash_bands(docs, id_col, text_col), ["band", "val"], max_bucket
    )
