"""spark-submit entrypoint: the end-to-end training-data document
pipeline, checkpointed and resumable.

    raw docs -> exact-dedup (keep min per fingerprint)
             -> quality + language signals (pure Column)
             -> MinHash-LSH near-dup candidates -> Jaccard verify
             -> connected components -> cluster keep/drop decision
             -> bucket-partitioned output + per-bucket lineage manifests

Usage:
    spark-submit --py-files oshdb_spark.zip jobs/run_doc_pipeline.py \
        [sf_dir] [out_dir] [num_buckets] [wave_size]

Re-running after a kill resumes at bucket granularity (the
CheckpointedStage contract): committed buckets are skipped, a changed
input fingerprint invalidates stale manifests. Every stage is the same
operator the catalog gates — this job only sequences them.
"""
import json
import sys

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def build_pipeline(spark: SparkSession, sf_dir: str, docs=None):
    from oshdb_spark.operators.dedup import (
        connected_components,
        jaccard_verify,
        minhash_candidates,
    )
    from oshdb_spark.operators.text import (
        fingerprint_col,
        lang_id_col,
        quality_cols,
        token_count_col,
    )

    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. exact dedup: min doc_id per fingerprint is the exact keeper;
    # every doc (keeper or exact dup) gets a decision row — dups carry
    # the keeper as their cluster and stop here, only keepers continue
    # into the (expensive) near-dup stage
    fp = docs.withColumn("fingerprint", fingerprint_col(F.col("text")))
    fp = fp.withColumn(
        "_exact_keeper", F.min("doc_id").over(Window.partitionBy("fingerprint"))
    )

    # 2. quality / language signals (all Column exprs) for every doc
    q = quality_cols(F.col("text"))
    scored = (
        fp.withColumn("n_tokens", token_count_col(F.col("text")))
        .withColumn("punct_ratio", q["punct_ratio"])
        .withColumn("lang", lang_id_col(F.col("text")))
    )
    keepers = scored.filter(F.col("doc_id") == F.col("_exact_keeper"))
    exact_dups = scored.filter(F.col("doc_id") != F.col("_exact_keeper"))

    # 3. near-dup clustering over keepers: LSH -> exact Jaccard -> CC
    cands = minhash_candidates(keepers)
    pairs = jaccard_verify(keepers, cands, threshold=0.7)
    nodes = keepers.select(F.col("doc_id").alias("id"))
    clusters = connected_components(nodes, pairs, max_iter=8)

    # 4. final decision: keep = cluster representative (min id); exact
    # dups resolve to their keeper's row (keep=False, lineage intact)
    cols = [
        "doc_id", "source", "fingerprint", "n_tokens", "punct_ratio",
        "lang", "cluster_id", "keep",
    ]
    keeper_rows = (
        keepers.join(clusters, keepers["doc_id"] == clusters["id"], "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
        .select(*cols)
    )
    # exact dups resolve to the FINAL representative: their exact keeper
    # may itself have been absorbed into a near-dup cluster, so follow
    # one hop (cluster ids are fixpoints after CC, so one hop suffices)
    keeper_final = keeper_rows.select(
        F.col("doc_id").alias("_kid"), F.col("cluster_id").alias("_final")
    )
    dup_rows = (
        exact_dups.join(
            keeper_final, exact_dups["_exact_keeper"] == F.col("_kid"), "left"
        )
        .withColumn(
            "cluster_id", F.coalesce(F.col("_final"), F.col("_exact_keeper"))
        )
        .withColumn("keep", F.lit(False))
        .select(*cols)
    )
    return keeper_rows.unionByName(dup_rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oshdb_doc_pipeline"
    num_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    wave_size = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from oshdb_spark.runtime import CheckpointedStage, input_snapshot_fingerprint

    spark = SparkSession.builder.appName("oshdb-doc-pipeline").getOrCreate()
    snap_id = input_snapshot_fingerprint(spark, [f"{sf_dir}/documents.parquet"])

    stage = CheckpointedStage(
        out_dir=out_dir,
        stage="doc_pipeline",
        num_buckets=num_buckets,
        bucket_key="doc_id",
        input_snapshot=snap_id,
        wave_size=wave_size,
        cell=None,
    )
    summary = stage.run(spark, lambda s: build_pipeline(s, sf_dir))
    # disclose what the LSH bucket cap touched: since round 5 oversized
    # buckets are star-recovered (not dropped), but the disclosure stays
    # — a boilerplate-heavy corpus shows up here, and member<->member
    # pairs not through the bucket representative remain unexamined
    from oshdb_spark.operators.dedup import minhash_oversized_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    over = minhash_oversized_buckets(docs).agg(
        F.count(F.lit(1)).alias("buckets"), F.sum("bucket_size").alias("rows")
    ).collect()[0]
    summary["minhash_oversized_buckets"] = int(over["buckets"] or 0)
    summary["minhash_oversized_bucket_rows"] = int(over["rows"] or 0)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
