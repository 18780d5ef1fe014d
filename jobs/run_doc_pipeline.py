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


def build_pipeline(spark: SparkSession, sf_dir: str):
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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. exact dedup: keep the min doc_id per fingerprint
    fp = docs.withColumn("fingerprint", fingerprint_col(F.col("text")))
    keep_w = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    exact_kept = fp.withColumn("_keep", keep_w).filter(
        F.col("doc_id") == F.col("_keep")
    ).drop("_keep")

    # 2. quality / language signals (all Column exprs)
    q = quality_cols(F.col("text"))
    scored = (
        exact_kept.withColumn("n_tokens", token_count_col(F.col("text")))
        .withColumn("punct_ratio", q["punct_ratio"])
        .withColumn("lang", lang_id_col(F.col("text")))
    )

    # 3. near-dup clustering: LSH candidates -> exact Jaccard -> CC
    cands = minhash_candidates(scored)
    pairs = jaccard_verify(scored, cands, threshold=0.7)
    nodes = scored.select(F.col("doc_id").alias("id"))
    clusters = connected_components(nodes, pairs, max_iter=8)

    # 4. final decision: keep = cluster representative (min id)
    out = (
        scored.join(clusters, scored["doc_id"] == clusters["id"], "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
        .select(
            "doc_id", "source", "fingerprint", "n_tokens", "punct_ratio",
            "lang", "cluster_id", "keep",
        )
    )
    return out


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
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
