"""M9 scale-runtime tests: cell-prefix partitioning, salting,
skew metrics, and checkpoint/resume with per-partition lineage
manifests (north-rule requirements with no reference equivalent)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from oshdb_spark.grid import cell_id, cell_id_col
from oshdb_spark.runtime import (
    CheckpointedStage,
    cell_prefix,
    input_snapshot_fingerprint,
    partition_metrics,
    repartition_by_cell,
    salted_count,
    skew_ratio,
)
from oshdb_spark.sources.versions import load_versions


def test_cell_prefix_matches_parent_cell(spark):
    """Prefixing a zoom-10 cell to zoom-4 equals computing the zoom-4
    cell directly — the hierarchical-key property partition pruning
    relies on."""
    pts = [(i * 97_000_019 % 3_600_000_000 - 1_800_000_000,
            i * 53_000_011 % 1_700_000_000 - 850_000_000) for i in range(500)]
    df = spark.createDataFrame(pts, "lon_e7 long, lat_e7 long")
    got = df.select(
        cell_prefix(cell_id_col(10, F.col("lon_e7"), F.col("lat_e7")), 10, 4).alias("p"),
        cell_id_col(4, F.col("lon_e7"), F.col("lat_e7")).alias("direct"),
    )
    assert got.filter(F.col("p") != F.col("direct")).count() == 0
    for lon, lat in pts[:50]:
        assert cell_id(4, lon, lat) == cell_id(4, lon, lat)


def test_repartition_by_cell_colocates(spark, sf_dir):
    v = load_versions(spark, sf_dir).withColumn(
        "cell_id", cell_id_col(6, F.col("lon_e7"), F.col("lat_e7"))
    )
    rp = repartition_by_cell(v, 8)
    # every cell lands in exactly one partition
    per_cell = (
        rp.withColumn("_pid", F.spark_partition_id())
        .groupBy("cell_id")
        .agg(F.count_distinct("_pid").alias("n"))
    )
    assert per_cell.filter(F.col("n") > 1).count() == 0


def test_salted_count_equals_plain_count(spark, sf_dir):
    v = load_versions(spark, sf_dir)
    plain = {
        r["tag_v"]: r["c"]
        for r in v.groupBy("tag_v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    salted = {
        r["tag_v"]: r["cnt"]
        for r in salted_count(v, ["tag_v"], factor=16, row_entropy="event_id").collect()
    }
    assert salted == plain


def test_partition_metrics_and_skew(spark, sf_dir):
    v = load_versions(spark, sf_dir).withColumn(
        "cell_id", cell_id_col(6, F.col("lon_e7"), F.col("lat_e7"))
    )
    m = [r.asDict() for r in partition_metrics(repartition_by_cell(v, 8)).collect()]
    assert sum(r["rows"] for r in m) == v.count()
    assert all(r["cells_touched"] >= 1 for r in m)
    assert skew_ratio(m) >= 1.0
    # a deliberately skewed layout reports higher skew than a hashed one
    skewed = v.repartition(8, (F.col("entity_id") < 5).cast("int"))
    ms = [r.asDict() for r in partition_metrics(skewed).collect()]
    assert skew_ratio(ms) > skew_ratio(m)


@pytest.fixture()
def stage_builder(sf_dir):
    def build(spark):
        return (
            load_versions(spark, sf_dir)
            .withColumn("cell_id", cell_id_col(6, F.col("lon_e7"), F.col("lat_e7")))
            .select("entity_id", "version", "ts", "cell_id")
        )

    return build


def _mk_stage(tmp_path, snapshot, wave_size=2, num_buckets=6):
    return CheckpointedStage(
        out_dir=str(tmp_path / "out"),
        stage="versions_by_cell",
        num_buckets=num_buckets,
        bucket_key="cell_id",
        input_snapshot=snapshot,
        wave_size=wave_size,
    )


def test_checkpoint_resume_after_kill(spark, sf_dir, tmp_path, stage_builder):
    snap = input_snapshot_fingerprint(spark, [f"{sf_dir}/events.parquet"])
    expected = stage_builder(spark).count()

    # killed run: only the first wave commits
    stage = _mk_stage(tmp_path, snap)
    partial = stage.run(spark, stage_builder, fail_after_waves=1)
    assert not partial["complete"]
    assert len(partial["written_buckets"]) == 2

    # manifests: one JSON per committed bucket, with lineage fields
    mdir = tmp_path / "out" / "_lineage"
    manifests = sorted(os.listdir(mdir))
    assert len(manifests) == 2
    m = json.loads((mdir / manifests[0]).read_text())
    assert m["input_snapshot"] == snap
    assert m["stage"] == "versions_by_cell"
    assert m["rows"] >= 0 and m["cells_touched"] >= 0

    # resumed run: skips committed buckets, completes the rest
    resumed = _mk_stage(tmp_path, snap).run(spark, stage_builder)
    assert resumed["complete"]
    assert sorted(resumed["skipped_buckets"]) == sorted(partial["written_buckets"])
    assert set(resumed["written_buckets"]).isdisjoint(partial["written_buckets"])

    # output equals a single-shot computation, no dupes, no gaps
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == expected
    assert out.select("entity_id", "version").distinct().count() == expected

    # a fully-complete rerun is a no-op
    noop = _mk_stage(tmp_path, snap).run(spark, stage_builder)
    assert noop["complete"] and not noop["written_buckets"]


def test_checkpoint_invalidated_by_snapshot_change(spark, tmp_path, stage_builder):
    s1 = _mk_stage(tmp_path, "snapshot-A", wave_size=6)
    s1.run(spark, stage_builder)
    assert len(s1.committed_buckets()) == 6
    # same dir, new input snapshot: stale manifests are discarded
    s2 = _mk_stage(tmp_path, "snapshot-B", wave_size=6)
    res = s2.run(spark, stage_builder)
    assert res["skipped_buckets"] == []
    assert len(res["written_buckets"]) == 6


def test_orphan_bucket_cleanup(spark, tmp_path, stage_builder):
    """A bucket dir without a manifest (crash between data and manifest
    commit) is dropped and recomputed without duplication."""
    snap = "snap"
    stage = _mk_stage(tmp_path, snap, wave_size=6)
    stage.run(spark, stage_builder)
    total = spark.read.parquet(str(tmp_path / "out")).count()
    # simulate the torn state: manifest of bucket 3 lost
    os.remove(tmp_path / "out" / "_lineage" / "bucket-3.json")
    res = _mk_stage(tmp_path, snap, wave_size=6).run(spark, stage_builder)
    assert res["written_buckets"] == [3]
    assert spark.read.parquet(str(tmp_path / "out")).count() == total


def test_doc_pipeline_job_kill_and_resume(spark, sf_dir, tmp_path):
    """The end-to-end doc pipeline (exact dedup -> signals -> LSH ->
    Jaccard -> CC -> keep/drop) through CheckpointedStage: a killed run
    (fail_after_waves) resumes with only the missing buckets, the final
    table covers every doc exactly once, and cluster representatives
    are marked keep."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from run_doc_pipeline import build_pipeline

    from oshdb_spark.runtime import CheckpointedStage, input_snapshot_fingerprint

    snap = input_snapshot_fingerprint(spark, [f"{sf_dir}/documents.parquet"])

    def mk():
        return CheckpointedStage(
            out_dir=str(tmp_path / "out"),
            stage="doc_pipeline",
            num_buckets=6,
            bucket_key="doc_id",
            input_snapshot=snap,
            wave_size=2,
            cell=None,
        )

    killed = mk().run(spark, lambda s: build_pipeline(s, sf_dir), fail_after_waves=1)
    assert not killed["complete"]
    assert len(killed["written_buckets"]) == 2

    resumed = mk().run(spark, lambda s: build_pipeline(s, sf_dir))
    assert resumed["complete"]
    assert sorted(resumed["skipped_buckets"]) == sorted(killed["written_buckets"])

    out = spark.read.parquet(str(tmp_path / "out"))
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert out.count() == n_docs  # every doc decided exactly once
    pdf = out.toPandas()
    # representatives keep, members of their cluster share cluster_id
    assert pdf["keep"].sum() == pdf["cluster_id"].nunique()
    reps = set(pdf.loc[pdf.keep, "doc_id"])
    assert set(pdf["cluster_id"]) <= reps


def test_doc_pipeline_decides_every_exact_duplicate(spark, sf_dir):
    """Planted byte-identical clones must still get a decision row
    (keep=False, cluster = the exact keeper) — exact dups are dropped
    from the expensive near-dup stage, never from the output."""
    import sys

    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo/jobs")
    from run_doc_pipeline import build_pipeline

    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 50)
    )
    clones = base.withColumn("doc_id", F.col("doc_id") + 100000)
    out = build_pipeline(spark, sf_dir, docs=base.unionByName(clones)).toPandas()
    assert len(out) == 2 * base.count()  # every doc decided
    clones_out = out[out.doc_id >= 100000]
    assert (~clones_out["keep"]).all()
    assert (clones_out["cluster_id"] < 100000).all()  # exact keeper lineage
    # originals all keep (no near-dups among the distinct 50)
    orig_out = out[out.doc_id < 100000]
    assert orig_out["keep"].sum() == orig_out["cluster_id"].nunique()
