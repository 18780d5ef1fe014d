"""Structured Streaming contribution view: the incremental stateful
classification must equal the batch lag-window view when per-entity
events arrive in order (here: version-sorted file micro-batches)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oshdb_spark.sources.versions import load_versions

EVENT_SCHEMA = (
    "entity_id long, event_id long, ts long, uid int, visible boolean, "
    "tag_building int, tag_v int, lon_e7 long, lat_e7 long"
)

COLS = [
    "entity_id", "event_id", "ts", "uid", "visible",
    "tag_building", "tag_v", "lon_e7", "lat_e7",
]


@pytest.fixture(scope="module")
def staged_events(spark, sf_dir, tmp_path_factory):
    """Version events split into 3 file batches by version order, so
    cross-batch per-entity arrival order equals version order."""
    root = tmp_path_factory.mktemp("stream_src")
    v = load_versions(spark, sf_dir).select(*COLS, "version")
    for i, hi in enumerate((3, 10, 10**9)):
        lo = (0, 3, 10)[i]
        (
            v.filter((F.col("version") > lo) & (F.col("version") <= hi))
            .select(*COLS)
            .coalesce(1)
            .write.parquet(str(root / f"batch{i}"))
        )
    return root


def test_streaming_contributions_match_batch(spark, sf_dir, staged_events, tmp_path):
    from oshdb_spark.operators.contribution import contributions
    from oshdb_spark.streaming.contrib_stream import stream_contributions

    # batch truth: same classification, no changeset collapsing
    batch = (
        contributions(load_versions(spark, sf_dir), collapse=False)
        .groupBy("contrib_type")
        .count()
        .toPandas()
        .set_index("contrib_type")["count"]
        .to_dict()
    )

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged_events / "batch*"))
    )
    out = stream_contributions(src)
    q = (
        out.writeStream.format("memory")
        .queryName("contrib_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.table("contrib_stream_test")
        .groupBy("contrib_type")
        .count()
        .toPandas()
        .set_index("contrib_type")["count"]
        .to_dict()
    )
    assert got == batch


def test_windowed_counts_with_watermark(spark, sf_dir, staged_events, tmp_path):
    from oshdb_spark.streaming.contrib_stream import (
        stream_contributions,
        windowed_contrib_counts,
    )

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged_events / "batch*"))
    )
    win = windowed_contrib_counts(stream_contributions(src), "1 day", "2 days")
    q = (
        win.writeStream.format("memory")
        .queryName("contrib_windows_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    pdf = spark.table("contrib_windows_test").toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {"window", "contrib_type", "cnt"}
    # windows partition the events: totals must reconcile with the flat stream
    assert pdf["cnt"].sum() > 0


def test_streaming_dedup_keep_first(spark, sf_dir, tmp_path):
    """Stateful streaming dedup: the planted clone batch arriving AFTER
    the originals is fully flagged duplicate with the original as
    keeper; keepers equal the batch min-doc_id-per-fingerprint rule."""
    from oshdb_spark.streaming.dedup_stream import stream_dedup

    root = tmp_path / "dedup_src"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    originals = docs.filter(F.col("doc_id") < 100)
    clones = originals.withColumn("doc_id", F.col("doc_id") + 100000)
    originals.coalesce(1).write.parquet(str(root / "batch0"))
    clones.coalesce(1).write.parquet(str(root / "batch1"))

    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(root / "batch*"))
    )
    out = stream_dedup(src.withColumn("doc_id", F.col("doc_id").cast("string")))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    pdf = spark.table("dedup_stream_test").toPandas()
    n_orig = originals.count()
    assert len(pdf) == 2 * n_orig
    dups = pdf[pdf.is_dup]
    keeps = pdf[~pdf.is_dup]
    assert len(keeps) == n_orig and len(dups) == n_orig
    # every duplicate points at the original doc (id < 100000)
    assert (dups["keeper_doc_id"].astype(int) < 100000).all()
    assert (dups["doc_id"].astype(int) >= 100000).all()
    # keeper per fingerprint == batch keep-min rule on the same input
    batch = (
        originals.unionByName(clones)
        .withColumn("doc_id", F.col("doc_id").cast("string"))
        .groupBy(F.md5(F.regexp_replace(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " ")))
        .agg(F.min(F.col("doc_id").cast("long")).alias("m"))
    )
    assert set(keeps["doc_id"].astype(int)) == {
        r["m"] for r in batch.collect()
    }


def test_streaming_raster_tiles_match_batch(spark, sf_dir, staged_events, tmp_path):
    """Incremental tile maintenance: the streamed windowed per-tile
    counts equal the batch computation of the same expression (tile
    assignment reuses the exact batch cell math, so (zoom,x,y) is
    bit-identical)."""
    from oshdb_spark.sources.versions import load_versions
    from oshdb_spark.streaming.tile_stream import (
        batch_raster_tiles_windowed,
        stream_raster_tiles,
    )

    zoom, win = 4, "6 hours"
    batch_df = batch_raster_tiles_windowed(
        load_versions(spark, sf_dir).select(*COLS), zoom, window=win
    )
    batch = {
        (r["win_start"], r["zoom"], r["x"], r["y"]): (r["n_events"], r["n_visible"])
        for r in batch_df.collect()
    }

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged_events / "batch*"))
    )
    # generous watermark: nothing in the fixture is ever late-dropped,
    # so exact equality with batch holds
    out = stream_raster_tiles(src, zoom, window=win, watermark="3650 days")
    q = (
        out.writeStream.format("memory")
        .queryName("tile_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "tile_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["win_start"], r["zoom"], r["x"], r["y"]): (r["n_events"], r["n_visible"])
        for r in spark.table("tile_stream_test").collect()
    }
    assert got == batch and len(got) > 5


def test_watermark_drops_late_event(spark, tmp_path):
    """A straggler arriving AFTER its window was finalized+evicted is
    dropped — the late-data contract of windowed_contrib_counts. One
    file per trigger: b1 advances the watermark past the day-1 window,
    b2 finalizes and evicts it (append-mode emission), so the day-1
    straggler in b3 hits evicted state and is excluded (cnt stays 1,
    not 2, and the window is not re-emitted). A straggler landing in
    the SAME batch as the finalization would still merge — eviction,
    not the watermark timestamp alone, is the drop boundary."""
    import pandas as pd

    from oshdb_spark.streaming.contrib_stream import (
        stream_contributions,
        windowed_contrib_counts,
    )

    D = 86400
    root = tmp_path / "late_src"
    batches = [
        [(10, 1, 1 * D)],   # b0: day-1 window seed
        [(11, 2, 20 * D)],  # b1: advances watermark to day 18
        [(12, 3, 21 * D)],  # b2: runs AT day-18 watermark -> emits+evicts day-1
        [(13, 4, 1 * D)],   # b3: LATE day-1 straggler -> dropped
        [(14, 5, 25 * D)],  # b4: watermark day 23 closes day-20/21 windows
        [(15, 6, 26 * D)],  # b5: runs with day-23 watermark, flushes them
    ]
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(
            [
                (e, ev, ts, 1, True, 0, 1, 100, 100)
                for (e, ev, ts) in rows
            ],
            columns=COLS,
        )
        spark.createDataFrame(pdf, EVENT_SCHEMA).coalesce(1).write.parquet(
            str(root / f"b{i}")
        )
        # the file source orders triggers by modification time; batches
        # written back-to-back can tie on mtime and process out of
        # order (b3 before b2 would merge the straggler instead of
        # dropping it) — pin strictly increasing mtimes per batch dir
        t = 1_700_000_000 + i * 10
        for p in (root / f"b{i}").rglob("*"):
            os.utime(p, (t, t))
        os.utime(root / f"b{i}", (t, t))

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(root / "b*"))
    )
    win = windowed_contrib_counts(
        stream_contributions(src), window="1 day", watermark="2 days"
    )
    q = (
        win.writeStream.format("memory")
        .queryName("late_drop_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        int(r["window"].start.timestamp()) // D: r["cnt"]
        for r in spark.table("late_drop_test").collect()
    }
    # day-1 window finalized with ONLY the on-time event (the b3
    # straggler dropped, no duplicate emission); day-20/21 windows
    # closed by the day-23 watermark
    assert got == {1: 1, 20: 1, 21: 1}
