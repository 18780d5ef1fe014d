"""Interleaved-document layer: lossless encode/decode round-trip and
the span-sequence-equality invariant across a join/tile stage
(BASELINE.json input_hint: per-row (kind, text, media_ref, order)
equality after every join/tile stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.tiles import assign_tiles
from oshdb_spark.sources.docs import docs_to_versions, span_signature, versions_to_docs
from oshdb_spark.sources.versions import load_versions

VCOLS = [
    "entity_id", "version", "ts", "changeset", "uid", "visible",
    "tag_building", "tag_v", "lon_e7", "lat_e7", "tags",
]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return versions_to_docs(load_versions(spark, sf_dir)).cache()


def test_docs_shape_matches_input_hint(docs):
    schema = dict((f.name, f.dataType.simpleString()) for f in docs.schema.fields)
    assert schema["doc_id"] == "string"
    assert (
        schema["spans"]
        == "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )


def test_offsets_monotonic_and_dense(docs):
    bad = docs.filter(
        ~F.forall(
            F.zip_with(
                F.col("spans"),
                F.sequence(F.lit(0), F.size("spans") - 1),
                lambda s, i: s["offset"] == i,
            ),
            lambda x: x,
        )
    ).count()
    assert bad == 0


def test_roundtrip_lossless(spark, sf_dir, docs):
    original = load_versions(spark, sf_dir).select(*VCOLS).orderBy(
        "entity_id", "version"
    )
    decoded = docs_to_versions(docs).select(*VCOLS).orderBy("entity_id", "version")
    a = original.toPandas()
    b = decoded.toPandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_span_signature_preserved_through_join_and_tile_stage(spark, sf_dir, docs):
    """Drive docs through a tile-assignment join stage and re-emit the
    spans; the per-doc signature must be byte-identical."""
    sig_before = span_signature(docs)

    versions = docs_to_versions(docs)
    tiled = assign_tiles(versions, zoom=6)
    # a real join stage: tiled rows join back to their docs (as a tile
    # writer would when materializing vector tiles with full payloads)
    staged = (
        tiled.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(docs, "doc_id")
        .select("doc_id", "spans")
    )
    sig_after = span_signature(staged)

    diff = (
        sig_before.alias("a")
        .join(sig_after.alias("b"), "doc_id", "full")
        .filter(
            F.col("a.span_sig").isNull()
            | F.col("b.span_sig").isNull()
            | (F.col("a.span_sig") != F.col("b.span_sig"))
        )
        .count()
    )
    assert diff == 0


def test_interleaving_contains_text_and_media_spans(docs):
    kinds = (
        docs.select(F.explode("spans").alias("s"))
        .select(F.col("s.kind").alias("kind"))
        .distinct()
        .toPandas()["kind"]
        .tolist()
    )
    assert set(kinds) == {"meta", "tag", "geom", "text", "media"}


def test_doc_summaries_match_versions(spark, sf_dir, docs):
    """tag_keys / bbox summary columns equal recomputation from the
    version table (the OSH-header invariant)."""
    v = load_versions(spark, sf_dir)
    expected = (
        v.groupBy("entity_id")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(F.map_keys("tags"))))
            ).alias("tag_keys"),
            F.min("lon_e7").alias("min_lon"),
            F.max("lon_e7").alias("max_lon"),
        )
        .withColumn("doc_id", F.concat(F.lit("d"), F.col("entity_id").cast("string")))
    )
    diff = (
        docs.select("doc_id", "tag_keys", "min_lon", "max_lon")
        .join(expected, "doc_id")
        .filter(
            (docs["tag_keys"] != expected["tag_keys"])
            | (docs["min_lon"] != expected["min_lon"])
            | (docs["max_lon"] != expected["max_lon"])
        )
        .count()
    )
    assert diff == 0


def test_prefilter_is_conservative_and_runs_before_decode(spark, sf_dir, docs):
    """Pre-filtering docs on a tag key keeps results identical to
    decode-then-filter (never loses a row), strictly reduces the doc
    set, and sits BELOW the version window in the optimized plan (rows
    skip before the expensive explode + window)."""
    from oshdb_spark.sources.docs import prefilter_docs

    full = docs_to_versions(docs).filter(F.map_contains_key("tags", F.lit(3)))
    pre = docs_to_versions(prefilter_docs(docs, tag_key=3)).filter(
        F.map_contains_key("tags", F.lit(3))
    )
    assert sorted(r["doc_id"] for r in full.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in pre.select("doc_id").collect()
    )
    assert prefilter_docs(docs, tag_key=3).count() < docs.count()

    plan = pre._jdf.queryExecution().optimizedPlan().toString()
    # the doc-level summary filter (on tag_keys) must be present and sit
    # BELOW the decode window (deeper nodes print later in the tree) —
    # i.e. docs are skipped before the explode + version window runs.
    # (the exact per-version filter also compiles to array_contains, on
    # map_keys(tags), so anchor the search on the summary column name)
    assert "array_contains(tag_keys" in plan
    assert plan.index("array_contains(tag_keys") > plan.index("Window")


def test_prefilter_bbox_conservative(spark, sf_dir, docs):
    from oshdb_spark.sources.docs import prefilter_docs

    bbox = (-900_000_000, -450_000_000, 900_000_000, 450_000_000)
    in_box = (
        (F.col("lon_e7") >= bbox[0]) & (F.col("lon_e7") <= bbox[2])
        & (F.col("lat_e7") >= bbox[1]) & (F.col("lat_e7") <= bbox[3])
    )
    full = docs_to_versions(docs).filter(in_box).count()
    pre = docs_to_versions(prefilter_docs(docs, bbox=bbox)).filter(in_box).count()
    assert full == pre


def test_way_docs_span_signature_preserved_through_tile_stage(spark, sf_dir):
    """The span-sequence invariant holds for the ways doc table too:
    decode -> per-segment tile fan-out -> join back re-emits
    byte-identical span sequences."""
    from oshdb_spark.sources.docs import span_signature
    from oshdb_spark.sources.ways import derive_ways, docs_to_ways, ways_to_docs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wdocs = ways_to_docs(derive_ways(ev))
    sig_before = span_signature(wdocs)

    ways = docs_to_ways(wdocs)
    staged = (
        ways.select(
            F.concat(F.lit("w"), F.col("way_id").cast("string")).alias("doc_id"),
            F.explode("lon_arr").alias("x"),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(wdocs, "doc_id")
        .select("doc_id", "spans")
    )
    sig_after = span_signature(staged)
    diff = (
        sig_before.alias("a")
        .join(sig_after.alias("b"), "doc_id", "full")
        .filter(
            F.col("a.span_sig").isNull()
            | F.col("b.span_sig").isNull()
            | (F.col("a.span_sig") != F.col("b.span_sig"))
        )
        .count()
    )
    assert diff == 0
