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
