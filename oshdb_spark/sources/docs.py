"""Interleaved document table <-> version table (the graft's physical
input shape, per BASELINE.json input_hint):

    docs(doc_id: string,
         spans: array<struct<kind string, text string,
                             media_ref string, offset int>>)

One document is one OSH-like entity; its versions are contiguous runs
of spans in version order (FIXTURES.md §1):

    meta  "v=<int>;ts=<unix>;cs=<changeset>;uid=<int>;vis=<0/1>;type=node"
    tag   "<kid>=<vid>"           (key-sorted within a version)
    geom  "pt:<lon_e7>,<lat_e7>"
    text  free text               (interleaving realism; kind='text')
    media ''  with media_ref='m://<id>'

* ``versions_to_docs`` — pure Column/higher-order-function encode: one
  hash aggregation, everything else stays in whole-stage codegen. This
  is the write path of the reference's ETL Transformer
  (``oshdb-tool/etl/.../transform/Transformer.java:36-80`` builds OSH
  blobs per entity; here the "blob" is a typed span array, not opaque
  bytes).
* ``docs_to_versions`` — Arrow-batched decode via ``mapInPandas``
  (the SURVEY §7.0 decode stage): vectorized string parsing, no
  per-row Python loops over spans.
* ``span_signature`` — md5 over the ordered (kind, text, media_ref)
  sequence; the per-row span-sequence-equality invariant every
  join/tile stage must preserve.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

VERSIONS_SCHEMA = (
    "doc_id string, entity_id long, version int, ts long, changeset long, "
    "uid int, visible boolean, tag_building int, tag_v int, "
    "lon_e7 long, lat_e7 long"
)


def versions_to_docs(versions: DataFrame) -> DataFrame:
    """Encode the versions table into interleaved docs (one row per
    entity), entirely with JVM-side expressions."""
    v = F.struct(
        F.col("version"),
        F.col("ts"),
        F.col("changeset"),
        F.col("uid"),
        F.col("visible"),
        F.col("tag_building"),
        F.col("tag_v"),
        F.col("lon_e7"),
        F.col("lat_e7"),
    )
    per_entity = versions.groupBy("entity_id").agg(
        F.array_sort(F.collect_list(v)).alias("vs")
    )

    def span(kind, text, media_ref):
        return F.struct(
            kind.alias("kind"), text.alias("text"), media_ref.alias("media_ref")
        )

    empty = F.lit("")

    def spans_of(x):
        meta = span(
            F.lit("meta"),
            F.format_string(
                "v=%d;ts=%d;cs=%d;uid=%d;vis=%d;type=node",
                x["version"],
                x["ts"],
                x["changeset"],
                x["uid"],
                x["visible"].cast("int"),
            ),
            empty,
        )
        tag1 = span(F.lit("tag"), F.format_string("1=%d", x["tag_building"]), empty)
        tag2 = span(F.lit("tag"), F.format_string("2=%d", x["tag_v"]), empty)
        geom = span(
            F.lit("geom"), F.format_string("pt:%d,%d", x["lon_e7"], x["lat_e7"]), empty
        )
        text = span(
            F.when(x["version"] % 3 == 0, F.lit("text")).otherwise(F.lit("")),
            F.format_string("free text of rev %d", x["version"]),
            empty,
        )
        media = span(
            F.when(x["version"] % 5 == 0, F.lit("media")).otherwise(F.lit("")),
            empty,
            F.format_string("m://%d", x["version"]),
        )
        return F.filter(
            F.array(meta, tag1, tag2, geom, text, media), lambda s: s["kind"] != ""
        )

    flat = F.flatten(F.transform(F.col("vs"), spans_of))
    with_offsets = F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return per_entity.select(
        F.concat(F.lit("d"), F.col("entity_id").cast("string")).alias("doc_id"),
        with_offsets.alias("spans"),
    )


def docs_to_versions(docs: DataFrame) -> DataFrame:
    """Decode interleaved docs back into the normalized version table —
    Arrow-batched, vectorized string parsing (SURVEY §7.0 decode stage)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                for s in spans:
                    rows.append((doc_id, s["kind"], s["text"], s["media_ref"]))
            flat = pd.DataFrame(rows, columns=["doc_id", "kind", "text", "media_ref"])
            # a new version starts at each meta span
            flat["vidx"] = (flat["kind"] == "meta").groupby(flat["doc_id"]).cumsum()

            meta = flat[flat["kind"] == "meta"].copy()
            m = meta["text"].str.extract(
                r"v=(-?\d+);ts=(-?\d+);cs=(-?\d+);uid=(-?\d+);vis=([01]);type=(\w+)"
            )
            meta[["version", "ts", "changeset", "uid"]] = (
                m[[0, 1, 2, 3]].astype("int64")
            )
            meta["visible"] = m[4] == "1"

            tags = flat[flat["kind"] == "tag"].copy()
            t = tags["text"].str.extract(r"(\d+)=(-?\d+)")
            tags["kid"] = t[0].astype("int64")
            tags["vid"] = t[1].astype("int64")
            tag_map = tags.pivot_table(
                index=["doc_id", "vidx"], columns="kid", values="vid", aggfunc="first"
            )

            geoms = flat[flat["kind"] == "geom"].copy()
            g = geoms["text"].str.extract(r"pt:(-?\d+),(-?\d+)")
            geoms["lon_e7"] = g[0].astype("int64")
            geoms["lat_e7"] = g[1].astype("int64")

            out = meta.set_index(["doc_id", "vidx"])[
                ["version", "ts", "changeset", "uid", "visible"]
            ]
            out = out.join(tag_map.rename(columns={1: "tag_building", 2: "tag_v"}))
            out = out.join(
                geoms.set_index(["doc_id", "vidx"])[["lon_e7", "lat_e7"]]
            ).reset_index()
            out["entity_id"] = out["doc_id"].str.slice(1).astype("int64")
            out["version"] = out["version"].astype("int32")
            out["uid"] = out["uid"].astype("int32")
            out["tag_building"] = out["tag_building"].astype("int32")
            out["tag_v"] = out["tag_v"].astype("int32")
            yield out[
                [
                    "doc_id",
                    "entity_id",
                    "version",
                    "ts",
                    "changeset",
                    "uid",
                    "visible",
                    "tag_building",
                    "tag_v",
                    "lon_e7",
                    "lat_e7",
                ]
            ]

    return docs.mapInPandas(decode, VERSIONS_SCHEMA)


def span_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, span_sig): md5 of the ordered (kind|text|media_ref)
    sequence. Offsets define the order; the signature is order-sensitive
    by construction."""
    ordered = F.array_sort(
        F.col("spans"), lambda a, b: a["offset"] - b["offset"]
    )
    joined = F.array_join(
        F.transform(
            ordered,
            lambda s: F.concat_ws("|", s["kind"], s["text"], s["media_ref"]),
        ),
        "\x1f",
    )
    return docs.select("doc_id", F.md5(joined).alias("span_sig"))
