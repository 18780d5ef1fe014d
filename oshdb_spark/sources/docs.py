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
* ``docs_to_versions`` — the SURVEY §7.0 decode stage as PURE Catalyst
  expressions: explode spans, window-sum the meta markers into version
  indices, conditional-aggregate the parsed fields. No Python anywhere —
  the whole decode stays in whole-stage codegen and scales with the
  shuffle, which beats even an Arrow UDF (measured ~5x on sf0.1).
* ``span_signature`` — md5 over the ordered (kind, text, media_ref)
  sequence; the per-row span-sequence-equality invariant every
  join/tile stage must preserve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

VERSIONS_SCHEMA = (
    "doc_id string, entity_id long, version int, ts long, changeset long, "
    "uid int, visible boolean, tag_building int, tag_v int, "
    "lon_e7 long, lat_e7 long, tags map<int,int>"
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
        F.col("tags"),
    )
    # explicit comparator: the struct now carries the tags map, which has
    # no default ordering — version numbers are unique per entity
    per_entity = versions.groupBy("entity_id").agg(
        F.array_sort(
            F.collect_list(v), lambda a, b: a["version"] - b["version"]
        ).alias("vs"),
        # doc-level pre-filter summaries (the OSH-header analog,
        # CellIterator.java:199-207 / SURVEY §4#3): the union of tag
        # keys and the coordinate bbox across ALL versions. A tag/bbox
        # query filters docs on these columns BEFORE the span explode +
        # version window — at 100 TB they ride parquet column stats, so
        # whole row groups skip without decoding a single span.
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.map_keys(F.col("tags")))))
        ).alias("tag_keys"),
        F.min("lon_e7").alias("min_lon"),
        F.min("lat_e7").alias("min_lat"),
        F.max("lon_e7").alias("max_lon"),
        F.max("lat_e7").alias("max_lat"),
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
        # one tag span per map entry, key-ascending (map_from_entries
        # preserved the sorted construction order) — the reference's
        # key-sorted dictionary-encoded tag array
        tag_spans = F.transform(
            F.map_entries(x["tags"]),
            lambda e: span(
                F.lit("tag"),
                F.format_string("%d=%d", e["key"], e["value"]),
                empty,
            ),
        )
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
            F.concat(F.array(meta), tag_spans, F.array(geom, text, media)),
            lambda s: s["kind"] != "",
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
        "tag_keys",
        "min_lon",
        "min_lat",
        "max_lon",
        "max_lat",
    )


def prefilter_docs(
    docs: DataFrame,
    tag_key: int | None = None,
    bbox: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Conservative doc-level pre-filter on the summary columns: keeps
    every doc that COULD match (any version has the key / bbox
    intersects), so the exact per-version filter after decode sees
    strictly fewer rows and never loses one — the OSH pre-filter chain
    (``CellIterator.java:199-207``). No-op for docs lacking the summary
    columns (raw span tables)."""
    if tag_key is not None and "tag_keys" in docs.columns:
        docs = docs.filter(F.array_contains(F.col("tag_keys"), F.lit(tag_key)))
    if bbox is not None and "min_lon" in docs.columns:
        docs = docs.filter(
            (F.col("max_lon") >= bbox[0])
            & (F.col("min_lon") <= bbox[2])
            & (F.col("max_lat") >= bbox[1])
            & (F.col("min_lat") <= bbox[3])
        )
    return docs


# meta span format: "v=<n>;ts=<n>;cs=<n>;uid=<n>;vis=<0|1>;type=<word>"
# geom span format: "pt:<lon_e7>,<lat_e7>"  (decoded with str_to_map /
# substring_index — one parse per span, no per-field regex)


def docs_to_versions(docs: DataFrame) -> DataFrame:
    """Decode interleaved docs into the normalized version table with
    pure Column expressions: explode spans, running-sum the ``meta``
    markers into a version index (a new version starts at each meta
    span), then conditional-aggregate the parsed fields per
    (doc, version). One window + one aggregation, zero Python."""
    from pyspark.sql import Window

    s = docs.select(
        "doc_id",
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("offset"),
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    s = s.withColumn(
        "vidx", F.sum((F.col("kind") == "meta").cast("int")).over(w)
    )
    # parse the meta span ONCE per row into a map — the previous
    # per-field regexp_extract re-ran the full META_RE match for every
    # extracted field (5x per meta span, measured hot at sf0.1)
    s = s.withColumn(
        "mm",
        F.when(
            F.col("kind") == "meta",
            F.str_to_map(F.col("text"), F.lit(";"), F.lit("=")),
        ),
    )

    def meta_field(name: str, dtype: str):
        return F.max(F.col("mm").getItem(name).cast(dtype))

    def tags_field():
        # collect_list drops the nulls of non-tag spans; array_sort
        # orders entries by key so the map matches the encode order
        return F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("kind") == "tag",
                        F.struct(
                            F.substring_index(F.col("text"), "=", 1)
                            .cast("int")
                            .alias("key"),
                            F.substring_index(F.col("text"), "=", -1)
                            .cast("int")
                            .alias("value"),
                        ),
                    )
                )
            )
        )

    def geom_field(part: int):
        # "pt:<lon>,<lat>" — substring_index beats a regex match here
        body = F.substring_index(F.col("text"), ":", -1)
        val = F.substring_index(body, ",", 1) if part == 1 else F.substring_index(
            body, ",", -1
        )
        return F.max(F.when(F.col("kind") == "geom", val.cast("long")))

    out = s.groupBy("doc_id", "vidx").agg(
        meta_field("v", "int").alias("version"),
        meta_field("ts", "long").alias("ts"),
        meta_field("cs", "long").alias("changeset"),
        (meta_field("vis", "int") == 1).alias("visible"),
        meta_field("uid", "int").alias("uid"),
        tags_field().alias("tags"),
        geom_field(1).alias("lon_e7"),
        geom_field(2).alias("lat_e7"),
    )
    # the scalar back-compat columns are definitionally derived from the
    # map: building = presence of key 1, tag_v = value of key 2
    return out.select(
        "doc_id",
        F.substring(F.col("doc_id"), 2, 100).cast("long").alias("entity_id"),
        "version",
        "ts",
        "changeset",
        "uid",
        "visible",
        F.when(F.map_contains_key(F.col("tags"), F.lit(1)), 1)
        .otherwise(0)
        .cast("int")
        .alias("tag_building"),
        F.col("tags").getItem(2).cast("int").alias("tag_v"),
        "lon_e7",
        "lat_e7",
        "tags",
    )


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
