"""Relation-analog entities: versioned multipolygons assembled from
member ring *arcs*.

The reference models relations as member lists resolved as-of a
timestamp (``OSMRelation.java:30-40``) whose way members are stitched
into outer/inner rings by endpoint matching and orientation rules
(``OSHDBGeometryBuilder.java:188-370``). This module derives a
deterministic member-arc table from ``events`` (SQL-expressible in both
engines, like ``sources/versions.py``) that exercises the real
assembly work:

* every relation version has an OUTER rectangle ring split into two
  open arcs — and the second arc is stored **reversed**, so assembly
  must flip it to chain endpoints;
* an INNER rectangle (the hole), inset by a quarter on each side, also
  split into two arcs with the second reversed;
* relations with ``rel_id % 3 == 0`` carry a **second disjoint outer
  rectangle** (offset east), so the result is a true multipolygon with
  two shells — assembly must partition arcs into separate rings, not
  just order them.

Derivation (seeded solely by event_id/ts):

* ``rel_id  = event_id % REL_MOD``
* ``version = row_number over (rel_id ORDER BY ts, event_id)``
* outer rect: ``(x0, y0) .. (x0+w, y0+h)`` with ``w``/``h`` varying by
  version (GEOMETRY_CHANGE transitions are real); inner rect inset by
  ``(w/4, h/4)`` with half the extent. All extents are multiples of 4
  so the integer insets are exact in both engines.

The corner formulas are mirrored into DuckDB SQL below — the oracle
never assembles rings; it expands the expected area symbolically from
the same corner arithmetic (the assembly itself is gated by equality of
the end result plus the dedicated pytest cases in
``tests/test_relations.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REL_MOD = 40
LON_A = 97_000_019
LAT_A = 47_000_019
LON_SPAN = 3_200_000_000
LAT_SPAN = 1_500_000_000
LON_OFF = 1_600_000_000
LAT_OFF = 750_000_000
W_BASE = 2_000_000
W_STEP = 100_000
H_BASE = 1_500_000
H_STEP = 80_000
SECOND_SHELL_MOD = 3   # rel_id % 3 == 0 -> two outer shells
SINGLE_OUTER_MOD = 4   # rel_id % 4 == 1 -> first outer ring stored as ONE
#                        pre-closed arc (a single outer way member — the
#                        old-style-multipolygon member shape); assembly
#                        and areas are identical to the two-arc form

# --- relation tag model (geometry-dispatch fixture) ------------------------
# key ids from functions/taginterpreter.py; presence/value rules are pure
# rel_id arithmetic, mirrored in the oracle SQL of relation_geom_kinds.
REL_TYPE_MOD = 5    # rel_id % 5: 0,1 -> type=multipolygon; 3 -> boundary;
#                     4 -> route; 2 -> NO type tag (collection fallback)
REL_NAME_MOD = 2    # name (interesting) present iff rel_id % 2 == 0
REL_SOURCE_MOD = 3  # source (uninteresting) present iff rel_id % 3 == 1


def _rect_arcs(x0, y0, x1, y1, role: str, ring_hint: int):
    """Two open arcs of the closed rect ring (SW,SE,NE,NW,SW): arc A is
    SW->SE->NE in order; arc B is NW->SW *stored reversed* (SW->NW->...)
    so assembly must flip it. Returns a list of struct Columns.

    Coordinates are carried as parallel lon/lat ARRAYS (not an array of
    point structs): the struct-of-points form cost an extra interpreted
    ``transform`` per arc to unzip x/y downstream — measured on the
    445k-arc sf0.1 fan-out."""

    def arc(idx: int, xs, ys):
        return F.struct(
            F.lit(role).alias("role"),
            F.lit(ring_hint).alias("ring_hint"),
            F.lit(idx).alias("arc_idx"),
            F.array(*[x.cast("long") for x in xs]).alias("lon_arr"),
            F.array(*[y.cast("long") for y in ys]).alias("lat_arr"),
        )

    # arc A: SW->SE->NE; arc B true continuation is NE->NW->SW, stored
    # reversed as SW->NW->NE
    return [
        arc(0, (x0, x1, x1), (y0, y0, y1)),
        arc(1, (x0, x0, x1), (y0, y1, y1)),
    ]


def _rect_closed_arc(x0, y0, x1, y1, role: str, ring_hint: int):
    """The same rect ring as ONE pre-closed arc (SW,SE,NE,NW,SW) — the
    single-outer-way member shape of old-style multipolygons; assembly
    sees a first==last arc and emits the ring directly, with the exact
    same vertex cycle (and therefore bit-identical area terms) as the
    two-arc split."""
    return F.struct(
        F.lit(role).alias("role"),
        F.lit(ring_hint).alias("ring_hint"),
        F.lit(0).alias("arc_idx"),
        F.array(*[x.cast("long") for x in (x0, x1, x1, x0, x0)]).alias("lon_arr"),
        F.array(*[y.cast("long") for y in (y0, y0, y1, y1, y0)]).alias("lat_arr"),
    )


# member way references: each relation points at MEMBERS_PER_REL ways of
# the ways table (sources/ways.py) by deterministic id formulas — the
# normalized member model behind the as-of member join
# (OSMRelation.java:30-40 / OSHEntities.java:315-478)
MEMBERS_PER_REL = 3


def member_way_ids_sql(way_mod: int) -> list[str]:
    """The member-id formulas as SQL expressions over ``rel_id``."""
    return [
        f"(rel_id % {way_mod})",
        f"((rel_id * 7 + 1) % {way_mod})",
        f"((rel_id * 13 + 2) % {way_mod})",
    ]


def member_way_ids_col(way_mod: int) -> F.Column:
    """Same formulas as an array Column."""
    rid = F.col("rel_id")
    return F.array(
        (rid % way_mod).cast("long"),
        ((rid * 7 + 1) % way_mod).cast("long"),
        ((rid * 13 + 2) % way_mod).cast("long"),
    )


def derive_relations(ev: DataFrame, rel_mod: int = REL_MOD) -> DataFrame:
    """Bare relation version rows (rel_id, event_id, ts, visible,
    version, valid_to) — the shared preamble of the member-arc fixture
    and the normalized member join."""
    eid = F.col("event_id")
    base = ev.select(
        (eid % rel_mod).alias("rel_id"),
        eid.alias("event_id"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("ts"),
        ((eid % 7) != 0).alias("visible"),
        # editor of this version (contributor attribution,
        # OSMContribution.java:211-221) — same uid model as versions.py
        (F.col("user_id") % 50).cast("int").alias("uid"),
    )
    w = Window.partitionBy("rel_id").orderBy("ts", "event_id")
    return base.withColumn("version", F.row_number().over(w)).withColumn(
        "valid_to", F.lead("ts").over(w)
    )


def derive_relation_members(
    ev: DataFrame, rel_mod: int = REL_MOD, rels: DataFrame | None = None
) -> DataFrame:
    """relation member arcs, one row per (rel version, arc):
    (rel_id, version, ts, valid_to, visible, role, ring_hint, arc_idx,
    lon_arr, lat_arr). ``ring_hint`` is NOT used by assembly (rings are
    discovered by endpoint chaining) — it only labels the fixture for
    tests.

    Pass a pre-filtered ``rels`` frame (e.g. the as-of snapshot of
    ``derive_relations``) to build arcs only for surviving versions —
    callers that don't need full history skip the fan-out entirely."""
    v = rels if rels is not None else derive_relations(ev, rel_mod)
    x0 = (F.col("rel_id") * LON_A % LON_SPAN - LON_OFF).cast("long")
    y0 = (F.col("rel_id") * LAT_A % LAT_SPAN - LAT_OFF).cast("long")
    rw = (F.lit(W_BASE) + (F.col("version") % 5) * W_STEP).cast("long")
    rh = (F.lit(H_BASE) + (F.col("version") % 3) * H_STEP).cast("long")
    # quarter extents stay pure integers (W_BASE/W_STEP/H_BASE/H_STEP are
    # multiples of 4) — no float division anywhere in the fixture
    rw4 = (F.lit(W_BASE // 4) + (F.col("version") % 5) * (W_STEP // 4)).cast("long")
    rh4 = (F.lit(H_BASE // 4) + (F.col("version") % 3) * (H_STEP // 4)).cast("long")
    x1, y1 = x0 + rw, y0 + rh
    ix0, iy0 = x0 + rw4, y0 + rh4
    ix1, iy1 = x0 + rw4 * 3, y0 + rh4 * 3
    # second disjoint shell, offset east by 2w
    sx0, sx1 = x0 + 2 * rw, x0 + 3 * rw

    # rel_id % SINGLE_OUTER_MOD == 1 relations store the first outer ring
    # as ONE pre-closed arc (single outer way member, the old-style-MP
    # shape); everyone else splits it into two arcs with the second
    # reversed. Both forms assemble to the identical vertex cycle.
    single = F.col("rel_id") % SINGLE_OUTER_MOD == 1
    outer_a, outer_b = _rect_arcs(x0, y0, x1, y1, "outer", 0)
    outer_closed = _rect_closed_arc(x0, y0, x1, y1, "outer", 0)
    arcs = (
        [
            F.when(single, outer_closed).otherwise(outer_a),
            F.when(~single, outer_b),
        ]
        + _rect_arcs(ix0, iy0, ix1, iy1, "inner", 1)
        + [
            F.when(F.col("rel_id") % SECOND_SHELL_MOD == 0, a)
            for a in _rect_arcs(sx0, y0, sx1, y1, "outer", 2)
        ]
    )
    exploded = v.select(
        "rel_id",
        "version",
        "ts",
        "valid_to",
        "visible",
        F.explode(F.filter(F.array(*arcs), lambda a: a.isNotNull())).alias("m"),
    )
    return exploded.select(
        "rel_id",
        "version",
        "ts",
        "valid_to",
        "visible",
        F.col("m.role").alias("role"),
        F.col("m.ring_hint").alias("ring_hint"),
        F.col("m.arc_idx").alias("arc_idx"),
        F.col("m.lon_arr").alias("lon_arr"),
        F.col("m.lat_arr").alias("lat_arr"),
    )


def with_relation_tags(rels: DataFrame) -> DataFrame:
    """Append the relation tags map — the geometry-dispatch fixture
    (``type`` with multipolygon/boundary/route values or absent, an
    interesting ``name`` tag, an uninteresting ``source`` tag). Pure
    rel_id arithmetic, mirrored in the relation_geom_kinds oracle."""
    from oshdb_spark.functions.taginterpreter import (
        NAME_KEY,
        SOURCE_KEY,
        TYPE_BOUNDARY,
        TYPE_KEY,
        TYPE_MULTIPOLYGON,
        TYPE_ROUTE,
    )
    from oshdb_spark.sources.versions import conditional_tags_map

    rid = F.col("rel_id")
    m = rid % REL_TYPE_MOD
    type_v = (
        F.when(m.isin(0, 1), F.lit(TYPE_MULTIPOLYGON))
        .when(m == 3, F.lit(TYPE_BOUNDARY))
        .otherwise(F.lit(TYPE_ROUTE))
    )
    tags = conditional_tags_map(
        [
            (TYPE_KEY, m != 2, type_v),
            (NAME_KEY, rid % REL_NAME_MOD == 0, F.lit(1)),
            (SOURCE_KEY, rid % REL_SOURCE_MOD == 1, F.lit(1)),
        ]
    )
    return rels.withColumn("tags", tags)


# ---------------------------------------------------------------------------
# interleaved-doc round trip: ring: span encoding (FIXTURES.md §1/§6)
# ---------------------------------------------------------------------------
#   geom span text = "ring:<role>:<lon1>,<lat1>;<lon2>,<lat2>;..."  (one
#   span per member arc, arc order = arc_idx order within the version)

def relations_to_docs(members: DataFrame, rels: DataFrame | None = None) -> DataFrame:
    """One doc per relation; each version contributes a meta span plus a
    ``ring:`` geom span per member arc — the third entity kind of the
    interleaved-document graft (nodes: ``pt:``, ways: ``line:``).

    Span ROWS are built with whole-stage-codegen projections (meta rows
    from one per-version aggregation, geom rows straight off the member
    table), offsets assigned by a single row_number window per doc, and
    the doc assembled by one collect_list. The earlier nested-HOF
    construction (collect versions -> transform/flatten/transform over
    the giant span array) evaluated every span struct with interpreted
    lambda expressions — measured ~4.5 s of the sf0.1 relation pipeline;
    this shape leaves only the tiny offset-comparator lambda
    interpreted. Span order is identical: versions ascending, meta
    before the version's arcs, arcs by (arc_idx, ring_hint, text).

    Pass the relation VERSION frame as ``rels`` to source the meta
    spans directly (one row per version already) — otherwise they are
    re-derived from the member rows with an extra aggregation."""
    arc_txt = F.concat(
        F.lit("ring:"),
        F.col("role"),
        F.lit(":"),
        F.array_join(
            F.zip_with(
                F.col("lon_arr"),
                F.col("lat_arr"),
                lambda lo, la: F.concat_ws(",", lo.cast("string"), la.cast("string")),
            ),
            ";",
        ),
    )
    doc_id = F.concat(F.lit("r"), F.col("rel_id").cast("string"))
    geom_rows = members.select(
        doc_id.alias("doc_id"),
        F.col("version"),
        F.lit(1).alias("srt"),
        F.col("arc_idx").alias("o1"),
        F.col("ring_hint").alias("o2"),
        F.lit("geom").alias("kind"),
        arc_txt.alias("text"),
    )
    meta_src = (
        rels
        if rels is not None
        else members.groupBy("rel_id", "version").agg(
            F.first("ts").alias("ts"), F.first("visible").alias("visible")
        )
    )
    meta_rows = (
        meta_src.select(
            F.concat(F.lit("r"), F.col("rel_id").cast("string")).alias("doc_id"),
            "version",
            F.lit(0).alias("srt"),
            F.lit(-1).alias("o1"),
            F.lit(-1).alias("o2"),
            F.lit("meta").alias("kind"),
            F.format_string(
                "v=%d;ts=%d;cs=0;uid=0;vis=%d;type=relation",
                F.col("version"),
                F.col("ts"),
                F.col("visible").cast("int"),
            ).alias("text"),
        )
    )
    rows = meta_rows.unionByName(geom_rows)
    w = Window.partitionBy("doc_id").orderBy("version", "srt", "o1", "o2", "text")
    spans = rows.withColumn("offset", (F.row_number().over(w) - 1).cast("int"))
    return spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("kind"),
                    F.col("text"),
                    F.lit("").alias("media_ref"),
                    F.col("offset"),
                )
            ),
            lambda a, b: a["offset"] - b["offset"],
        ).alias("spans")
    )


def docs_to_relation_members(docs: DataFrame) -> DataFrame:
    """Decode ``ring:`` docs back to member-arc rows (rel_id, version,
    ts, valid_to, visible, role, arc_ord, lon_arr, lat_arr) — explode +
    window + conditional aggregation + re-explode, zero Python. The
    decoded ordinal is deliberately named ``arc_ord`` (the encode's
    arc-sorted position within the version), NOT ``arc_idx``: the
    source ``arc_idx`` is 0/1 per rect ring, so the codec round trip is
    not an identity on it, and a consumer joining decoded arcs back to
    ``derive_relation_members`` on a shared name would silently mispair
    arcs (round-2 ADVICE.md). Assembly only needs a deterministic rank
    and accepts either column (operators/relations.collect_member_arcs);
    the original ring_hint label is fixture metadata assembly never
    needs."""
    s = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("offset"),
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    s = s.withColumn("vidx", F.sum((F.col("kind") == "meta").cast("int")).over(w))

    # one str_to_map parse per meta span (per-field regex was 3x the work)
    mm = F.when(
        F.col("kind") == "meta", F.str_to_map(F.col("text"), F.lit(";"), F.lit("="))
    )
    s = s.withColumn("mm", mm)
    per_version = s.groupBy("doc_id", "vidx").agg(
        F.max(F.col("mm").getItem("v").cast("int")).alias("version"),
        F.max(F.col("mm").getItem("ts").cast("long")).alias("ts"),
        (F.max(F.col("mm").getItem("vis").cast("int")) == 1).alias("visible"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("kind") == "geom", F.struct("offset", "text"))
            )
        ).alias("geoms"),
    )
    # validity is a VERSION-level interval: compute it before the arc
    # fan-out (a per-(rel, arc_idx) lead would silently mis-window
    # relations whose member count varies across versions — arcs of a
    # sparse ordinal would skip over intervening versions). The lead
    # windows by doc_id (bijective with rel_id) so the groupBy's
    # doc_id partitioning is reused — no extra shuffle.
    per_version = per_version.withColumn(
        "rel_id", F.substring(F.col("doc_id"), 2, 100).cast("long")
    ).withColumn(
        "valid_to",
        F.lead(F.col("ts")).over(Window.partitionBy("doc_id").orderBy("version")),
    )
    exploded = per_version.select(
        "rel_id",
        "version",
        "ts",
        "valid_to",
        "visible",
        F.posexplode(F.col("geoms")).alias("arc_ord", "g"),
    )
    # role is any ':'-free string ([^:]* — an empty role, common in real
    # multipolygon relations, round-trips too; ':' inside a role is the
    # one documented encode-side constraint)
    # "ring:<role>:<lon,lat;...>" — substring_index splits the 3 colon
    # fields and each coordinate pair without regex or nested split
    # arrays (role is any ':'-free string; ':' inside a role is the one
    # documented encode-side constraint)
    body = F.substring_index(F.col("g.text"), ":", -1)
    coords = F.split(body, ";")
    role = F.substring_index(F.substring_index(F.col("g.text"), ":", 2), ":", -1)
    return exploded.select(
        "rel_id",
        "version",
        "ts",
        "valid_to",
        "visible",
        "arc_ord",
        role.alias("role"),
        F.transform(
            coords, lambda p: F.substring_index(p, ",", 1).cast("long")
        ).alias("lon_arr"),
        F.transform(
            coords, lambda p: F.substring_index(p, ",", -1).cast("long")
        ).alias("lat_arr"),
    )


def relations_sql(rel_mod: int = REL_MOD) -> str:
    """DuckDB CTE body: one row per relation version with the rect
    corner terms expanded symbolically (the oracle computes expected
    areas from corners, never from assembled rings)."""
    return f"""
    SELECT event_id % {rel_mod} AS rel_id,
           row_number() OVER win AS version,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts,
           lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER win AS valid_to,
           (event_id % 7) <> 0 AS visible,
           CAST(user_id % 50 AS INT) AS uid,
           (event_id % {rel_mod}) * {LON_A} % {LON_SPAN} - {LON_OFF} AS x0,
           (event_id % {rel_mod}) * {LAT_A} % {LAT_SPAN} - {LAT_OFF} AS y0,
           {W_BASE} + (row_number() OVER win % 5) * {W_STEP} AS rw,
           {H_BASE} + (row_number() OVER win % 3) * {H_STEP} AS rh
    FROM events
    WINDOW win AS (PARTITION BY event_id % {rel_mod}
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    """
