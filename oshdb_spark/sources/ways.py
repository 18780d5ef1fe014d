"""Way-analog entities: versioned LINE/POLYGON geometries.

The reference's ways resolve member nodes as-of a timestamp and build
LineString/Polygon geometries (``OSMWay.java:30-35``,
``OSHDBGeometryBuilder.java:66-139``); per SURVEY §7.0 the graft
pre-assembles geometry per version, so a way version carries its full
coordinate array. This module derives a deterministic way table from
``events`` (SQL-expressible in both engines, like
``sources/versions.py``) and round-trips it through the interleaved-doc
``line:`` span encoding of FIXTURES.md §1:

    geom span text = "line:<lon1>,<lat1>;<lon2>,<lat2>;..."   (e7 ints)

Derivation (seeded solely by event_id/ts):

* ``way_id  = event_id % WAY_MOD``
* ``version = row_number over (way_id ORDER BY ts, event_id)``
* 5-vertex polyline: ``lon_j = base_lon(way) + j * delta(version)``,
  ``lat_j = base_lat(way) + j^2 * LAT_CURVE + wiggle(version)`` — the
  version-dependent terms make GEOMETRY_CHANGE transitions real.

Everything engine-side is JVM Column expressions (arrays built with
``transform`` over a literal index sequence; encode/decode via
higher-order functions) — geometry kernels are the only Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WAY_MOD = 60
N_PTS = 5
LON_A = 61_000_019
LAT_A = 31_000_019
LON_SPAN = 3_400_000_000
LAT_SPAN = 1_600_000_000
LON_OFF = 1_700_000_000
LAT_OFF = 800_000_000
DELTA_BASE = 1_000_000
DELTA_STEP = 10_000
LAT_CURVE = 5_000
WIGGLE = 11_000


def derive_ways(ev: DataFrame, way_mod: int = WAY_MOD) -> DataFrame:
    """ways(way_id, version, ts, valid_to, visible, lon_arr, lat_arr)."""
    eid = F.col("event_id")
    base = ev.select(
        (eid % way_mod).alias("way_id"),
        eid.alias("event_id"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("ts"),
        ((eid % 7) != 0).alias("visible"),
        # editor of this version (contributor attribution through the
        # member chain, OSMContribution.java:223-256)
        (F.col("user_id") % 50).cast("int").alias("uid"),
    )
    w = Window.partitionBy("way_id").orderBy("ts", "event_id")
    v = base.withColumn("version", F.row_number().over(w)).withColumn(
        "valid_to", F.lead("ts").over(w)
    )
    base_lon = (F.col("way_id") * LON_A % LON_SPAN - LON_OFF).cast("long")
    base_lat = (F.col("way_id") * LAT_A % LAT_SPAN - LAT_OFF).cast("long")
    delta = (F.lit(DELTA_BASE) + (F.col("version") % 50) * DELTA_STEP).cast("long")
    wiggle = ((F.col("version") % 7) * WIGGLE).cast("long")
    idx = F.sequence(F.lit(0), F.lit(N_PTS - 1))
    return v.select(
        "way_id",
        "version",
        "ts",
        "valid_to",
        "visible",
        "uid",
        F.transform(idx, lambda j: base_lon + j.cast("long") * delta).alias("lon_arr"),
        F.transform(
            idx, lambda j: base_lat + j.cast("long") * j.cast("long") * LAT_CURVE + wiggle
        ).alias("lat_arr"),
    )


# --- way -> node member references (OSHEntities.java:315-393) --------------
# The reference derives WAY geometry changes from node-member edits: a
# node version instant counts as a way modification while the node IS a
# member of the way. Per SURVEY §7.0 way geometry itself is
# pre-materialized, so these references exist purely to exercise the
# child-induced modification machinery one level below relations — the
# same normalized member model as sources/relations.member_way_ids_col.
NODES_PER_WAY = 3
WAY_SLOT_MOD = 3  # node slot s of way w is a member in version v iff
#                   (w + v + s) % 3 != 0 — membership that CHANGES across
#                   versions (the interval-validity fixture, mirroring
#                   queries.REL_SLOT_MOD one entity level down)


def member_node_ids_sql(entity_mod: int) -> list[str]:
    """The node-member-id formulas as SQL expressions over ``way_id``."""
    return [
        f"(way_id % {entity_mod})",
        f"((way_id * 11 + 3) % {entity_mod})",
        f"((way_id * 17 + 5) % {entity_mod})",
    ]


def member_node_ids_col(entity_mod: int) -> F.Column:
    """Same formulas as an array Column."""
    wid = F.col("way_id")
    return F.array(
        (wid % entity_mod).cast("long"),
        ((wid * 11 + 3) % entity_mod).cast("long"),
        ((wid * 17 + 5) % entity_mod).cast("long"),
    )


# --- way tag model (TagInterpreter fixture) --------------------------------
# key ids from functions/taginterpreter.py; presence/value rules are pure
# way_id arithmetic, mirrored in SQL below. Even way_ids are digitized as
# CLOSED rings (first vertex appended), so the isArea closure test is real.
WAY_CLOSED_MOD = 2       # way_id % 2 == 0 -> closed ring
WAY_BUILDING_MOD = 3     # key 1 present iff way_id % 3 == 0
WAY_BUILDING_NO_MOD = 9  # ... with value no(0) iff way_id % 9 == 0, else yes(1)
WAY_AREA_MOD = 5         # key 5 (area) present iff way_id % 5 == 0
WAY_AREA_YES_MOD = 20    # ... with value yes(1) iff way_id % 20 == 0, else no(0)
WAY_HIGHWAY_MOD = 4      # key 6 present iff way_id % 4 == 1 (NOT area-ish)
WAY_LANDUSE_MOD = 7      # key 7 present iff way_id % 7 == 0 (whitelist mode)
WAY_BARRIER_MOD = 11     # key 8 present iff way_id % 11 == 0 (blacklist mode)
# landuse/barrier values cycle 1..3 by way_id % 3 + 1 — exercising the
# whitelist exception (landuse=residential(2) present but NOT an area)
# and the blacklist exception (only barrier=city_wall(3) IS an area)


def with_way_tags(ways: DataFrame) -> DataFrame:
    """Append the tags map and close the ring of even way_ids — the
    TagInterpreter fixture decoration (leaves the base way table, and
    therefore every existing oracle, untouched). The tag model spans
    every polygon-features rule mode: building (mode "all", with
    building=no rows), landuse (whitelist with a value exception),
    barrier (blacklist), plus the explicit area override and a
    non-dictionary highway key."""
    from oshdb_spark.functions.taginterpreter import (
        AREA_KEY,
        BARRIER_KEY,
        BUILDING_KEY,
        HIGHWAY_KEY,
        LANDUSE_KEY,
    )
    from oshdb_spark.sources.versions import conditional_tags_map

    wid = F.col("way_id")
    cycle3 = (wid % 3 + 1).cast("int")  # values 1..3
    tags = conditional_tags_map(
        [
            (
                BUILDING_KEY,
                wid % WAY_BUILDING_MOD == 0,
                F.when(wid % WAY_BUILDING_NO_MOD == 0, F.lit(0)).otherwise(F.lit(1)),
            ),
            (
                AREA_KEY,
                wid % WAY_AREA_MOD == 0,
                F.when(wid % WAY_AREA_YES_MOD == 0, F.lit(1)).otherwise(F.lit(0)),
            ),
            (HIGHWAY_KEY, wid % WAY_HIGHWAY_MOD == 1, F.lit(1)),
            (LANDUSE_KEY, wid % WAY_LANDUSE_MOD == 0, cycle3),
            (BARRIER_KEY, wid % WAY_BARRIER_MOD == 0, cycle3),
        ]
    )
    closed = wid % WAY_CLOSED_MOD == 0
    close = lambda arr: F.when(  # noqa: E731
        closed, F.concat(F.col(arr), F.array(F.element_at(F.col(arr), 1)))
    ).otherwise(F.col(arr))
    return (
        ways.withColumn("tags", tags)
        .withColumn("lon_arr", close("lon_arr"))
        .withColumn("lat_arr", close("lat_arr"))
    )


def ways_sql(way_mod: int = WAY_MOD) -> str:
    """DuckDB CTE body producing the same way-version rows with the
    vertex formulas inlined (the oracle never builds arrays — it
    expands the geometry terms symbolically)."""
    return f"""
    SELECT event_id % {way_mod} AS way_id,
           row_number() OVER win AS version,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts,
           lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER win AS valid_to,
           (event_id % 7) <> 0 AS visible,
           CAST(user_id % 50 AS INT) AS uid,
           (event_id % {way_mod}) * {LON_A} % {LON_SPAN} - {LON_OFF} AS base_lon,
           (event_id % {way_mod}) * {LAT_A} % {LAT_SPAN} - {LAT_OFF} AS base_lat,
           {DELTA_BASE} + (row_number() OVER win % 50) * {DELTA_STEP} AS delta,
           (row_number() OVER win % 7) * {WIGGLE} AS wiggle
    FROM events
    WINDOW win AS (PARTITION BY event_id % {way_mod}
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    """


def lon_sql(j: int) -> str:
    return f"(base_lon + {j} * delta)"


def lat_sql(j: int) -> str:
    return f"(base_lat + {j * j} * {LAT_CURVE} + wiggle)"


# ---------------------------------------------------------------------------
# interleaved-doc round trip: line: span encoding (FIXTURES.md §1)
# ---------------------------------------------------------------------------

def ways_to_docs(ways: DataFrame) -> DataFrame:
    """One doc per way; each version contributes a meta span and a
    ``line:`` geom span. Pure Column/HOF encode."""
    coord_txt = F.concat(
        F.lit("line:"),
        F.array_join(
            F.zip_with(
                F.col("lon_arr"),
                F.col("lat_arr"),
                lambda lo, la: F.concat_ws(",", lo.cast("string"), la.cast("string")),
            ),
            ";",
        ),
    )
    v = F.struct(
        F.col("version"),
        F.col("ts"),
        F.col("visible"),
        coord_txt.alias("geom_txt"),
    )
    per_way = ways.groupBy("way_id").agg(F.array_sort(F.collect_list(v)).alias("vs"))

    def spans_of(x):
        meta = F.struct(
            F.lit("meta").alias("kind"),
            F.format_string(
                "v=%d;ts=%d;cs=0;uid=0;vis=%d;type=way",
                x["version"],
                x["ts"],
                x["visible"].cast("int"),
            ).alias("text"),
            F.lit("").alias("media_ref"),
        )
        geom = F.struct(
            F.lit("geom").alias("kind"),
            x["geom_txt"].alias("text"),
            F.lit("").alias("media_ref"),
        )
        return F.array(meta, geom)

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
    return per_way.select(
        F.concat(F.lit("w"), F.col("way_id").cast("string")).alias("doc_id"),
        with_offsets.alias("spans"),
    )


def docs_to_ways(docs: DataFrame) -> DataFrame:
    """Decode ``line:`` docs back to way versions — explode + window +
    conditional aggregation, zero Python (same plan shape as
    ``docs.docs_to_versions``)."""
    s = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("offset"),
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    s = s.withColumn("vidx", F.sum((F.col("kind") == "meta").cast("int")).over(w))

    # one str_to_map parse per meta span + substring_index coordinate
    # split (per-field regex was 3x the work; see sources/docs.py)
    s = s.withColumn(
        "mm",
        F.when(
            F.col("kind") == "meta",
            F.str_to_map(F.col("text"), F.lit(";"), F.lit("=")),
        ),
    )
    coords = F.split(F.substring_index(F.col("text"), ":", -1), ";")
    lon_arr = F.transform(
        coords, lambda p: F.substring_index(p, ",", 1).cast("long")
    )
    lat_arr = F.transform(
        coords, lambda p: F.substring_index(p, ",", -1).cast("long")
    )

    out = s.groupBy("doc_id", "vidx").agg(
        F.max(F.col("mm").getItem("v").cast("int")).alias("version"),
        F.max(F.col("mm").getItem("ts").cast("long")).alias("ts"),
        (F.max(F.col("mm").getItem("vis").cast("int")) == 1).alias("visible"),
        F.max(F.when(F.col("kind") == "geom", lon_arr)).alias("lon_arr"),
        F.max(F.when(F.col("kind") == "geom", lat_arr)).alias("lat_arr"),
    )
    # valid_to windows by doc_id (bijective with way_id) so the groupBy
    # partitioning is reused — no extra shuffle
    w2 = Window.partitionBy("doc_id").orderBy("version")
    return out.withColumn("valid_to", F.lead("ts").over(w2)).select(
        F.substring(F.col("doc_id"), 2, 100).cast("long").alias("way_id"),
        "version",
        "ts",
        "visible",
        "lon_arr",
        "lat_arr",
        "valid_to",
    )
