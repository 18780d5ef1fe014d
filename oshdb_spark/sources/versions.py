"""Deterministic OSH-style version-history derivation from `events`.

The correctness gate compares every Spark query against a DuckDB
oracle over the *same* parquet inputs, so the engine's geo input — an
entity-versioned table like the reference's OSM version streams
(``oshdb/.../osm/OSMEntity.java:13-19``: id, version, timestamp,
changeset, user, visible flag, tags, fixed-point coords) — is derived
from ``events.parquet`` with pure SQL-expressible integer arithmetic.
Both dialects are generated from the constants below; keep them in
lockstep.

Derivation (seeded solely by ``event_id``/``user_id``/``ts``):

* ``entity_id  = event_id % ENTITY_MOD`` — ~ENTITY_MOD entities, each with
  ``rows/ENTITY_MOD`` versions (scale-factor proportional history depth)
* ``ts``       = epoch seconds (floored) of the event timestamp
* ``version``  = row_number over (entity_id ORDER BY ts, event_id)
* ``visible``  = event_id % 7 != 0 (mirrors the negative-version
  deleted flag, ``OSMEntity.java:63-65``)
* ``changeset``= entity_id * 1_000_000 + (version-1)//3 — runs of three
  consecutive versions share a changeset, exercising changeset
  collapsing (``OSHEntities.java:240-267``)
* ``uid``      = user_id % 50
* coords: entity-stable base spread over the globe plus a
  version-dependent jitter so some transitions are geometry changes
* ``tag_building`` (entity-stable key presence — the `building=yes`
  analog) and ``tag_v`` (version-varying value → TAG_CHANGE transitions)
* ``tags`` — the general ``map<int,int>`` tag model (the reference's
  dictionary-encoded key/value array, ``OSMEntity.java:13-19`` +
  ``TagTranslator``): four keys with *conditional presence* so
  osmTag(key) / osmTag(key, value-set) / OR-list filters have real
  semantics to exercise. The two scalar columns stay for back-compat
  and are definitionally consistent with the map (building = presence
  of key 1, tag_v = value of key 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ENTITY_MOD = 200
LON_A = 18_000_019
LAT_A = 8_500_019
LON_SPAN = 3_600_000_000
LAT_SPAN = 1_700_000_000
LON_OFF = 1_800_000_000
LAT_OFF = 850_000_000
LON_JITTER = 1_000_000  # 0.1 deg shift on event_id % 5 == 0
LAT_JITTER = 500_000  # 0.05 deg shift on event_id % 11 == 0

# Snapshot probe timestamps (epoch seconds) spanning the events window
# (~2024-01-01 .. 2024-01-31 in the synthetic data, any scale factor).
SNAPSHOT_TS = [1704500000, 1705200000, 1705900000, 1706600000]

# ---------------------------------------------------------------------------
# general tag model: map<int,int> with conditional key presence
# ---------------------------------------------------------------------------
# The dictionary-encoded tag space (TagTranslator analog). Key ids:
#   1 "building" — entity-stable presence (iff entity_id % 3 == 0),
#                  value 1 + entity_id % 2 (so value-set filters bite)
#   2 "v"        — always present, version-varying value event_id % 5
#   3 "highway"  — present iff entity_id % 4 == 1, value 10 + event_id % 3
#   4 "name"     — present iff event_id % 2 == 0, value event_id % 13
# Spark and SQL mirrors are generated from these rules — change both
# derive_versions and the *_SQL dicts together (CLAUDE.md invariant).
KNOWN_TAG_KEYS = frozenset({1, 2, 3, 4})

TAG_PRESENT_SQL = {
    1: "(entity_id % 3 = 0)",
    2: "TRUE",
    3: "(entity_id % 4 = 1)",
    4: "(event_id % 2 = 0)",
}
TAG_VALUE_SQL = {
    1: "(1 + entity_id % 2)",
    2: "(event_id % 5)",
    3: "(10 + event_id % 3)",
    4: "(event_id % 13)",
}


def tag_pred_sql(key: int, values: list[int] | None = None) -> str:
    """Oracle-side predicate for osmTag(key) / osmTag(key, value-set),
    over a relation carrying entity_id/event_id (the versions CTE).
    Unknown keys are FALSE — the reference's unknown-tag shortcut
    (MapReducer.java:469-474)."""
    if key not in KNOWN_TAG_KEYS:
        return "FALSE"
    pres = TAG_PRESENT_SQL[key]
    if values is None:
        return pres
    in_list = ", ".join(str(v) for v in values)
    return f"({pres} AND {TAG_VALUE_SQL[key]} IN ({in_list}))"


def load_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """versions(entity_id, version, ts, changeset, uid, visible,
    lon_e7, lat_e7, tag_building, tag_v) derived from events.parquet."""
    return derive_versions(spark.read.parquet(f"{sf_dir}/events.parquet"))


def conditional_tags_map(entries) -> F.Column:
    """map<int,int> from (key, present Column, value Column) triples:
    absent keys become null structs dropped by the filter, so entry
    order (and therefore map_entries order) stays key-ascending. Shared
    by the node tag model here and the way tag model
    (sources/ways.with_way_tags)."""
    arr = F.array(
        *[
            F.when(
                present,
                F.struct(
                    F.lit(k).cast("int").alias("key"),
                    value.cast("int").alias("value"),
                ),
            )
            for k, present, value in entries
        ]
    )
    return F.map_from_entries(F.filter(arr, lambda e: e.isNotNull()))


def _tags_map_col(eid, entity) -> F.Column:
    """The tags map<int,int> column — Spark mirror of TAG_PRESENT_SQL /
    TAG_VALUE_SQL."""
    return conditional_tags_map(
        [
            (1, entity % 3 == 0, F.lit(1) + entity % 2),
            (2, F.lit(True), eid % 5),
            (3, entity % 4 == 1, F.lit(10) + eid % 3),
            (4, eid % 2 == 0, eid % 13),
        ]
    )


def derive_versions(ev: DataFrame, entity_mod: int = ENTITY_MOD) -> DataFrame:
    """The derivation itself, parameterizable for bench-scale inputs
    (a larger ``entity_mod`` spreads replicated events over more
    entities)."""
    eid = F.col("event_id")
    entity = (eid % entity_mod).alias("entity_id")
    base = ev.select(
        entity,
        eid.alias("event_id"),
        # parquet gives TIMESTAMP_NTZ; treat as UTC (session tz) → floored epoch
        # seconds, matching the oracle's floor(epoch(ts))
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("ts"),
        (F.col("user_id") % 50).cast("int").alias("uid"),
        ((eid % 7) != 0).alias("visible"),
        (
            (F.col("event_id") % entity_mod) * LON_A % LON_SPAN
            - LON_OFF
            + F.when(eid % 5 == 0, LON_JITTER).otherwise(0)
        ).alias("lon_e7"),
        (
            (F.col("event_id") % entity_mod) * LAT_A % LAT_SPAN
            - LAT_OFF
            + F.when(eid % 11 == 0, LAT_JITTER).otherwise(0)
        ).alias("lat_e7"),
        F.when((eid % entity_mod) % 3 == 0, 1).otherwise(0).alias("tag_building"),
        (eid % 5).cast("int").alias("tag_v"),
        _tags_map_col(eid, eid % entity_mod).alias("tags"),
    )
    w = Window.partitionBy("entity_id").orderBy("ts", "event_id")
    # version AND valid_to in one window pass: lead(ts) over the same
    # spec as row_number costs nothing extra, while a later window over
    # (entity, version) would re-sort the whole table a second time
    return (
        base.withColumn("version", F.row_number().over(w))
        .withColumn("valid_to", F.lead("ts").over(w))
        .withColumn(
            "changeset",
            F.col("entity_id") * 1_000_000 + ((F.col("version") - 1) / 3).cast("long"),
        )
    )


def versions_sql(sf_dir: str) -> str:
    """The identical derivation as a DuckDB CTE body (a SELECT producing
    the same columns from the pre-registered ``events`` view)."""
    return f"""
    SELECT * ,
           entity_id * 1000000 + CAST(floor((version - 1) / 3) AS BIGINT) AS changeset
    FROM (
      SELECT
        event_id % {ENTITY_MOD} AS entity_id,
        event_id,
        CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        CAST(user_id % 50 AS INT) AS uid,
        (event_id % 7) <> 0 AS visible,
        (event_id % {ENTITY_MOD}) * {LON_A} % {LON_SPAN} - {LON_OFF}
          + CASE WHEN event_id % 5 = 0 THEN {LON_JITTER} ELSE 0 END AS lon_e7,
        (event_id % {ENTITY_MOD}) * {LAT_A} % {LAT_SPAN} - {LAT_OFF}
          + CASE WHEN event_id % 11 = 0 THEN {LAT_JITTER} ELSE 0 END AS lat_e7,
        CASE WHEN (event_id % {ENTITY_MOD}) % 3 = 0 THEN 1 ELSE 0 END AS tag_building,
        CAST(event_id % 5 AS INT) AS tag_v,
        row_number() OVER (PARTITION BY event_id % {ENTITY_MOD} ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS version
      FROM events
    )
    """


def snapshot_ts_values_sql() -> str:
    """VALUES list of the snapshot probe timestamps for oracle SQL."""
    rows = ", ".join(f"({t})" for t in SNAPSHOT_TS)
    return f"(VALUES {rows}) AS t(snap_ts)"
