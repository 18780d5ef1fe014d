"""Compute-dominated bench job for the N vs 4N scaling measurement.

The catalog suite at sf0.1 finishes in seconds and is dominated by
fixed per-query costs (JIT, Python worker pool startup), which makes a
parallelism comparison meaningless. This job deterministically
replicates the events table in-memory (no external data: replica k
shifts event_id by k * 10^7, keeping the derivation seeded purely by
the input), producing millions of versions, then runs the engine's
heavy path end-to-end:

  window (version numbering) -> as-of snapshot fan-out -> PIP kernel
  over the diamond AOI -> raster tiles -> hash aggregation

i.e. two shuffles + one Arrow kernel pass, the same stage mix a 100 TB
run spends its time in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oshdb_spark.operators.snapshot import snapshot_timestamps, snapshots
from oshdb_spark.operators.spatial import filter_polygon
from oshdb_spark.operators.tiles import raster_tiles
from oshdb_spark.queries import DIAMOND_LAT, DIAMOND_LON
from oshdb_spark.sources.versions import SNAPSHOT_TS, derive_versions


def replicated_events(spark: SparkSession, sf_dir: str, replicas: int) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the sandbox file is one small parquet -> one input partition; spread
    # the cheap pre-explode rows so the x-replicas fan-out and everything
    # downstream runs on all cores (a real 100 TB table arrives already
    # partitioned - this stands in for that)
    ev = ev.repartition(spark.sparkContext.defaultParallelism * 2)
    rep = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias("rep")
    ev = ev.select("*", rep)
    return ev.withColumn(
        "event_id", F.col("event_id") + F.col("rep").cast("long") * 10_000_000
    ).drop("rep")


def replicated_documents(
    spark: SparkSession, sf_dir: str, replicas: int
) -> DataFrame:
    """Deterministically replicate the documents table for the dedup
    scaling job. Replica k shifts doc_id by k * 10^7 AND salts every
    word with the replica ordinal, so cross-replica texts share no
    shingles: near-dup candidates stay within a replica and the pair
    count grows LINEARLY with replicas (identical replica text would
    put every copy of a doc in one LSH bucket — a quadratic candidate
    blow-up that no real corpus has)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        # the catalog gate's 1-in-5 subset: the full synthetic corpus
        # carries ~4x denser near-dup clusters, and pair output grows
        # quadratically within a cluster — the subset keeps the job's
        # work linear in corpus size like a real deduplicated crawl
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    rep = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias("rep")
    docs = docs.select("*", rep)
    return docs.select(
        (F.col("doc_id") + F.col("rep").cast("long") * 10_000_000).alias("doc_id"),
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.col("rep").cast("string"), F.lit("_$1")),
        ).alias("text"),
    )


def dedup_scale_job(spark: SparkSession, sf_dir: str, replicas: int = 24) -> int:
    """The LLM-pipeline counterpart of ``scale_job``: tokenize ->
    global token document frequencies -> prefix selection (rank
    window) -> candidate equi-join on prefix tokens -> exact word-set
    Jaccard verify (the Vernica prefix-filter dedup pipeline). Returns
    verified near-dup pairs + docs scanned (the throughput numerator).

    Deliberately the PURE-JVM dedup path, not the MinHash Arrow
    kernel: an Arrow UDF stage runs in a separate Python process that
    overlaps with the JVM's serializer thread, so a "1-core" executor
    really occupies ~2 CPUs during UDF stages — measured here as a
    fake ~0.39 scaling efficiency for a pipeline whose plan is
    embarrassingly parallel. The prefix join exercises the same
    shuffle/join/window mix (and the catalog's minhash_neardup gate
    still covers the Arrow path for correctness + single-size perf)."""
    from oshdb_spark.operators.dedup import jaccard_similarity_join

    # evaluate the replication + word-salt once (a real corpus is a
    # stored table, not a recomputed view)
    docs = (
        replicated_documents(spark, sf_dir, replicas)
        .select(
            "doc_id",
            F.array_distinct(F.split(F.col("text"), " ")).alias("words"),
        )
        .localCheckpoint(eager=False)
    )
    # 0.95 like the catalog gate: the synthetic corpus is dense with
    # ~0.8-similar doc pairs, so a lower threshold turns the candidate
    # set quadratic (measured 3M pairs per 5k-doc replica at 0.8 vs
    # ~10 per doc at 0.95) — no real dedup runs at 0.8 on raw text
    pairs = jaccard_similarity_join(docs, threshold=0.95)
    n_docs = docs.count()
    n_pairs = pairs.count()
    return n_pairs + n_docs


def asof_scale_job(spark: SparkSession, sf_dir: str, replicas: int = 144) -> int:
    """Third scaling job class: the member-window AS-OF machinery (the
    temporal heart of the engine, SURVEY §2.4 / ``OSHEntities.java:
    315-478``) over a replicated history — relation<-way child-induced
    modification instants end-to-end. Stage mix: slot fan-out
    (posexplode) -> per-(parent, slot) sort + two window passes ->
    union-merge as-of resolution -> hash aggregations; pure JVM,
    sort/window dominated — a genuinely different shape from the tile
    job (join + Arrow kernel) and the dedup job (equi-join + token
    windows). The parent/child universes scale WITH the replicas
    (rel_mod/way_mod multiplied), so window partitions multiply instead
    of deepening — the layout a real 100 TB history has, and the reason
    the window shuffle scales.

    Returns qualified + windowed-out instant counts plus parents seen
    (the throughput numerator)."""
    from oshdb_spark.queries import REL_SLOT_MOD, _member_window_per_ts
    from oshdb_spark.sources.relations import derive_relations, member_way_ids_col
    from oshdb_spark.sources.ways import derive_ways

    ev = replicated_events(spark, sf_dir, replicas)
    rel_mod, way_mod = 40 * replicas, 60 * replicas
    rels = derive_relations(ev, rel_mod=rel_mod)
    vers = rels.select(
        "rel_id",
        "version",
        "ts",
        "visible",
        F.posexplode(member_way_ids_col(way_mod)).alias("m_ord", "child_id"),
    ).withColumn(
        "active",
        F.col("visible")
        & ((F.col("rel_id") + F.col("version") + F.col("m_ord")) % REL_SLOT_MOD != 0),
    )
    way_ts = derive_ways(ev, way_mod=way_mod).select(
        F.col("way_id").alias("child_id"), F.col("ts").alias("c_ts")
    )
    per_ts = _member_window_per_ts(vers, way_ts, "rel_id")
    row = per_ts.agg(
        F.count(F.lit(1)).alias("n_instants"),
        F.sum(F.col("qa").cast("long")).alias("n_qualified"),
        F.count_distinct("rel_id").alias("n_parents"),
    ).collect()[0]
    return int(row["n_instants"]) + int(row["n_qualified"]) + int(row["n_parents"])


def scale_job(spark: SparkSession, sf_dir: str, replicas: int = 16) -> int:
    """Returns the number of output rows (tiles + snapshot rows) —
    the 'tiles + join-output rows' throughput numerator."""
    ev = replicated_events(spark, sf_dir, replicas)
    v = derive_versions(ev, entity_mod=200 * replicas)
    t = snapshot_timestamps(spark, SNAPSHOT_TS)
    snap = snapshots(v, t)
    hit = filter_polygon(snap, DIAMOND_LON, DIAMOND_LAT, zoom=6)
    tiles = raster_tiles(hit, zoom=8)
    row = tiles.agg(
        F.count(F.lit(1)).alias("n_tiles"), F.sum("val").alias("n_join_rows")
    ).collect()[0]
    return int(row["n_tiles"]) + int(row["n_join_rows"])
