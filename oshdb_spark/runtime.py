"""Scale runtime: explicit partitioning, hot-cell salting, skew
metrics, and checkpoint/resume with per-partition lineage manifests.

This is the layer the reference does not have (its Ignite backends get
data-locality from cache affinity, ``MapReducerIgniteLocalPeek.java:57-200``,
and balance work with interleaved ~1M-cell buffers,
``MapReducerIgniteLocalPeek.java:182-200``) but that a 10^12-document
deployment needs explicitly:

* ``repartition_by_cell``  — hash-range repartition on the hierarchical
  cell-prefix key so spatially-near rows co-locate and later cell-keyed
  joins/aggregations reuse one exchange.
* ``salt_col`` / two-stage ``salted_count`` — dense urban cells are the
  classic OSM hot keys; salting spreads one hot group over ``factor``
  sub-groups, partial-aggregates, then final-combines (the map-side
  combine the reference gets from its per-cell kernel fold,
  ``backend/Kernels.java:39-185``, generalized to a skewed key space).
* ``partition_metrics`` / ``skew_ratio`` — per-partition rows, distinct
  cells touched, and max/mean skew — the metrics the lineage manifests
  record.
* ``CheckpointedStage`` — stage outputs are written bucket-by-bucket
  (hash of the cell prefix / any key into ``num_buckets``), each wave
  followed by a JSON *lineage manifest* per bucket:

      {bucket, rows_out, cells_touched, input_snapshot, stage, wave,
       wall_sec, written_at_unix}

  A re-run lists committed manifests, verifies they pin the same
  ``input_snapshot`` (the Iceberg-snapshot-id analog — any stable
  fingerprint of the input), and recomputes **only the missing
  buckets** by pushing ``bucket IN (todo)`` into the scan. That is
  resume at partition granularity: a killed run loses at most the
  in-flight wave. Manifest writes are atomic (tmp + rename) so a crash
  mid-manifest never yields a committed-but-empty bucket.

Buckets are processed in waves of ``wave_size`` Spark jobs; wave_size=1
gives strict per-partition commit, larger waves amortize job-launch
overhead (the analog of the reference's interleaved cell-id batches).
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_lineage"


# ---------------------------------------------------------------------------
# query timeout / cancellation (OSHDBDatabase.timeout, SURVEY §4 #17)
# ---------------------------------------------------------------------------

class OSHDBTimeoutException(Exception):
    """A query exceeded its configured time limit — the analog of the
    reference's ``OSHDBTimeoutException`` thrown from the per-cell
    ``isActive()`` poll (``MapReducerJdbc.java:43-49``; cancelable
    kernels at ``Kernels.java:22-34``; user surface
    ``OSHDBDatabase.timeout(seconds)``, ``OSHDBDatabase.java:57-96``).

    The Spark-native mechanism is stronger than the reference's poll:
    the watchdog cancels the whole JOB GROUP (``cancelJobGroup`` with
    ``interruptOnCancel``), so running tasks on every executor are
    interrupted instead of waiting for the next cell boundary."""


def run_with_timeout(
    spark: SparkSession,
    seconds: float,
    action: Callable[[], Any],
    desc: str = "oshdb query",
) -> Any:
    """Run a driver-side Spark ACTION under a wall-clock limit.

    All jobs submitted by ``action`` (which must run in this thread —
    Spark job groups are thread-local) join a fresh job group; a daemon
    watchdog timer cancels the group when the limit expires, and the
    interrupted action is re-raised as :class:`OSHDBTimeoutException`.
    The session stays usable afterwards — only this group is cancelled,
    exactly like the reference where a timed-out query doesn't poison
    the OSHDBDatabase.
    """
    sc = spark.sparkContext
    gid = f"oshdb-timeout-{uuid.uuid4().hex[:12]}"
    expired = threading.Event()

    def _cancel() -> None:
        expired.set()
        sc.cancelJobGroup(gid)

    sc.setJobGroup(gid, desc, interruptOnCancel=True)
    timer = threading.Timer(seconds, _cancel)
    timer.daemon = True
    timer.start()
    try:
        result = action()
        if expired.is_set():
            # the cancel raced a just-finished job; the contract is
            # deterministic: past the limit means timeout
            raise OSHDBTimeoutException(f"{desc!r} exceeded {seconds}s")
        return result
    except OSHDBTimeoutException:
        raise
    except Exception as e:  # Py4JJavaError "cancelled because of user request"
        if expired.is_set():
            raise OSHDBTimeoutException(f"{desc!r} exceeded {seconds}s") from e
        raise
    finally:
        timer.cancel()
        # leave no thread-local group behind for later queries
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
        sc.setLocalProperty("spark.job.interruptOnCancel", None)


def stream_with_timeout(
    df: DataFrame, seconds: float, desc: str = "oshdb stream"
) -> Iterator:
    """``toLocalIterator`` under the same job-group watchdog.

    The stream() terminal launches jobs incrementally as the iterator
    is consumed, so the group must stay armed across the WHOLE
    consumption, not just iterator creation — hence a generator, not a
    context manager. Mirrors the reference's behavior where the
    timeout poll runs inside the streaming kernels too
    (``Kernels.java:190-301``)."""
    spark = df.sparkSession
    sc = spark.sparkContext
    gid = f"oshdb-timeout-{uuid.uuid4().hex[:12]}"
    expired = threading.Event()

    def _cancel() -> None:
        expired.set()
        sc.cancelJobGroup(gid)

    sc.setJobGroup(gid, desc, interruptOnCancel=True)
    timer = threading.Timer(seconds, _cancel)
    timer.daemon = True
    timer.start()
    try:
        # iterator creation itself may launch the first job (and be the
        # thing that gets cancelled) — guard it like every next()
        try:
            it = df.toLocalIterator()
        except Exception as e:
            if expired.is_set():
                raise OSHDBTimeoutException(f"{desc!r} exceeded {seconds}s") from e
            raise
        while True:
            try:
                row = next(it)
            except StopIteration:
                return
            except Exception as e:
                if expired.is_set():
                    raise OSHDBTimeoutException(
                        f"{desc!r} exceeded {seconds}s"
                    ) from e
                raise
            if expired.is_set():
                raise OSHDBTimeoutException(f"{desc!r} exceeded {seconds}s")
            yield row
    finally:
        timer.cancel()
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
        sc.setLocalProperty("spark.job.interruptOnCancel", None)


# ---------------------------------------------------------------------------
# partitioning & salting
# ---------------------------------------------------------------------------

def cell_prefix(cell_col: Column, zoom: int, prefix_zoom: int) -> Column:
    """Parent cell at ``prefix_zoom`` of a cell id at ``zoom`` — the
    hierarchical-prefix property of the Morton/H3-style key: each
    coarser level is an integer right-shift of (x, y).
    """
    if prefix_zoom > zoom:
        raise ValueError("prefix_zoom must be <= zoom")
    shift = zoom - prefix_zoom
    n, np_ = 1 << zoom, 1 << prefix_zoom
    x = cell_col % n
    y = F.floor(cell_col / n)
    return (F.floor(y / (1 << shift)) * np_ + F.floor(x / (1 << shift))).cast("long")


def repartition_by_cell(
    df: DataFrame, num_partitions: int, cell: str = "cell_id"
) -> DataFrame:
    """Hash repartition on the cell key. Heavy spatial stages run after
    this single exchange and cell-keyed groupBys become partial-only."""
    return df.repartition(num_partitions, F.col(cell))


def salt_col(factor: int, row_entropy: Column) -> Column:
    """Salt sub-key in [0, factor): deterministic hash of a row-level
    column so re-runs are stable (no rand(), which would break resume)."""
    return F.pmod(F.hash(row_entropy), F.lit(factor))


def salted_count(
    df: DataFrame,
    key_cols: list[str],
    factor: int,
    row_entropy: str,
    cnt_alias: str = "cnt",
) -> DataFrame:
    """Two-stage skew-safe count: groupBy(key, salt) partial counts,
    then final combine by key. For a hot key the first stage spreads
    its rows over ``factor`` reducers; the second stage sees only
    ``factor`` partial rows per key."""
    salted = df.withColumn("_salt", salt_col(factor, F.col(row_entropy)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(cnt_alias))


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def partition_metrics(df: DataFrame, cell: str | None = "cell_id") -> DataFrame:
    """Per physical-partition metrics: rows, distinct cells touched.
    One extra narrow pass (spark_partition_id is free); feeds manifests."""
    cells = (
        F.count_distinct(F.col(cell)).alias("cells_touched")
        if cell and cell in df.columns
        else F.lit(None).cast("long").alias("cells_touched")
    )
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"), cells)
    )


def skew_ratio(metrics: list[dict]) -> float:
    """max(rows)/mean(rows) over partition metrics rows (1.0 = balanced)."""
    rows = [m["rows"] for m in metrics if m.get("rows")]
    if not rows:
        return 1.0
    return max(rows) / (sum(rows) / len(rows))


# ---------------------------------------------------------------------------
# checkpoint / resume with lineage manifests
# ---------------------------------------------------------------------------

class CheckpointedStage:
    """Bucket-granular checkpointed stage writer.

    ``builder(spark)`` must return the full stage output DataFrame; a
    ``bucket`` column in [0, num_buckets) is appended as
    ``pmod(hash(bucket_key), num_buckets)``. Output lands under
    ``out_dir/bucket=<b>/`` (parquet, partitioned write); each committed
    bucket gets ``out_dir/_lineage/bucket-<b>.json``.
    """

    def __init__(
        self,
        out_dir: str,
        stage: str,
        num_buckets: int,
        bucket_key: str,
        input_snapshot: str,
        wave_size: int = 4,
        cell: str | None = "cell_id",
    ) -> None:
        self.out_dir = out_dir
        self.stage = stage
        self.num_buckets = num_buckets
        self.bucket_key = bucket_key
        self.input_snapshot = input_snapshot
        self.wave_size = wave_size
        self.cell = cell
        self.manifest_dir = os.path.join(out_dir, MANIFEST_DIR)

    # -- manifests ---------------------------------------------------------

    def _manifest_path(self, bucket: int) -> str:
        return os.path.join(self.manifest_dir, f"bucket-{bucket}.json")

    def committed_buckets(self) -> dict[int, dict]:
        """Buckets with a committed manifest pinning our input snapshot.
        A manifest for a *different* snapshot is stale: dropped (and its
        bucket recomputed) so resume never mixes input versions."""
        out: dict[int, dict] = {}
        if not os.path.isdir(self.manifest_dir):
            return out
        for name in os.listdir(self.manifest_dir):
            if not (name.startswith("bucket-") and name.endswith(".json")):
                continue
            path = os.path.join(self.manifest_dir, name)
            try:
                with open(path) as f:
                    m = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue  # torn write -> treat as uncommitted
            if m.get("input_snapshot") != self.input_snapshot:
                os.remove(path)
                continue
            out[int(m["bucket"])] = m
        return out

    def _commit_manifest(self, manifest: dict) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        path = self._manifest_path(manifest["bucket"])
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)  # atomic: crash never leaves a half manifest

    # -- run ---------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        builder: Callable[[SparkSession], DataFrame],
        fail_after_waves: int | None = None,
    ) -> dict:
        """Compute every not-yet-committed bucket; returns a summary
        {written_buckets, skipped_buckets, rows_out, skew_ratio}.

        ``fail_after_waves`` is a test hook simulating a killed run.
        """
        done = self.committed_buckets()
        todo = [b for b in range(self.num_buckets) if b not in done]
        # a crash between data commit and manifest commit leaves an
        # orphan bucket dir; drop it so the recompute can't duplicate
        import shutil

        for b in todo:
            orphan = os.path.join(self.out_dir, f"bucket={b}")
            if os.path.isdir(orphan):
                shutil.rmtree(orphan)
        written: list[int] = []
        waves = [
            todo[i : i + self.wave_size] for i in range(0, len(todo), self.wave_size)
        ]
        all_metrics: list[dict] = list(done.values())
        for wave_no, wave in enumerate(waves):
            if fail_after_waves is not None and wave_no >= fail_after_waves:
                break
            t0 = time.perf_counter()
            df = builder(spark).withColumn(
                "bucket", F.pmod(F.hash(F.col(self.bucket_key)), F.lit(self.num_buckets))
            )
            # bucket pruning pushes into the scan at 100 TB when the
            # physical table is partitioned by the same bucket expr
            part = df.filter(F.col("bucket").isin(wave))
            part.write.mode("append").partitionBy("bucket").parquet(self.out_dir)
            # lineage metrics from the *written* files (verifies the
            # commit and avoids recomputing the stage); partition
            # pruning on bucket= keeps this a wave-local scan. The
            # explicit schema keeps an all-empty wave readable (schema
            # inference would fail on a directory with no parquet files,
            # aborting a run that should just commit zero-row manifests)
            written_df = spark.read.schema(part.schema).parquet(self.out_dir).filter(
                F.col("bucket").isin(wave)
            )
            cells = (
                F.count_distinct(F.col(self.cell)).alias("cells_touched")
                if self.cell and self.cell in written_df.columns
                else F.lit(-1).alias("cells_touched")
            )
            stats = {
                int(r["bucket"]): r.asDict()
                for r in written_df.groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("rows"), cells)
                .collect()
            }
            wall = time.perf_counter() - t0
            for b in wave:
                m = {
                    "bucket": b,
                    "stage": self.stage,
                    "rows": int(stats.get(b, {}).get("rows", 0)),
                    "cells_touched": int(stats.get(b, {}).get("cells_touched", 0)),
                    "input_snapshot": self.input_snapshot,
                    "wave": wave_no,
                    "wall_sec": round(wall, 3),
                    "written_at_unix": int(time.time()),
                }
                self._commit_manifest(m)
                all_metrics.append(m)
                written.append(b)
        return {
            "written_buckets": written,
            "skipped_buckets": sorted(done),
            "rows_out": sum(m["rows"] for m in all_metrics),
            "skew_ratio": round(skew_ratio(all_metrics), 4),
            "complete": len(done) + len(written) == self.num_buckets,
        }


def input_snapshot_fingerprint(spark: SparkSession, paths: list[str]) -> str:
    """Stable fingerprint of the input files — the sandbox stand-in for
    an Iceberg snapshot id (same role: pin which input version a
    checkpoint belongs to). Hashes (path, size, mtime) of every file."""
    import hashlib

    h = hashlib.md5()
    for p in sorted(paths):
        if os.path.isdir(p):
            files = sorted(
                os.path.join(dp, f) for dp, _, fs in os.walk(p) for f in fs
            )
        else:
            files = [p]
        for f in files:
            st = os.stat(f)
            h.update(f"{f}|{st.st_size}|{int(st.st_mtime)}".encode())
    return h.hexdigest()
