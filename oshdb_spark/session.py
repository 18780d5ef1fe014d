"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point, shrunk to sandbox scale:
AQE on (runtime re-plan + skew-join splitting), small-partition
coalescing, Arrow enabled for every pandas UDF exchange, UTC session
timezone so epoch arithmetic matches the DuckDB oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_shipped(spark: SparkSession) -> None:
    """Ship the oshdb_spark package to executor Python workers.

    pandas-UDF closures are pickled by module reference, so executors
    must be able to import ``oshdb_spark`` even when the driver found it
    via a sys.path hack (e.g. the round driver importing
    ``__spark_entry__`` from an arbitrary cwd). Zips the package once
    per session and registers it with ``addPyFile`` — the same
    mechanism as ``spark-submit --py-files``.
    """
    if getattr(spark, "_oshdb_shipped", False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    tmp = tempfile.mkdtemp(prefix="oshdb_pyfiles_")
    zip_base = os.path.join(tmp, "oshdb_spark_pkg")
    root = os.path.dirname(pkg_dir)
    archive = shutil.make_archive(zip_base, "zip", root_dir=root, base_dir="oshdb_spark")
    spark.sparkContext.addPyFile(archive)
    spark._oshdb_shipped = True


def get_spark(
    app_name: str = "oshdb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back
    to ``local[*]``); on a real cluster callers pass ``None`` and let
    spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = max(int(cpus) if cpus else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # split size tuned so a task's working set (decoded columns +
        # window state) stays well under executor memory at the target
        # scale; at 100 TB this is the lever against shuffle spill
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
