"""spark-submit entrypoint: incremental raster-tile maintenance.

Reads version events as a file stream (the Iceberg-snapshot-append
analog: each new file is one commit), maintains event-time windowed
per-tile aggregates with a watermark, and writes the tile table to a
parquet sink with a checkpoint — kill it and re-submit, and Structured
Streaming resumes from the checkpoint without reprocessing finished
commits (the streaming face of the jobs/run_tiles_checkpointed.py
batch resume story).

Usage: spark-submit --py-files oshdb_spark.zip jobs/run_tile_stream.py \
          [src_dir] [out_dir] [zoom]

``src_dir`` defaults to a staging copy of the sf0.001 events written as
three parquet files (created on first run); availableNow processes the
backlog and exits, so the job is driveable in CI.
"""
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from oshdb_spark.sources.versions import load_versions
from oshdb_spark.streaming.tile_stream import stream_raster_tiles

EVENT_SCHEMA = (
    "entity_id long, ts long, visible boolean, lon_e7 long, lat_e7 long"
)

if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oshdb_tile_stream/src"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oshdb_tile_stream/out"
    zoom = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = SparkSession.builder.appName("oshdb-tile-stream").getOrCreate()

    if not os.path.isdir(src):
        # stage a demo backlog from the fixture, split by EVENT TIME so
        # commit order matches event-time order (no watermark drops;
        # only the trailing window stays pending at exit)
        v = load_versions(spark, "/root/testdata/sf0.001").select(
            "entity_id", "ts", "visible", "lon_e7", "lat_e7"
        )
        lo, hi = v.agg(F.min("ts"), F.max("ts")).first()
        t1, t2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
        bounds = ((lo - 1, t1), (t1, t2), (t2, hi + 1))
        for i, (a, b) in enumerate(bounds):
            (
                v.filter((F.col("ts") > a) & (F.col("ts") <= b))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{src}/commit{i}")
            )

    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/commit*")
    )
    tiles = stream_raster_tiles(events, zoom, window="6 hours", watermark="1 hour")
    q = (
        tiles.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{out}_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.read.parquet(out).count()
    print(f"tile_rows={n}")
    spark.stop()
