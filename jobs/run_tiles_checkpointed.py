"""spark-submit entrypoint: checkpointed raster-tile materialization
with per-partition lineage manifests (M9 runtime layer).

Usage:
    spark-submit --py-files oshdb_spark.zip jobs/run_tiles_checkpointed.py \
        [sf_dir] [out_dir] [num_buckets] [wave_size]

Re-running after a kill resumes at bucket granularity: committed
buckets (manifest present, same input snapshot) are skipped; everything
else is recomputed. `out_dir/_lineage/bucket-*.json` carries the
per-partition rows/cells/skew metrics.
"""
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oshdb_tiles_ckpt"
    num_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    wave_size = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from oshdb_spark.operators.snapshot import snapshot_timestamps, snapshots
    from oshdb_spark.operators.tiles import raster_tiles
    from oshdb_spark.runtime import CheckpointedStage, input_snapshot_fingerprint
    from oshdb_spark.sources.versions import SNAPSHOT_TS, load_versions

    spark = SparkSession.builder.appName("oshdb-tiles-ckpt").getOrCreate()
    snap_id = input_snapshot_fingerprint(spark, [f"{sf_dir}/events.parquet"])

    def build(s: SparkSession):
        v = load_versions(s, sf_dir)
        t = snapshot_timestamps(s, [SNAPSHOT_TS[-1]])
        tiles = raster_tiles(snapshots(v, t), zoom=6)
        return tiles.withColumn(
            "cell_id", (F.col("tile_y") * (1 << 6) + F.col("tile_x")).cast("long")
        )

    stage = CheckpointedStage(
        out_dir=out_dir,
        stage="raster_tiles_z6",
        num_buckets=num_buckets,
        bucket_key="cell_id",
        input_snapshot=snap_id,
        wave_size=wave_size,
    )
    summary = stage.run(spark, build)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
