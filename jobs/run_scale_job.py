"""spark-submit entrypoint: the throughput scale job (the workload the
N vs 4N executor measurement runs; see bench.py --scaling).

Usage:
    spark-submit --master <cluster> --py-files oshdb_spark.zip \
        jobs/run_scale_job.py [sf_dir] [replicas]

Pipeline: replicate events -> version window -> as-of snapshot fan-out
-> cell-cover PIP over the diamond AOI -> raster tiles -> aggregate.
Prints one JSON line with rows and wall seconds.
"""
import json
import sys
import time

from pyspark.sql import SparkSession

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 768

    from oshdb_spark.benchjob import scale_job

    spark = SparkSession.builder.appName("oshdb-scale-job").getOrCreate()
    t0 = time.perf_counter()
    rows = scale_job(spark, sf_dir, replicas=replicas)
    secs = round(time.perf_counter() - t0, 3)
    print(json.dumps({"rows": rows, "sec": secs, "replicas": replicas}))
    spark.stop()
