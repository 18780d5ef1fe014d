"""spark-submit entrypoint: flagship snapshot query.

Usage: spark-submit --py-files oshdb_spark.zip jobs/run_snapshot.py [sf_dir]
"""
import sys

from pyspark.sql import SparkSession

from oshdb_spark.queries import q_snapshot_count_by_ts

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("oshdb-snapshot").getOrCreate()
    for row in q_snapshot_count_by_ts(spark, sf_dir).collect():
        print(f"snap_ts={row['snap_ts']} cnt={row['cnt']}")
    spark.stop()
