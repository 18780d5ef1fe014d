"""The full query catalog vs its DuckDB oracles at sf0.001 — the same
comparison the round driver applies at sf0.01 (row count, column set,
order-insensitive values). Keeps `pytest -x -q` itself the correctness
gate per BASELINE.md."""

from __future__ import annotations

import pytest

from driver_mimic import compare, duck_con
from oshdb_spark.queries import ORACLES, QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_catalog_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    verdict = compare(name, sdf, ddf)
    assert verdict == "OK", verdict


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # runs and has a stable schema
    assert df.columns


def test_approx_quantiles_within_tolerance_of_exact(spark, sf_dir):
    """Sketch contract (estimatedQuantile analog): the approx values
    must sit within a small rank tolerance of the exact percentiles."""
    from pyspark.sql import functions as F

    from oshdb_spark.operators.snapshot import snapshot_timestamps, snapshots
    from oshdb_spark.queries import q_approx_quantiles
    from oshdb_spark.sources.versions import SNAPSHOT_TS, load_versions

    approx = {r["snap_ts"]: r for r in q_approx_quantiles(spark, sf_dir).collect()}
    snap = snapshots(
        load_versions(spark, sf_dir), snapshot_timestamps(spark, SNAPSHOT_TS)
    )
    val = F.col("lon_e7").cast("double")
    exact = {
        r["snap_ts"]: r
        for r in snap.groupBy("snap_ts")
        .agg(
            F.percentile(val, F.lit(0.25)).alias("p25"),
            F.percentile(val, F.lit(0.5)).alias("p50"),
            F.percentile(val, F.lit(0.75)).alias("p75"),
        )
        .collect()
    }
    span = 3_600_000_000.0
    for ts, e in exact.items():
        a = approx[ts]
        for q in ("p25", "p50", "p75"):
            assert abs(a[q] - e[q]) <= 0.02 * span, (ts, q, a[q], e[q])
