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
