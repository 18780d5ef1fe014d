"""Grouped aggregation layer: aggregateBy / aggregateByTimestamp /
zerofill and the reducer set.

Reference semantics being re-expressed (all as plain Catalyst
aggregations, which already run partial-per-partition + final combine —
the reference hand-rolls exactly that split in
``oshdb-api/.../backend/Kernels.java:39-185`` +
``MapReducerJdbcMultithread.java:62-67``):

* ``aggregate_by``            — groupBy on arbitrary computed keys
  (``MapReducer.java:760-782``)
* ``ts_bucket``               — contribution-view timestamp flooring to
  the enclosing interval start (``MapReducer.java:800-850``, floor at
  ``:813``)
* ``zerofill``                — missing group keys filled with the
  reducer identity via a left join against the crossJoin of expected
  key universes (``MapAggregator.java:884-892,971-1001``)
* reducers sum/count/uniq/countUniq/average/weightedAverage — thin
  aliases over built-ins (``MapReducer.java:1140-1258``); quantiles use
  exact ``percentile`` for correctness fixtures and
  ``approx_percentile`` on the scale path (the reference uses a
  t-digest sketch, ``TDigestReducer.java:21-39`` — different sketch,
  same contract, tolerance documented in tests).
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ts_bucket(ts_col: Column, boundaries: list[int]) -> Column:
    """Floor a timestamp to the greatest boundary <= ts (the
    aggregateByTimestamp interval floor, ``MapReducer.java:805-813``).
    The study interval is HALF-OPEN ``[first, last)``
    (``OSHDBTimestampInterval.includes``, ``OSHDBTimestampInterval.java:
    30-33``): the final boundary CLOSES the last interval rather than
    opening one, so values at/after it map to null — same as values
    before the first boundary (the reference filters contributions to
    the interval before flooring, so its floor never lands on the last
    boundary; callers here filter the nulls)."""
    expr = F.lit(None).cast("long")
    for b in boundaries[:-1]:  # ascending; later whens win via reversed fold
        expr = F.when(ts_col >= F.lit(b), F.lit(b)).otherwise(expr)
    if boundaries:
        expr = F.when(ts_col >= F.lit(boundaries[-1]), F.lit(None).cast("long")).otherwise(expr)
    return expr


def zerofill(
    grouped: DataFrame,
    universes: list[DataFrame],
    value_cols: dict[str, float],
) -> DataFrame:
    """Right-outer-join ``grouped`` against the cross product of
    key-universe DataFrames (universe rows preserved), coalescing each
    value column to its identity.

    Scale shape: NO broadcast hint on purpose. Spark can only build the
    non-preserved side of an outer join, which here is the unbounded
    ``grouped`` — a forced broadcast would either be silently dropped
    (verified: the hint on the preserved side plans as SortMergeJoin
    anyway) or, worse, broadcast the growing side. Unhinted, the join
    shuffles on the very keys ``grouped`` was just aggregated on, so
    its exchange is reused and only the tiny universe actually moves;
    AQE remains free to broadcast ``grouped`` when it measures small."""
    universe = _reduce(lambda a, b: a.crossJoin(b), universes)
    keys = [c for u in universes for c in u.columns]
    out = grouped.join(universe, on=keys, how="right")
    for col, identity in value_cols.items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(identity)))
    return out


def weighted_average(value: Column, weight: Column) -> Column:
    """sum(v*w)/sum(w) — the WeightedValue monoid (``MapReducer.java:1250-1258``)."""
    return F.sum(value * weight) / F.sum(weight)
