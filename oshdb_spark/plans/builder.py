"""Fluent MapReducer-style query builder — the reference's user-facing
API shape (``OSMEntitySnapshotView.on(db).areaOfInterest(bbox)
.timestamps(...).osmTag("building","yes").aggregateByTimestamp()
.count()``, ``oshdb-api/.../MapReducer.java:141-179`` immutable builder
state) compiled to DataFrame operations.

Design parity notes:

* every chained call returns a **modified copy** (the reference's
  ``@Contract(pure=true)`` clone-and-append contract);
* the "logical plan" is the same state tuple the reference keeps
  (filters conjunction, AOI, timestamp list, mapper chain) — except
  here the terminal reducers hand the whole thing to Catalyst, which
  *does* have an optimizer;
* ``aggregate_by`` / ``aggregate_by_timestamp`` / ``aggregate_by_geometry``
  mirror the MapAggregator wrap (``MapReducer.java:760-927``), with
  zerofill on request (``MapAggregator.java:884-892``).

The builder is deliberately thin: it owns *query assembly*, while all
semantics live in ``operators/`` — so the fluent surface and the raw
DataFrame surface can never drift apart.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oshdb_spark.operators.aggregate import ts_bucket, zerofill
from oshdb_spark.operators.contribution import contributions
from oshdb_spark.operators.snapshot import lit_df, snapshot_timestamps, snapshots
from oshdb_spark.operators.spatial import (
    aggregate_by_rect_regions,
    bbox_filter_col,
    polygon_contains_col,
)


@dataclass(frozen=True)
class _ViewState:
    versions: DataFrame
    tstamps: list[int] = field(default_factory=list)
    bbox: tuple[int, int, int, int] | None = None
    polygon: tuple[list[int], list[int]] | None = None
    predicates: tuple[Column, ...] = ()
    mappers: tuple[Callable[[DataFrame], DataFrame], ...] = ()
    group_keys: tuple[Any, ...] = ()  # Column names / exprs
    regions: dict[str, tuple[int, int, int, int]] | None = None
    zerofill_universes: tuple[DataFrame, ...] = ()
    ts_floor: bool = False
    known_tag_keys: frozenset[int] | None = None
    timeout_s: float | None = None


class _BaseView:
    """Shared immutable-builder plumbing for both views."""

    def __init__(self, state: _ViewState):
        self._s = state

    @classmethod
    def on(cls, versions: DataFrame) -> "_BaseView":
        return cls(_ViewState(versions=versions))

    def _with(self, **kw) -> "_BaseView":
        return type(self)(replace(self._s, **kw))

    # -- filters (MapReducer.java:248-654) --------------------------------

    def area_of_interest(self, *, bbox=None, polygon=None) -> "_BaseView":
        if bbox is not None:
            return self._with(bbox=tuple(bbox))
        if polygon is not None:
            return self._with(polygon=(list(polygon[0]), list(polygon[1])))
        raise ValueError("bbox or polygon required")

    def timestamps(self, ts_list: list[int]) -> "_BaseView":
        return self._with(tstamps=[int(t) for t in ts_list])

    def where(self, predicate: Column) -> "_BaseView":
        """osmEntityFilter / osmTag analogs: arbitrary Column predicate."""
        return self._with(predicates=self._s.predicates + (predicate,))

    def where_tag(self, col: str, value=None) -> "_BaseView":
        """osmTag(key) presence (!=0 / not null) or osmTag(key, value)."""
        c = F.col(col)
        pred = c.isNotNull() & (c != 0) if value is None else (c == value)
        return self.where(pred)

    # -- general tags-map filters (MapReducer.java:422-654) -----------------

    def with_keytable(self, known_keys) -> "_BaseView":
        """Declare the dictionary's known tag-key ids (TagTranslator
        analog). With a keytable set, filters on unknown keys compile to
        ``lit(False)`` — Catalyst folds the whole subtree to an empty
        relation, the reference's scan-skip shortcut
        (MapReducer.java:469-474)."""
        return self._with(known_tag_keys=frozenset(known_keys))

    def _tag_pred(self, key: int, values=None) -> Column:
        s = self._s
        if s.known_tag_keys is not None and key not in s.known_tag_keys:
            return F.lit(False)
        t = F.col("tags")
        if values is None:
            return F.map_contains_key(t, F.lit(key))
        vals = list(values)
        if len(vals) == 1:
            return t.getItem(key) == vals[0]
        return t.getItem(key).isin(vals)

    def where_tag_key(self, key: int) -> "_BaseView":
        """osmTag(key): key presence in the tags map (MapReducer.java:443-474)."""
        return self.where(self._tag_pred(key))

    def where_tag_in(self, key: int, values) -> "_BaseView":
        """osmTag(key, value) / osmTag(key, Collection<values>)
        (MapReducer.java:489-560): tags[key] in the value set (absent
        key -> null -> false, the reference's semantics)."""
        return self.where(self._tag_pred(key, values))

    def where_any_tag(self, items) -> "_BaseView":
        """osmTag(Collection<OSMTagInterface>) OR-list of mixed bare
        keys and (key, value[s]) pairs (MapReducer.java:606-654).
        ``items``: iterable of ``key`` or ``(key, value)`` or
        ``(key, [values])``."""
        pred = F.lit(False)
        for item in items:
            if isinstance(item, tuple):
                k, v = item
                vals = None if v is None else (v if isinstance(v, (list, tuple)) else [v])
                pred = pred | self._tag_pred(k, vals)
            else:
                pred = pred | self._tag_pred(item)
        return self.where(pred)

    def map(self, fn: Callable[[DataFrame], DataFrame]) -> "_BaseView":
        """map/flatMap analog: a DataFrame->DataFrame stage (use
        withColumn/select/explode inside — Column-level, not per-row)."""
        return self._with(mappers=self._s.mappers + (fn,))

    def timeout(self, seconds: float | None) -> "_BaseView":
        """Wall-clock limit on the ACTION terminals (collect/stream) —
        ``OSHDBDatabase.timeout(seconds)`` (``OSHDBDatabase.java:57-96``;
        per-cell poll ``MapReducerJdbc.java:43-49``). Exceeding it
        cancels the query's whole Spark job group and raises
        ``OSHDBTimeoutException``; ``timeout(None)`` is clearTimeout().
        Plan-building terminals that return a DataFrame are lazy and
        unaffected — apply the limit where the jobs actually run."""
        return self._with(timeout_s=None if seconds is None else float(seconds))

    # -- aggregation wrap (MapReducer.java:760-927) ------------------------

    def aggregate_by(self, *cols: str) -> "_BaseView":
        return self._with(group_keys=self._s.group_keys + cols)

    def aggregate_by_geometry(
        self, regions: dict[str, tuple[int, int, int, int]]
    ) -> "_BaseView":
        return self._with(
            regions=dict(regions),
            group_keys=self._s.group_keys + ("region_key",),
        )

    def zerofill_with(self, *universes: DataFrame) -> "_BaseView":
        return self._with(
            zerofill_universes=self._s.zerofill_universes + tuple(universes)
        )

    # -- plan assembly ------------------------------------------------------

    def _spark(self):
        return self._s.versions.sparkSession

    def _apply_common(self, df: DataFrame) -> DataFrame:
        s = self._s
        if s.bbox is not None:
            df = df.filter(bbox_filter_col(s.bbox))
        if s.polygon is not None:
            df = polygon_contains_col(df, s.polygon[0], s.polygon[1]).filter(
                F.col("_in_aoi")
            ).drop("_in_aoi")
        if s.regions is not None:
            df = aggregate_by_rect_regions(df, s.regions)
        for fn in s.mappers:
            df = fn(df)
        return df

    def _finish(self, grouped: DataFrame, value_cols: dict[str, float]) -> DataFrame:
        s = self._s
        if s.zerofill_universes:
            grouped = zerofill(grouped, list(s.zerofill_universes), value_cols)
        return grouped

    # -- terminal reducers (MapReducer.java:1140-1413) ---------------------

    def _grouped(self):
        df = self.dataframe()
        keys = list(self._s.group_keys)
        return df.groupBy(*keys) if keys else df.groupBy()

    def count(self, alias: str = "cnt") -> DataFrame:
        return self._finish(
            self._grouped().agg(F.count(F.lit(1)).alias(alias)), {alias: 0}
        )

    def sum(self, col: str, alias: str = "sum") -> DataFrame:
        return self._finish(self._grouped().agg(F.sum(col).alias(alias)), {alias: 0})

    def average(self, col: str, alias: str = "avg") -> DataFrame:
        return self._grouped().agg(F.avg(col).alias(alias))

    def count_uniq(self, col: str, alias: str = "n_uniq") -> DataFrame:
        return self._finish(
            self._grouped().agg(F.count_distinct(F.col(col)).alias(alias)), {alias: 0}
        )

    def uniq(self, col: str, alias: str = "uniq") -> DataFrame:
        return self._grouped().agg(F.array_sort(F.collect_set(col)).alias(alias))

    def quantile(self, col: str, q: float, alias: str = "q") -> DataFrame:
        return self._grouped().agg(
            F.percentile(F.col(col).cast("double"), F.lit(q)).alias(alias)
        )

    def reduce(self, *aggs: Column) -> DataFrame:
        """Generic reduce: arbitrary aggregate Columns (the
        user-monoid hook, MapReducer.java:976-1077 — Catalyst runs it
        partial+final exactly like the reference's kernel split)."""
        return self._grouped().agg(*aggs)

    def raster_tiles(self, zoom: int) -> DataFrame:
        """Materialize the view as a density raster keyed (zoom, x, y)."""
        from oshdb_spark.operators.tiles import raster_tiles

        return raster_tiles(self.dataframe(), zoom)

    def vector_tiles(self, zoom: int, feature_col: str = "entity_id") -> DataFrame:
        """Materialize the view as vector tiles (sorted feature lists)."""
        from oshdb_spark.operators.tiles import vector_tiles

        return vector_tiles(self.dataframe(), zoom, feature_col)

    def collect(self) -> list:
        df = self.dataframe()
        if self._s.timeout_s is None:
            return df.collect()
        from oshdb_spark.runtime import run_with_timeout

        return run_with_timeout(
            df.sparkSession, self._s.timeout_s, df.collect, desc="collect"
        )

    def stream(self):
        """Lazily iterate rows (stream() analog, MapReducer.java:1465)."""
        df = self.dataframe()
        if self._s.timeout_s is None:
            return df.toLocalIterator()
        from oshdb_spark.runtime import stream_with_timeout

        return stream_with_timeout(df, self._s.timeout_s, desc="stream")


class SnapshotView(_BaseView):
    """OSMEntitySnapshotView analog: as-of state at each timestamp."""

    def aggregate_by_timestamp(self) -> "SnapshotView":
        return self._with(group_keys=self._s.group_keys + ("snap_ts",))

    def dataframe(self) -> DataFrame:
        s = self._s
        if not s.tstamps:
            raise ValueError("timestamps(...) required for a snapshot view")
        t = snapshot_timestamps(self._spark(), s.tstamps)
        pred = None
        for p in s.predicates:
            pred = p if pred is None else (pred & p)
        snap = snapshots(s.versions, t, predicate=pred)
        return self._apply_common(snap)

    def timestamp_universe(self) -> DataFrame:
        return snapshot_timestamps(self._spark(), self._s.tstamps)


class ContributionView(_BaseView):
    """OSMContributionView analog: typed change events."""

    def aggregate_by_timestamp(self) -> "ContributionView":
        """Floor each contribution to the enclosing interval start
        (MapReducer.java:800-850)."""
        return self._with(
            ts_floor=True, group_keys=self._s.group_keys + ("bucket_ts",)
        )

    def dataframe(self) -> DataFrame:
        s = self._s
        pred = None
        for p in s.predicates:
            pred = p if pred is None else (pred & p)
        c = contributions(s.versions, predicate=pred)
        if s.ts_floor:
            if not s.tstamps:
                raise ValueError("timestamps(...) required for interval flooring")
            c = c.withColumn("bucket_ts", ts_bucket(F.col("ts"), s.tstamps)).filter(
                F.col("bucket_ts").isNotNull()
            )
        return self._apply_common(c)

    def timestamp_universe(self) -> DataFrame:
        """Zerofill key universe for the ``bucket_ts`` index: the
        interval STARTS, i.e. the timestamp list WITHOUT its final
        element — the reference's ``getZerofillTimestamps`` drops the
        last timestamp for contribution views
        (``MapReducer.java:1908-1916``) because the study interval is
        half-open and the final boundary closes the last interval
        rather than opening one (same rule as ``ts_bucket``)."""
        return lit_df(
            self._spark(), "bucket_ts", [int(t) for t in self._s.tstamps[:-1]], "long"
        )


def key_universe(spark, name: str, values: list, dtype: str) -> DataFrame:
    """Zerofill key-universe helper (re-export of lit_df)."""
    return lit_df(spark, name, values, dtype)
