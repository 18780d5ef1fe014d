"""Structured Streaming deduplication: keep-first exact dedup over an
unbounded document stream.

The batch primitive (``operators/dedup.exact_dup_groups``) re-groups
all history per run; at ingestion scale the natural form is
incremental: each arriving document is checked against per-fingerprint
state and emitted tagged keep/duplicate — the streaming half of a
training-data pipeline's dedup stage.

* fingerprinting stays a JVM Column expression on the stream
  (``text.fingerprint_col`` — normalization + md5, no Python);
* ``stream_dedup`` — ``applyInPandasWithState`` keyed by fingerprint;
  state is (keeper_doc_id, dup_count): one tiny row per distinct
  fingerprint, the same state a log-structured dedup service keeps.
  Within a micro-batch arrival order is normalized to doc_id order so
  re-runs are deterministic; across batches the source's append order
  decides the keeper (keep-FIRST semantics).

State is bounded by the distinct-fingerprint count; high-churn
deployments evict via processing-time timeout (timeoutConf hook).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from oshdb_spark.operators.text import fingerprint_col

STATE_SCHEMA = "keeper string, dups long"
OUTPUT_SCHEMA = (
    "doc_id string, fingerprint string, keeper_doc_id string, is_dup boolean"
)


def _update_fingerprint(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    keeper, dups = (state.get if state.exists else (None, 0))
    # the group arrives as an ITERATOR of Arrow chunks: normalize order
    # over the WHOLE micro-batch group (a hot fingerprint can span
    # chunks; per-chunk sorting would pick the keeper from the first
    # chunk only, and chunk boundaries vary across runs)
    whole = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    out = []
    for row in whole.itertuples(index=False):
        if keeper is None:
            keeper = str(row.doc_id)
            out.append((row.doc_id, key[0], keeper, False))
        else:
            dups = int(dups) + 1
            out.append((row.doc_id, key[0], keeper, True))
    state.update((keeper, int(dups)))
    if out:
        yield pd.DataFrame(
            out, columns=["doc_id", "fingerprint", "keeper_doc_id", "is_dup"]
        )


def stream_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Tag every streamed doc keep/duplicate against per-fingerprint
    state. ``docs`` is a streaming frame with (doc_id, text...)."""
    with_fp = docs.withColumn("fingerprint", fingerprint_col(F.col(text_col)))
    return with_fp.select("doc_id", "fingerprint").groupBy(
        "fingerprint"
    ).applyInPandasWithState(
        _update_fingerprint,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
