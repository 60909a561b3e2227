"""Streaming deduplication — the training-pipeline dedup operators over
Structured Streaming micro-batches.

Two shapes, cheapest first:

- ``dedup_stream``: exact first-seen-wins dedup via Spark's native
  state-store ``dropDuplicates`` on the content digest — the Spark-first
  answer (the state store partitions by the digest across executors; an
  optional event-time watermark bounds state for unbounded streams).
- ``dedup_stream_stateful``: the custom-stateful-operator seam
  (``applyInPandasWithState``): per digest keeps (first id, seen count)
  and emits an UPDATED row every time a duplicate group changes — the
  running dup-frequency signal a crawl pipeline uses to spot boilerplate
  while ingesting, which plain dropDuplicates cannot express.

Scale notes: state is keyed by a 128-bit digest — uniform, no skew; the
stateful path's state value is 16 bytes per distinct doc. At 100 TB the
watermark (or a TTL policy on the state store) is mandatory; both knobs
are surfaced, not hidden.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["dedup_stream", "dedup_stream_stateful"]


def dedup_stream(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    watermark: Tuple[str, str] | None = None,
) -> DataFrame:
    """First-seen-wins exact dedup on a stream: rows whose content digest
    was already seen (in any earlier micro-batch — state-store backed)
    are dropped. ``watermark=(event_time_col, delay)`` bounds state."""
    hashed = stream_df.withColumn("text_md5", F.md5(F.col(text_col)))
    if watermark is not None:
        hashed = hashed.withWatermark(*watermark)
        return hashed.dropDuplicates(["text_md5", watermark[0]])
    return hashed.dropDuplicates(["text_md5"])


_OUT_SCHEMA = "text_md5 string, first_doc_id long, n_seen long"
_STATE_SCHEMA = "first_doc_id long, n_seen long"


def _track_dups(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    first_id, n_seen = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ids = pdf["doc_id"]
        batch_min = int(ids.min())
        first_id = batch_min if first_id is None else min(first_id, batch_min)
        n_seen += len(pdf)
    state.update((int(first_id), int(n_seen)))
    yield pd.DataFrame(
        {"text_md5": [key[0]], "first_doc_id": [first_id], "n_seen": [n_seen]}
    )


def dedup_stream_stateful(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Running duplicate-group tracker: one UPDATE row per digest per
    micro-batch it appears in — (text_md5, first_doc_id, n_seen) with
    n_seen accumulating across batches through the state store."""
    hashed = stream_df.select(
        F.md5(F.col(text_col)).alias("text_md5"),
        F.col(id_col).alias("doc_id"),
    )
    return hashed.groupBy("text_md5").applyInPandasWithState(
        _track_dups,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
