"""Custom stateful streaming operator: per-repo running ingest stats.

Demonstrates the engine's escape hatch for per-key running state that
windowed aggregation cannot express (SURVEY.md §2.3): an
``applyInPandasWithState`` operator that maintains, per repository, the
cumulative number of change events, bytes and a high-water ``seq``
across micro-batches, emitting one updated row per repo per trigger.

State is explicit and bounded (one small tuple per repo); the checkpoint
persists it, so the running totals survive restarts exactly like the
source offsets.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("events_total", LongType(), False),
        StructField("bytes_total", LongType(), False),
        StructField("deletes_total", LongType(), False),
        StructField("max_seq", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("events_total", LongType(), False),
        StructField("bytes_total", LongType(), False),
        StructField("deletes_total", LongType(), False),
        StructField("max_seq", LongType(), False),
    ]
)


def _update(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    events = bytes_ = deletes = 0
    max_seq = -1
    if state.exists:
        events, bytes_, deletes, max_seq = state.get
    for pdf in pdfs:
        events += len(pdf)
        bytes_ += int(pdf["content"].fillna("").str.len().sum())
        deletes += int((pdf["op"] == "D").sum())
        max_seq = max(max_seq, int(pdf["seq"].max()))
    state.update((events, bytes_, deletes, max_seq))
    yield pd.DataFrame(
        [
            {
                "repo": key[0],
                "events_total": events,
                "bytes_total": bytes_,
                "deletes_total": deletes,
                "max_seq": max_seq,
            }
        ]
    )


def running_repo_stats(event_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame -> streaming DataFrame of running per-repo
    totals (one row per repo per micro-batch that touched it)."""
    return (
        event_stream.select("repo", "op", "seq", "content")
        .groupBy("repo")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
