"""Sessionization: gap-based session assignment over an event stream.

The classic training-data / clickstream primitive the reference's event
model implies but never names: partition each key's events into
sessions separated by more than ``gap_s`` seconds of silence.

Scale notes (100 TB): one shuffle total — the window partitionBy on the
key column — and everything after it (lag, flag, running sum) reuses
that single partitioning, so Catalyst plans exactly one Exchange. Skewed
keys (one user with millions of events) serialize within the window
sort; for bot-scale keys, pre-split by day before sessionizing. No UDFs:
the whole plan is JVM-side whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    session_col: str = "session_seq",
) -> DataFrame:
    """Add a per-key session sequence number (0-based, ordered by time).

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_s`` seconds. Ties on ``ts_col`` are broken by the
    column itself only — callers needing total determinism across equal
    timestamps should pass a composite ordering column.
    """
    w_order = Window.partitionBy(key_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w_order)
    # exact microsecond interval arithmetic (no unix_timestamp
    # second-truncation): a gap of exactly gap_s stays in-session
    boundary = F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {int(gap_s)} SECONDS")
    is_new = F.when(prev_ts.isNull() | boundary, 1).otherwise(0)
    running = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(running) - F.lit(1))


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: start/end, event count, optional value sum.

    One shuffle (the sessionize window); the groupBy reuses the same
    (key) hash partitioning via AQE since session_seq is a narrow
    refinement of the key.
    """
    s = sessionize(df, key_col=key_col, ts_col=ts_col, gap_s=gap_s)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("decimal(20,4)")).cast("double"), 2).alias(
                "sum_value"
            )
        )
    return s.groupBy(key_col, "session_seq").agg(*aggs)
