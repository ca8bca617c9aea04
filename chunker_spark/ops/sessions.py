"""Sessionization: gap-based session assignment over an event stream.

The classic training-data / clickstream primitive the reference's event
model implies but never names: partition each key's events into
sessions separated by more than ``gap_s`` seconds of silence.

Scale notes (100 TB): one shuffle total — the window partitionBy on the
key column — and everything after it (lag, flag, running sum) reuses
that single partitioning, so Catalyst plans exactly one Exchange. Skewed
keys (one user with millions of events) serialize within the window
sort; ``sessionize(split_interval_s=86400)`` is the opt-in mitigation —
it partitions the heavy window on (key, coarse time bucket) and
renumbers via an O(buckets)-per-key prefix sum. No UDFs: the whole plan
is JVM-side whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 1800,
    session_col: str = "session_seq",
    split_interval_s: int | None = None,
    warn_skew_above: int | None = None,
) -> DataFrame:
    """Add a per-key session sequence number (0-based, ordered by time).

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_s`` seconds. Ties on ``ts_col`` are broken by the
    column itself only — callers needing total determinism across equal
    timestamps should pass a composite ordering column.

    ``split_interval_s`` is the bot-scale-skew knob: a single key with
    millions of events serializes inside the default per-key window
    sort. With it set, the heavy window partitions on
    (key, floor(ts / split_interval_s)) — a coarse time bucket — so one
    hot key spreads across many tasks; per-bucket session counts (one
    tiny row per (key, bucket)) are then prefix-summed per key and
    joined back to renumber sessions globally. CONTRACT: results are
    identical to the unsplit path iff no session spans a bucket
    boundary, i.e. every same-key event pair straddling a boundary is
    more than ``gap_s`` apart (pick split_interval_s >> typical session
    span, e.g. 1 day vs a 30-minute gap; a boundary-straddling session
    is counted once per bucket it touches). Null handling matches the
    unsplit path: null-ts and null-key rows are kept (null-safe joins),
    sorting first within their key exactly as the window's null-first
    order does.

    ``warn_skew_above`` (opt-in; costs one count aggregate at call
    time) logs a warning naming the hottest keys whose event counts
    exceed the threshold while ``split_interval_s`` is unset — the
    observability hook for discovering bot-scale keys BEFORE one
    serialized window sort becomes the straggler. Default None: no
    extra action, plan unchanged.
    """
    if warn_skew_above is not None and split_interval_s is None:
        import logging

        hot = (
            df.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > int(warn_skew_above))
            .orderBy(F.desc("_n"))
            .limit(5)
            .collect()
        )
        if hot:
            logging.getLogger(__name__).warning(
                "sessionize: %d key(s) exceed %d events (top: %s) and "
                "split_interval_s is unset — their window sorts serialize in "
                "one task each; consider split_interval_s >> gap_s",
                len(hot), warn_skew_above,
                [(r[key_col], r["_n"]) for r in hot],
            )
    if split_interval_s is None:
        w_order = Window.partitionBy(key_col).orderBy(ts_col)
        prev_ts = F.lag(ts_col).over(w_order)
        # exact microsecond interval arithmetic (no unix_timestamp
        # second-truncation): a gap of exactly gap_s stays in-session
        boundary = F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap_s} SECONDS")
        is_new = F.when(prev_ts.isNull() | boundary, 1).otherwise(0)
        running = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(session_col, F.sum(is_new).over(running) - F.lit(1))

    if split_interval_s <= 0:
        raise ValueError(f"split_interval_s must be positive, got {split_interval_s}")
    bkt = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(int(split_interval_s) * 1_000_000))
    split = df.withColumn("_bkt", bkt)
    w_local = Window.partitionBy(key_col, "_bkt").orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w_local)
    boundary = F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap_s} SECONDS")
    is_new = F.when(prev_ts.isNull() | boundary, 1).otherwise(0)
    running_local = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = split.withColumn("_local_seq", F.sum(is_new).over(running_local) - F.lit(1))
    # per-(key,bucket) session counts are tiny (one row per pair); the
    # prefix sum over buckets is the only per-key-serial step left and
    # is O(buckets), not O(events)
    counts = local.groupBy(key_col, "_bkt").agg(
        (F.max("_local_seq") + 1).alias("_n_sessions")
    )
    w_bkts = Window.partitionBy(key_col).orderBy("_bkt")
    offsets = counts.withColumn(
        "_offset", F.sum("_n_sessions").over(w_bkts) - F.col("_n_sessions")
    ).select(F.col(key_col).alias("_off_key"), F.col("_bkt").alias("_off_bkt"), "_offset")
    # NULL-SAFE join (ADVICE r3): a null ts yields a null _bkt (and the
    # key itself may be null) — a plain equi-join would silently drop
    # those rows, while the unsplit path keeps them (window partitioning
    # groups nulls; null ts sorts first, lag null starts a session).
    # eqNullSafe restores parity: the null bucket sorts FIRST in the
    # offsets window, matching the unsplit path's null-first order.
    return (
        local.join(
            offsets,
            F.col(key_col).eqNullSafe(F.col("_off_key"))
            & F.col("_bkt").eqNullSafe(F.col("_off_bkt")),
        )
        .withColumn(session_col, (F.col("_offset") + F.col("_local_seq")).cast("long"))
        .drop("_bkt", "_local_seq", "_offset", "_off_key", "_off_bkt")
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 1800,
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
