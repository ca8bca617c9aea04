"""Time-series resampling: irregular observations -> a regular grid.

The gap in the time-series family (asof/range/sessions/windows cover
lookup, banding and bucketing — nothing REGULARIZES): sensor readings,
metric scrapes and price ticks arrive at irregular timestamps, while
joins against other series, sliding-window models and training-data
featurization all want one row per key per fixed step. ``resample``
emits, per key, every step-aligned instant between that key's first
and last observation, each carrying the value

- ``locf``   — last observation carried forward (step function), and
- ``linear`` — linear interpolation between the bracketing
  observations (exact at observation instants).

Spark-first plan (one shuffle, no pair blowup — the same union +
carried-window construction as ``ops/asof.py``, which see for why a
range-predicate formulation is a scale killer):

1. per-key bounds: one partial-aggregating groupBy producing a single
   fixed-width row per key;
2. the grid: ``explode(sequence(ceil(min/step), floor(max/step)))`` —
   map-side, never shuffled; grid instants are multiples of ``step``
   so downstream equi-joins between independently-resampled series hit
   exactly. A fused ``assert_true`` bounds points-per-key (default
   2^20) so a mis-sized step fails with a message instead of an opaque
   mid-job sequence() overflow (the ops/ranges.py discipline);
3. grid rows and observation rows are unioned with a side tag and ONE
   hash Exchange on the key orders them by (instant, tag); backward
   and forward bracketing observations are carried onto each grid row
   by two in-partition window passes over that single Exchange
   (observations sort before grid rows at equal instants, making both
   brackets inclusive — an observation exactly on the grid matches
   itself in both directions, so lerp degenerates to the exact value).

Because the grid is clamped INSIDE each key's observed range, both
brackets always exist: no edge-extrapolation policy is needed and the
output carries no nulls. Keys with a single observation (or whose
span contains no step multiple) contribute no grid rows.

Observations must be unique per (key, instant) — pre-deduplicate with
a deterministic rule (e.g. latest event_id wins) or the carried
bracket among equal instants is tie-ambiguous; the query wrapper in
``__spark_entry__`` shows the standard dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

#: sequence() materializes each key's grid as one in-memory array
#: before explode; 2^20 longs (8 MiB) per key is far above any sane
#: step sizing and far below task-OOM territory.
DEFAULT_MAX_POINTS = 1 << 20


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    value_col: str,
    step_us: int,
    max_points: int = DEFAULT_MAX_POINTS,
) -> DataFrame:
    """Regular-grid resample of ``value_col`` (numeric) observed at
    ``ts_us_col`` (integer instants, e.g. unix microseconds).

    Returns (key..., grid_us, value_locf, value_lerp) — one row per
    key per step multiple within [min(ts), max(ts)] of that key.
    """
    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    keys = list(key_cols)
    working = {"_rs_us", "_rs_tag", "_rs_obs"} & set(df.columns)
    if working:
        raise ValueError(f"resample: input columns {sorted(working)} collide with working names")
    out_clash = {"grid_us", "value_locf", "value_lerp"} & set(keys)
    if out_clash:
        raise ValueError(f"resample: key columns {sorted(out_clash)} collide with output names")

    ts = F.col(ts_us_col).cast("long")
    step = F.lit(int(step_us))
    bounds = df.groupBy(*keys).agg(F.min(ts).alias("_mn"), F.max(ts).alias("_mx"))
    # ceil/floor alignment to step multiples; floor-div semantics need
    # care for negative instants: pyspark has no floordiv on columns,
    # so build it from try_divide+floor (exact on longs cast to double
    # up to 2^53 — microsecond epochs through year ~2255)
    fdiv = lambda a, b: F.floor(a.cast("double") / b)
    lo = fdiv(F.col("_mn") + step - 1, step) * step
    hi = fdiv(F.col("_mx"), step) * step
    n_points = (hi - lo) / step + 1
    lo_checked = F.when(
        F.assert_true(
            n_points <= F.lit(int(max_points)),
            F.concat(
                F.lit(f"resample: a key needs more than max_points={max_points} "
                      f"grid points at step_us={step_us}; raise the step or max_points "
                      "(offending key span: "),
                (F.col("_mx") - F.col("_mn")).cast("string"),
                F.lit(" us)"),
            ),
        ).isNull(),
        lo.cast("long"),
    )
    grid = (
        bounds.where(lo <= hi)
        .select(*keys, F.explode(F.sequence(lo_checked, hi.cast("long"), step)).alias("_rs_us"))
        .withColumn("_rs_tag", F.lit(1))
        .withColumn("_rs_obs", F.lit(None).cast("struct<us:long,v:double>"))
    )
    obs = df.select(
        *keys,
        ts.alias("_rs_us"),
        F.lit(0).alias("_rs_tag"),
        F.struct(
            ts.alias("us"), F.col(value_col).cast("double").alias("v")
        ).alias("_rs_obs"),
    )
    u = grid.unionByName(obs)

    carry = F.last("_rs_obs", ignorenulls=True)
    frame = (Window.unboundedPreceding, Window.currentRow)
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_rs_us").asc(), F.col("_rs_tag").asc())
        .rowsBetween(*frame)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_rs_us").desc(), F.col("_rs_tag").asc())
        .rowsBetween(*frame)
    )
    carried = (
        u.withColumn("_b", carry.over(wb))
        .withColumn("_f", carry.over(wf))
        .where(F.col("_rs_tag") == 1)
    )
    b, f, g = F.col("_b"), F.col("_f"), F.col("_rs_us")
    # clamped grid => both brackets exist; the equal-instant case
    # (f.us == b.us: an observation exactly on the grid) short-circuits
    # before the 0/0 division
    lerp = F.when(f["us"] == b["us"], b["v"]).otherwise(
        b["v"]
        + (f["v"] - b["v"]) * ((g - b["us"]).cast("double") / (f["us"] - b["us"]).cast("double"))
    )
    return carried.select(
        *keys,
        g.alias("grid_us"),
        b["v"].alias("value_locf"),
        lerp.alias("value_lerp"),
    )
