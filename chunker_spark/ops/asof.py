"""As-of (nearest-earlier) join — the time-series primitive Spark lacks.

``asof_join(left, right)`` matches every left row to the LATEST right
row of the same key whose timestamp is <= the left row's (backward
as-of, inclusive), the join under every "state as of this moment"
question: event ↔ most recent prior snapshot, trade ↔ last quote,
purchase ↔ last click.

Spark-first plan — union + last-observation-carried-forward, NOT a
range join: the naive formulation (`l.ts >= r.ts` + per-key max) is a
non-equi join Catalyst can only execute as a broadcast nested loop or
cartesian-per-key — O(|L|·|R|) pair evaluations per key, a scale
killer. Instead both sides are unioned with a side tag and processed by
ONE window over (key) ordered by (ts, tag): ``last(right_payload,
ignorenulls=True)`` carries the most recent right row forward onto each
left row. Cost: one shuffle of |L|+|R| rows and one sort — the same
shape as any windowed aggregate, linear in the data, no pair blowup.
Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), which
is what makes the match inclusive, and DuckDB's ``ASOF JOIN``
(l.ts >= r.ts) is the value oracle for the whole construction.

``tolerance_s`` bounds staleness: matches older than the tolerance are
nulled out (pandas ``merge_asof(tolerance=...)`` parity).

``direction`` selects which neighbour matches (pandas parity):
``backward`` (default — latest right at-or-before), ``forward``
(earliest right at-or-after; the same window read in reverse time
order), ``nearest`` (whichever of the two is closer, ties to
backward). ``nearest`` computes both carried columns over the SAME
hash partitioning — one Exchange, two in-partition sorts — then picks
per row; tolerance is applied to each candidate before the pick, as
pandas does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    suffix: str = "_r",
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: per key, the nearest right row at-or-before
    (``direction='backward'``), at-or-after (``'forward'``), or on
    either side (``'nearest'``, ties to backward) of each left row.

    Returns every left column, plus each of ``right_cols`` (default:
    all non-key right columns) as ``<col><suffix>``, plus
    ``<right_ts><suffix>`` (the matched row's timestamp; null when no
    match). ``how='left'`` keeps unmatched left rows with nulls;
    ``how='inner'`` drops them (DuckDB ``ASOF JOIN`` default).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward'|'forward'|'nearest', got {direction!r}"
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    if right_ts not in right_cols:
        right_cols = [right_ts, *right_cols]
    # name-collision validation (ADVICE r3): the union construction
    # reserves _asof_* working columns, and each right column lands as
    # <col><suffix> next to the left columns — silent collisions would
    # surface much later as ambiguous-reference errors (or worse, a
    # wrong column silently read). Fail here with the offending names.
    reserved = {
        "_asof_ts", "_asof_tag", "_asof_payload", "_asof_match",
        "_asof_match_b", "_asof_match_f",
    }
    bad = reserved & set(left.columns)
    if bad:
        raise ValueError(f"asof_join: left columns {sorted(bad)} collide with reserved _asof_* names")
    out_names = [f"{c}{suffix}" for c in right_cols]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: output column(s) {sorted(clash)} already exist on the left "
            f"side — pass a different suffix (suffix={suffix!r}) or prune right_cols"
        )
    if len(set(out_names)) != len(out_names):
        raise ValueError(f"asof_join: duplicate output names in right_cols with suffix={suffix!r}")

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload")
    r = right.select(
        *keys, F.col(right_ts).alias("_asof_ts"), F.lit(0).alias("_asof_tag"), payload
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_tag"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    # align schemas: right side carries left's columns as nulls so the
    # union is by-name; left columns other than the keys are never read
    # from right rows
    for c in left.columns:
        if c not in keys and c not in ("_asof_ts", "_asof_tag", "_asof_payload"):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))

    # both windows hash-partition on the SAME keys — 'nearest' pays one
    # Exchange and two in-partition sorts, never a second shuffle. At
    # equal timestamps right rows (tag 0) sort before left rows under
    # BOTH orderings, which is what makes each direction inclusive.
    last_carried = F.last("_asof_payload", ignorenulls=True)
    frame = (Window.unboundedPreceding, Window.currentRow)
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_tag").asc())
        .rowsBetween(*frame)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts").desc(), F.col("_asof_tag").asc())
        .rowsBetween(*frame)
    )
    carried = u
    if direction in ("backward", "nearest"):
        carried = carried.withColumn("_asof_match_b", last_carried.over(wb))
    if direction in ("forward", "nearest"):
        carried = carried.withColumn("_asof_match_f", last_carried.over(wf))
    out = carried.where(F.col("_asof_tag") == 1)

    # via TIMESTAMP: a TIMESTAMP_NTZ column casts to timestamp but
    # not directly to double under ANSI; the difference is
    # timezone-invariant either way
    as_s = lambda c: c.cast("timestamp").cast("double")
    lts = as_s(F.col("_asof_ts"))

    def gated(match, dist):
        # tolerance applies per candidate BEFORE the nearest pick
        # (pandas semantics: a too-far backward match must not shadow a
        # within-tolerance forward one)
        if tolerance_s is None:
            return match
        return F.when(match.isNotNull() & (dist <= float(tolerance_s)), match)

    if direction == "backward":
        m = F.col("_asof_match_b")
        match = gated(m, lts - as_s(m[right_ts]))
    elif direction == "forward":
        m = F.col("_asof_match_f")
        match = gated(m, as_s(m[right_ts]) - lts)
    else:
        b = gated(F.col("_asof_match_b"), lts - as_s(F.col("_asof_match_b")[right_ts]))
        f = gated(F.col("_asof_match_f"), as_s(F.col("_asof_match_f")[right_ts]) - lts)
        db, df = lts - as_s(b[right_ts]), as_s(f[right_ts]) - lts
        match = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(df < db, f)  # strict: equal distances tie to backward
            .otherwise(b)
        )
    out = out.withColumn("_asof_match", match)
    if how == "inner":
        out = out.where(F.col("_asof_match").isNotNull())
    proj = [*left.columns]
    proj += [F.col("_asof_match")[c].alias(f"{c}{suffix}") for c in right_cols]
    return out.select(*proj)
