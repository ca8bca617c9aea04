"""Range (interval) join — point-in-interval matching at scale.

``range_join(points, intervals)`` matches each point row to every
interval row of the same key whose ``[lo, hi)`` contains the point's
value — the lookup behind banding (score → tier), time-slice joins, and
IP/numeric dimension tables.

Spark-first plan: Catalyst executes a raw ``p.v >= i.lo AND p.v < i.hi``
join as BroadcastNestedLoopJoin (or a cartesian per key) — O(|P|·|I|)
predicate evaluations, the classic interval-join scale trap. This
operator BUCKETIZES instead: every interval explodes to the integer
buckets of width ``bucket_width`` it overlaps, points map to one bucket
each, and the match becomes an EQUI-join on (key?, bucket) followed by
the exact range filter. Cost: |I|·(avg interval width / bucket_width)
index rows, one hash join, no pair blowup — the standard binning scheme
(cf. interval trees flattened for a distributed hash join). Pick
``bucket_width`` near the typical interval width: too small multiplies
index rows, too large multiplies false candidates; both stay correct up
to the in-plan guard — an interval spanning more than
``MAX_BUCKETS_PER_INTERVAL`` buckets fails fast with a message naming
the knob (ADVICE r3: sequence() would otherwise die opaquely mid-job).

Intervals are half-open ``[lo, hi)`` so adjacent bands never
double-match a boundary point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: hard cap on buckets per exploded interval: beyond this the index-row
#: blowup is a misconfiguration (bucket_width orders of magnitude below
#: the widest interval), and far beyond it Spark's sequence() own array
#: limit kills the job with an opaque error mid-stage. Checked IN-PLAN
#: (assert_true fused into the sequence bound, so Catalyst cannot prune
#: it) to fail fast with an actionable message naming the knob.
MAX_BUCKETS_PER_INTERVAL = 10_000


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    on: str | list[str] | None = None,
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Match points to enclosing ``[lo, hi)`` intervals via bucketed
    equi-join.

    ``on``: optional extra equality key(s) shared by both sides (the
    per-key variant); None joins on buckets alone. ``how='left'`` keeps
    unmatched points with null interval columns (note: 'left' treats
    fully-identical point ROWS as one identity — exact duplicate rows
    that match are not re-emitted as unmatched; carry a distinct row id
    column if byte-identical duplicates must be tracked separately).
    Returns all point columns plus all interval columns (minus the join
    keys).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    w = float(bucket_width)
    # interval -> every bucket it overlaps: floor(lo/w) .. floor(hi/w).
    # The top bucket is intentionally NOT trimmed when hi sits exactly
    # on a bucket edge (where the half-open interval contributes
    # nothing): any epsilon-based trim can under-shoot when float noise
    # puts hi a hair above the edge and silently DROP a true match,
    # while the untrimmed bucket only adds a false candidate that the
    # exact range filter below removes. Correctness over one index row.
    lo_b = F.floor(F.col(lo_col) / w).cast("long")
    hi_b = F.floor(F.col(hi_col) / w).cast("long")
    # per-interval bucket-count guard (ADVICE r3): a single interval
    # spanning more than MAX_BUCKETS_PER_INTERVAL buckets means
    # bucket_width is catastrophically small for this data — fail with
    # the fix in the message rather than exploding 10^6 index rows per
    # interval (or hitting sequence()'s own opaque array limit). The
    # assert rides the sequence's lower bound so it cannot be pruned.
    n_b = F.greatest(hi_b, lo_b) - lo_b + F.lit(1)
    guard = F.assert_true(
        n_b <= F.lit(MAX_BUCKETS_PER_INTERVAL),
        F.concat(
            F.lit("range_join: an interval spans "),
            n_b.cast("string"),
            F.lit(f" buckets (> {MAX_BUCKETS_PER_INTERVAL}); increase bucket_width "),
            F.lit(f"(currently {w!r}) toward the typical interval width"),
        ),
    )
    lo_checked = lo_b + F.coalesce(guard.cast("long"), F.lit(0))
    idx = intervals.withColumn(
        "_rj_bucket", F.explode(F.sequence(lo_checked, F.greatest(hi_b, lo_b)))
    )
    pts = points.withColumn("_rj_bucket", F.floor(F.col(value_col) / w).cast("long"))

    join_keys = [*keys, "_rj_bucket"]
    exact = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    if how == "inner":
        out = pts.join(idx, join_keys, "inner").where(exact)
        return out.drop("_rj_bucket")
    # left: inner-match first, then union the unmatched points back with
    # null interval columns (an outer join + post-filter would also drop
    # bucket-matched-but-range-missed rows incorrectly)
    matched = pts.join(idx, join_keys, "inner").where(exact).drop("_rj_bucket")
    ivl_cols = [c for c in intervals.columns if c not in keys]
    hit_keys = matched.select(*points.columns).distinct()
    # NULL-SAFE anti-join: a matched point row carrying a NULL in any
    # column would survive a plain anti-join (NULL = NULL is NULL, not
    # true) and be re-emitted as unmatched — duplicating it
    anti_cond = None
    for c in points.columns:
        eq = points[c].eqNullSafe(hit_keys[c])
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    missed = points.join(hit_keys, anti_cond, "left_anti").select(
        *points.columns,
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in ivl_cols],
    )
    return matched.unionByName(missed)
