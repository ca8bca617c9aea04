"""Source↔sink reconciliation: keyed table diff and parity summary.

The question every CDC deployment eventually has to answer is "does the
lake still equal the source?" — after a backfill, a failover, a
suspected missed batch, or just on a nightly audit schedule. The naive
answer (collect both tables and compare) is impossible at 10^10 rows;
the standard production pattern (what Datafold/data-diff style tooling
does) is a keyed digest comparison:

- each side is reduced MAP-SIDE to ``(key, digest(compared columns))``
  — fixed-width rows, computed before any Exchange, so the row payloads
  (here: file contents) never shuffle no matter how wide the table;
- one full-outer join on the key yields the three defect classes:
  ``only_left`` (sink lost a row / source gained one), ``only_right``
  (sink has a row the source deleted), ``mismatch`` (both have the key
  but the compared columns differ).

The digest is ``sha2(to_json(struct(compare_cols)))``: JVM-side,
whole-stage-codegen friendly, and canonical for nulls and types (a null
column and the string 'null' hash differently; 1 and '1' hash
differently). Both sides are digested by the same engine with the same
expression, so within a diff the digest equality test is exactly
column-tuple equality (modulo SHA-256 collisions).

Contract: ``key_cols`` identify rows uniquely on each side (the CDC
lake's primary key). A duplicated key would make the full-outer join
multiply rows — ``table_diff(..., check_unique=True)`` adds a
per-side uniqueness assertion that fails loudly instead. Keys must
also be non-null: SQL join equality never matches null keys, so a
null-keyed row on each side would read as only_left + only_right
rather than one comparison (primary keys are non-null by definition;
this is a reading aid, not a handled case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def row_digest(compare_cols: list[str]) -> Column:
    """Canonical per-row digest of the compared columns (see module
    docstring for why to_json over concat_ws). Packed to 32-byte
    BINARY (``unhex``): the digest column dominates the diff's shuffle
    row — hex doubles it for no information."""
    return F.unhex(
        F.sha2(F.to_json(F.struct(*[F.col(c) for c in compare_cols])), 256)
    )


def _digested(df: DataFrame, key_cols: list[str], compare_cols: list[str], name: str) -> DataFrame:
    return df.select(*key_cols, row_digest(compare_cols).alias(name))


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    kind_col: str = "diff_kind",
    check_unique: bool = False,
) -> DataFrame:
    """Rows where ``left`` and ``right`` disagree: the key columns plus
    ``kind_col`` in ('only_left', 'only_right', 'mismatch'). Equal rows
    are absent — at scale the diff is tiny while the inputs are not.

    One fixed-width shuffle per side (key + 32-byte binary digest);
    payload columns are consumed map-side by the digest projection and
    never enter the join.
    """
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")
    overlap = set(key_cols) & set(compare_cols)
    if overlap:
        raise ValueError(f"key columns also listed in compare_cols: {sorted(overlap)}")
    l = _digested(left, key_cols, compare_cols, "_digest_l")
    r = _digested(right, key_cols, compare_cols, "_digest_r")
    if check_unique:
        # loud failure beats a silently multiplied join: assert_true
        # rides a 1-row aggregate per side
        for side, nm in ((l, "left"), (r, "right")):
            dup = side.groupBy(*key_cols).count().where(F.col("count") > 1)
            if dup.limit(1).count():
                raise ValueError(f"table_diff: duplicate keys on the {nm} side")
    j = l.join(r, key_cols, "full_outer")
    kind = (
        F.when(F.col("_digest_l").isNull(), F.lit("only_right"))
        .when(F.col("_digest_r").isNull(), F.lit("only_left"))
        .when(F.col("_digest_l") != F.col("_digest_r"), F.lit("mismatch"))
    )
    return (
        j.withColumn(kind_col, kind)
        .where(F.col(kind_col).isNotNull())
        .select(*key_cols, kind_col)
    )


def reconcile_summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """One row: (equal, mismatch, only_left, only_right) counts — the
    nightly-audit scalar. Same single fixed-width join as table_diff,
    with the equal class kept and aggregated instead of filtered."""
    l = _digested(left, key_cols, compare_cols, "_digest_l")
    r = _digested(right, key_cols, compare_cols, "_digest_r")
    j = l.join(r, key_cols, "full_outer")
    cls = (
        F.when(F.col("_digest_l").isNull(), F.lit("only_right"))
        .when(F.col("_digest_r").isNull(), F.lit("only_left"))
        .when(F.col("_digest_l") != F.col("_digest_r"), F.lit("mismatch"))
        .otherwise(F.lit("equal"))
    )
    agg = [
        F.sum(F.when(cls == k, 1).otherwise(0)).cast("long").alias(k)
        for k in ("equal", "mismatch", "only_left", "only_right")
    ]
    return j.agg(*agg)


def repair_events(
    source: DataFrame,
    sink: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    op_col: str = "op",
    upsert_op: str = "u",
    delete_op: str = "d",
) -> DataFrame:
    """Corrective CDC events that make ``sink`` equal ``source`` (on
    ``compare_cols``): the day-2 closing of the audit loop — diff,
    repair, re-audit clean.

    * ``only_left`` (sink lost the row) and ``mismatch`` (columns
      drifted) become UPSERTS carrying the source payload;
    * ``only_right`` (sink has a row the source doesn't) becomes a
      DELETE with null payload.

    Applying the returned frame to the sink with the engine's keyed
    LWW merge (each key appears at most once — the diff is keyed)
    yields digest parity; ``reconcile_summary`` after the repair reads
    all-equal (property-tested). The engine merge recognizes only
    ``op == 'D'`` as a delete — pass ``upsert_op="U", delete_op="D"``
    when feeding ``apply_batch``; the lowercase defaults suit
    Debezium-style consumers and the DuckDB oracle.

    Scale shape: the diff is the fixed-width join of ``table_diff``,
    computed ONCE — a single left join against the source then attaches
    payloads to the upsert classes (``only_right`` keys are absent from
    the source by definition, so the outer join yields their null
    payload for free). The former two-branch union referenced the diff
    twice, and Catalyst duplicated the whole full-outer subtree per
    branch — two extra Exchanges and a second full diff per run. At a
    healthy steady state the repair set is tiny relative to the table
    and AQE turns the payload join into a broadcast on its own (no
    forced hint here: after a catastrophic divergence the repair set is
    the table, and a forced broadcast would be the bug, not the fix).
    """
    d = table_diff(source, sink, key_cols, compare_cols)
    src = source.select(*key_cols, *compare_cols)
    is_del = F.col("diff_kind") == "only_right"
    return d.join(src, key_cols, "left").select(
        *key_cols,
        *compare_cols,
        F.when(is_del, F.lit(delete_op)).otherwise(F.lit(upsert_op)).alias(op_col),
    )
