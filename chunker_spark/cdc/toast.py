"""Unchanged-TOAST column fill (Debezium/Postgres placeholder
resolution) — one keyed LOCF window, no Python.

The problem (public Debezium docs, "toasted columns"): Postgres stores
large column values out-of-line (TOAST) and does NOT write them to the
WAL when an UPDATE leaves them unchanged — unless REPLICA IDENTITY
FULL is paid for. Debezium therefore emits the literal sentinel
``__debezium_unavailable_value`` (wal2json/pgoutput equivalents do the
same) in the after-image of such updates. Loading those envelopes
as-is corrupts the lake: the sentinel overwrites the real value on
merge. The correct resolution is "unchanged from this key's previous
row version" — a last-observation-carried-forward within the key's
history.

Two correctness traps a naive LOCF gets wrong, both pinned by tests:

* **genuine NULLs carry**: a previous version may have written an
  honest NULL; a later placeholder must resolve to that NULL, not skip
  past it to an older value. The fill therefore carries
  ``struct(value)`` — non-null as a carrier even when the value inside
  is null — under ``last(..., ignorenulls=True)``;
* **deletes fence the history**: after a DELETE + re-INSERT, a
  placeholder refers to the *new* incarnation's previous version;
  values from before the delete are stale and must not leak across.
  Each carried struct is stamped with its row's delete-count segment,
  and a fill is accepted only when the segments match — otherwise the
  placeholder is unresolvable (stream started mid-history, or a
  malformed update follows a delete) and becomes NULL with
  ``toast_unresolved`` counting it, loudly instead of silently.

Scale shape: ONE hash exchange on the key columns and one sort — the
segment counter and every column's carry ride the same window spec, so
Catalyst plans a single Exchange (plan-asserted). Fixed-width
bookkeeping; the value columns shuffle once, which any keyed
resolution of "previous row version" must pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Debezium's sentinel for an unchanged TOAST column (public default)
DEBEZIUM_UNAVAILABLE = "__debezium_unavailable_value"


def fill_unavailable(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "d",
    placeholder: str = DEBEZIUM_UNAVAILABLE,
    keep_marks: bool = False,
) -> DataFrame:
    """Resolve placeholder values in ``value_cols`` from each key's
    previous row version (same delete-fenced incarnation).

    Returns ``changes`` with placeholders replaced — by the carried
    value where one exists in the same segment, by NULL otherwise —
    plus an int ``toast_unresolved`` column counting the per-row
    placeholders that could not be resolved (0 on clean rows). Delete
    rows are never fill *sources* (their after-image is a tombstone,
    not a version) and are passed through unmodified.

    ``delete_op`` names the tombstone op code — ``"d"`` for
    Debezium-style streams, ``"D"`` when the frame is the engine's
    typed event schema (the production wiring in docs/deploy_seams.md).
    A wrong code here silently disables BOTH the delete fence and the
    not-a-source rule, so it is load-bearing, not cosmetic.
    """
    for c in (*key_cols, seq_col, op_col, *value_cols):
        if c not in changes.columns:
            raise ValueError(f"changes is missing column {c!r}")
    non_string = [
        f.name
        for f in changes.schema.fields
        if f.name in value_cols and f.dataType.simpleString() != "string"
    ]
    if non_string:
        raise ValueError(
            f"value_cols must be string-typed (the placeholder is a string "
            f"sentinel); got non-string columns {non_string}"
        )

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = F.sum(F.when(F.col(op_col) == delete_op, 1).otherwise(0)).over(w)

    out = changes.withColumn("_toast_seg", seg)
    unresolved_flags = []
    for c in value_cols:
        val = F.col(c)
        is_ph = val.isNotNull() & (val == placeholder)
        # a "written" version: any non-placeholder value (honest NULLs
        # included) on a non-delete row — wrapped in a struct so the
        # carrier is non-null even when the value is
        written = (F.col(op_col) != delete_op) & (val.isNull() | (val != placeholder))
        carried = F.last(
            F.when(written, F.struct(F.col("_toast_seg").alias("s"), val.alias("v"))),
            ignorenulls=True,
        ).over(w)
        ok = carried.isNotNull() & (carried["s"] == F.col("_toast_seg"))
        # flag FIRST (while c still holds the raw value), then replace c
        out = out.withColumn(
            f"_toast_un_{c}", (is_ph & ~ok).cast("int")
        ).withColumn(
            c,
            F.when(is_ph & ok, carried["v"])
            .when(is_ph & ~ok, F.lit(None).cast("string"))
            .otherwise(val),
        )
        unresolved_flags.append(F.col(f"_toast_un_{c}"))

    total = unresolved_flags[0]
    for f_ in unresolved_flags[1:]:
        total = total + f_
    out = out.withColumn("toast_unresolved", total)
    if keep_marks:
        # per-column ``_toast_un_<c>`` markers stay for a downstream
        # fill_from_state pass (it must know WHICH columns to fill),
        # and so does ``_toast_seg``: a placeholder in segment > 0 sits
        # AFTER an in-batch delete of its key, so the sink's pre-batch
        # state is the previous incarnation — fill_from_state must see
        # the fence or it resurrects exactly the stale data this
        # module's delete-fence rule exists to block.
        return out
    return out.drop("_toast_seg", *[f"_toast_un_{c}" for c in value_cols])


def toast_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic TOAST fixture (parquet change log over
    columns ``repo, path, seq, op, content, meta``) once and return its
    path. Planted cases:

    * key f000: insert v1 → two consecutive placeholder updates (chain
      resolves through the intermediate fill) → honest update v9;
    * key f001: a version writes an honest NULL content, a later
      placeholder must resolve to NULL (not skip to the older value);
    * key f002: insert → delete → re-insert → placeholder (fills from
      the RE-insert, not across the delete);
    * key f003: insert → delete → malformed placeholder update with no
      re-insert (unresolvable → NULL + toast_unresolved=1);
    * key f004: stream tailed mid-history — first event is an update
      with a placeholder (unresolvable);
    * key f005: the two columns go stale on alternating updates
      (content placeholder while meta written, then the reverse);
    * the placeholder never leaks across keys.

    pyarrow-written so oracle_sql() needs no SparkSession."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/toast_v1.parquet"
    if os.path.exists(path):
        return path

    PH = DEBEZIUM_UNAVAILABLE
    rows = [  # (key_i, seq, op, content, meta)
        (0, 1, "c", "body-v1:0", "m1:0"),
        (0, 2, "u", PH, "m2:0"),
        (0, 3, "u", PH, PH),
        (0, 9, "u", "body-v9:0", PH),
        (1, 1, "c", "body-v1:1", "m1:1"),
        (1, 2, "u", None, "m2:1"),      # honest NULL write
        (1, 3, "u", PH, PH),             # resolves content -> NULL
        (2, 1, "c", "old-incarnation:2", "m1:2"),
        (2, 2, "d", None, None),
        (2, 3, "c", "new-incarnation:2", "m3:2"),
        (2, 4, "u", PH, "m4:2"),         # fills from seq 3, not seq 1
        (3, 1, "c", "body-v1:3", "m1:3"),
        (3, 2, "d", None, None),
        (3, 3, "u", PH, "m3:3"),         # no re-insert: unresolvable
        (4, 5, "u", PH, "m5:4"),         # tail started mid-history
        (5, 1, "c", "body-v1:5", "m1:5"),
        (5, 2, "u", PH, "m2:5"),
        (5, 3, "u", "body-v3:5", PH),
        (5, 4, "u", PH, "m4:5"),
    ]
    os.makedirs(base, exist_ok=True)
    table = pa.table(
        {
            "repo": pa.array([f"repo-{i % 2}" for i, *_ in rows], pa.string()),
            "path": pa.array([f"src/f{i:03d}.py" for i, *_ in rows], pa.string()),
            "seq": pa.array([s for _, s, *_ in rows], pa.int64()),
            "op": pa.array([op for _, _, op, *_ in rows], pa.string()),
            "content": pa.array([c for *_, c, _ in rows], pa.string()),
            "meta": pa.array([m for *_, m in rows], pa.string()),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def fill_from_state(
    batch: DataFrame,
    state: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    *,
    old_prefix: str | None = None,
    keep_marks: bool = False,
) -> DataFrame:
    """Second-stage placeholder resolution: fill the columns a
    batch-local LOCF could NOT resolve from the sink's CURRENT state.

    Why this exists: ``fill_unavailable`` only sees one micro-batch. A
    placeholder whose previous row version was merged in an EARLIER
    batch — the common case in steady-state CDC — has no in-batch
    history, and nulling it would corrupt the lake at merge. The
    previous version, however, already lives in the sink; this pass
    joins the still-marked rows against it. With ``old_prefix`` the
    lookup key coalesces the row's ``old_<k>`` components first, so a
    RENAME row's unchanged-TOAST column resolves from the old key's
    state (in Postgres a rename UPDATE toasts the content by
    definition — the column did not change).

    Contract: ``batch`` carries the per-column ``_toast_un_<c>`` marks
    (run ``fill_unavailable(..., keep_marks=True)`` first), and
    ``state`` has at most ONE row per key (a resolved sink state — a
    duplicate key would multiply batch rows). Rows that neither pass
    resolves keep their marks — route them to a quarantine instead of
    merging a fabricated NULL (``IngestStream(toast_value_cols=...)``
    does exactly that).

    Scale shape: one equi join of |batch| against the state restricted
    to the looked-up keys (the caller prunes; ``IngestStream`` reads
    only the touched buckets semi-joined to the flagged keys). No
    Python, no window.
    """
    for c in value_cols:
        if f"_toast_un_{c}" not in batch.columns:
            raise ValueError(
                f"batch is missing mark column '_toast_un_{c}' — run "
                f"fill_unavailable(..., keep_marks=True) first"
            )
    # Delete fence (see fill_unavailable): a mark in segment > 0 means
    # an in-batch delete of this row's key precedes it — the sink's
    # state predates that delete (this batch has not merged), so a
    # state fill would leak the OLD incarnation's value. Such rows stay
    # marked here and route to quarantine; once the batch (delete
    # included) has merged, a quarantine replay — whose input carries
    # no ``_toast_seg`` — resolves them against the post-delete state.
    fence_ok = (
        F.coalesce(F.col("_toast_seg"), F.lit(0)) == 0
        if "_toast_seg" in batch.columns
        else F.lit(True)
    )
    lookup = [
        F.coalesce(F.col(f"{old_prefix}{k}"), F.col(k)) if old_prefix else F.col(k)
        for k in key_cols
    ]
    slim = state.select(
        *[F.col(k).alias(f"_st_{k}") for k in key_cols],
        *[F.col(c).alias(f"_st_{c}") for c in value_cols],
        F.lit(1).alias("_st_hit"),
    )
    cond = lookup[0] == slim[f"_st_{key_cols[0]}"]
    for lk, k in zip(lookup[1:], key_cols[1:]):
        cond = cond & (lk == slim[f"_st_{k}"])
    j = batch.join(slim, cond, "left")

    hit = (F.col("_st_hit") == 1) & fence_ok
    out = j
    for c in value_cols:
        mark = F.col(f"_toast_un_{c}") == 1
        out = out.withColumn(
            c, F.when(mark & hit, F.col(f"_st_{c}")).otherwise(F.col(c))
        ).withColumn(f"_toast_un_{c}", F.when(mark & hit, 0).otherwise(F.col(f"_toast_un_{c}")))
    total = F.col(f"_toast_un_{value_cols[0]}")
    for c in value_cols[1:]:
        total = total + F.col(f"_toast_un_{c}")
    out = out.withColumn("toast_unresolved", total).drop(
        "_st_hit", *[f"_st_{k}" for k in key_cols], *[f"_st_{c}" for c in value_cols]
    )
    if keep_marks:
        return out
    return out.drop("_toast_seg", *[f"_toast_un_{c}" for c in value_cols])
