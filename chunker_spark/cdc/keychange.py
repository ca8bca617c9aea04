"""Primary-key-change splitting (file renames in CDC) — map-only.

The trap (public Debezium FAQ / MySQL-CDC folklore): when an UPDATE
changes a primary-key column, a keyed LWW merge applied to the
after-image alone upserts the NEW key and leaves the OLD key's row
dangling forever — the lake grows a phantom row per rename. For this
engine's (repo, path) keys the case is not exotic: **a git file rename
is exactly a PK-changing update**. Debezium sidesteps it at the source
by emitting DELETE(old)+INSERT(new); dialects that emit a single
update with the old key in the envelope (wal2json ``identity``,
Maxwell/Canal ``old``) push the problem to the consumer. This module
is that consumer-side fix.

``split_key_changes`` rewrites each key-changing update into the
canonical pair — a tombstone at the old key ordered immediately BEFORE
the upsert at the new key — by packing the sub-order into the seq:
``2*seq`` for the synthesized tombstone, ``2*seq + 1`` for every
original row. Downstream LWW then needs no schema change and total
order is preserved (the packing is strictly monotone in the original
seq). Rows whose old key is absent or equal to the new key pass
through untouched.

Scale shape: **zero shuffles** — two column projections and a union;
the split is embarrassingly parallel and Catalyst plans no Exchange at
all (plan-asserted). The one cost is the seq domain shrinking by one
bit: callers whose packed seqs already use bit 62 must not double-pack
(validated loudly, not silently wrapped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: doubling uses one extra bit; seqs must stay below 2^62
MAX_SEQ = 1 << 62


def split_key_changes(
    events: DataFrame,
    key_cols: list[str],
    *,
    old_prefix: str = "old_",
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "d",
    drop_old_cols: bool = True,
) -> DataFrame:
    """Rewrite key-changing updates into tombstone(old) + upsert(new).

    ``events`` carries, for each key column ``k``, an optional
    ``old_<k>`` column (null when the dialect didn't report an old
    image or the key did not change). A row "changes key" when ANY old
    key column is non-null and the full old key differs from the new
    key (null-safe comparison); deletes never split — their key IS the
    old key. The synthesized tombstone carries null payload columns and
    ``delete_op`` as its op (``"d"`` for Debezium-style streams; pass
    ``"D"`` to feed the engine's typed event schema).

    Output: same schema (minus the ``old_*`` columns when
    ``drop_old_cols``) with ``seq`` re-packed as ``2*seq + 1`` for
    original rows and ``2*seq`` for synthesized tombstones. Raises at
    runtime (``assert_true`` fused into the projection) if a seq would
    overflow the doubling.
    """
    old_cols = [f"{old_prefix}{k}" for k in key_cols]
    for c in (*key_cols, seq_col, op_col, *old_cols):
        if c not in events.columns:
            raise ValueError(f"events is missing column {c!r}")

    any_old = F.lit(False)
    differs = F.lit(False)
    for k, ok in zip(key_cols, old_cols):
        any_old = any_old | F.col(ok).isNotNull()
        differs = differs | ~F.coalesce(F.col(ok), F.col(k)).eqNullSafe(F.col(k))
    splits = (F.col(op_col) != delete_op) & any_old & differs

    seq = F.col(seq_col).cast("long")
    checked = F.when(
        F.assert_true(
            seq < MAX_SEQ, F.lit(f"split_key_changes: seq >= 2^62 cannot double-pack")
        ).isNull(),
        seq,
    )
    payload = [
        c for c in events.columns if c not in (*key_cols, *old_cols, seq_col, op_col)
    ]

    main = events.select(
        *key_cols,
        (checked * 2 + 1).alias(seq_col),
        F.col(op_col),
        *payload,
        *([] if drop_old_cols else old_cols),
    )
    # old images may be PARTIAL (Maxwell's ``old`` carries only changed
    # columns): an absent component means "unchanged", so the old key
    # coalesces with the new one component-wise
    tomb = events.where(splits).select(
        *[F.coalesce(F.col(ok), F.col(k)).alias(k) for k, ok in zip(key_cols, old_cols)],
        (checked * 2).alias(seq_col),
        F.lit(delete_op).alias(op_col),
        *[F.lit(None).cast(events.schema[c].dataType).alias(c) for c in payload],
        *(
            []
            if drop_old_cols
            else [F.lit(None).cast(events.schema[ok].dataType).alias(ok) for ok in old_cols]
        ),
    )
    return main.unionByName(tomb)


def rename_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic rename fixture (parquet change log over
    ``repo, path, old_repo, old_path, seq, op, content``) once and
    return its path. Planted cases over one repo's files:

    * rename chain a→b→c (both old paths must end as tombstones, the
      content survives only at c);
    * rename ONTO an existing path (overwrite: the target's old content
      must lose to the renamed row by seq order);
    * rename away, then a NEW file created at the vacated path (the
      tombstone must not kill the later create);
    * rename then delete at the new path (nothing survives);
    * update whose old key equals the new key (no split — plain update);
    * rows with null old keys (dialects without old images) pass
      through;
    * a cross-repo move (repo component of the key changes).

    pyarrow-written so oracle_sql() needs no SparkSession."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/rename_v1.parquet"
    if os.path.exists(path):
        return path

    R = "repo-0"
    rows = [  # (repo, path, old_repo, old_path, seq, op, content)
        (R, "a.py", None, None, 1, "c", "body-a1"),
        (R, "x.py", None, None, 2, "c", "body-x2"),
        (R, "keep.py", None, None, 3, "c", "body-keep3"),
        (R, "b.py", None, "a.py", 4, "u", "body-a1"),   # rename a -> b
        #                ^ partial old image: repo unchanged -> absent
        (R, "x.py", R, "x.py", 5, "u", "body-x5"),      # old == new: no split
        (R, "c.py", R, "b.py", 6, "u", "body-a1"),      # chain b -> c
        (R, "keep.py", None, None, 7, "u", "body-keep7"),
        (R, "x.py", R, "c.py", 8, "u", "body-a1"),      # rename ONTO x.py
        (R, "a.py", None, None, 9, "c", "body-new-a9"),  # re-create vacated path
        (R, "gone.py", None, None, 10, "c", "body-gone10"),
        (R, "moved.py", R, "gone.py", 11, "u", "body-gone10"),
        (R, "moved.py", None, None, 12, "d", None),      # delete after rename
        ("repo-1", "m.py", None, None, 13, "c", "body-m13"),
        ("repo-1", "n.py", None, None, 14, "c", "body-n14"),
        (R, "m.py", "repo-1", "m.py", 15, "u", "body-m13"),  # cross-repo move
    ]
    os.makedirs(base, exist_ok=True)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "repo": pa.array(cols[0], pa.string()),
            "path": pa.array(cols[1], pa.string()),
            "old_repo": pa.array(cols[2], pa.string()),
            "old_path": pa.array(cols[3], pa.string()),
            "seq": pa.array(cols[4], pa.int64()),
            "op": pa.array(cols[5], pa.string()),
            "content": pa.array(cols[6], pa.string()),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
