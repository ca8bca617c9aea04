"""Chunk-interleaved snapshot of a live table (the DBLog watermark
algorithm), re-expressed as two declarative joins.

The problem (public paper: Andreakis & Papapanagiotou, *DBLog: A
Watermark Based Change-Data-Capture Framework*, Netflix 2019,
arXiv:2010.12597): bootstrapping a CDC pipeline needs a full snapshot
of the source table, but a 100 TB table can't be dumped atomically and
the binlog tail must keep flowing while the snapshot runs — retention
would otherwise drop events. DBLog's answer: select the table in small
primary-key chunks *between* log events, and use a pair of watermark
positions written around each chunk SELECT to decide which chunk rows
are safe to emit:

* ``lw`` (low watermark): log position written just before the chunk
  SELECT; ``hw`` (high watermark): just after. The SELECT executes at
  some position ``p`` with ``lw < p < hw``.
* any key that has a change event with ``lw < seq < hw`` is REMOVED
  from the chunk — its chunk state may be stale relative to the log,
  and the log event itself carries the fresher (or equal) row;
* the surviving chunk rows are emitted as upserts positioned at ``hw``
  (just before the first post-``hw`` log event), so any later change
  overwrites them by last-writer-wins.

Convergence argument (paper §3.2, restated): a surviving chunk row's
state reflects every change with ``seq <= lw`` (committed before the
SELECT began) and — by the window rule — no change touched it inside
``(lw, hw)``; placing it at ``hw`` therefore never masks a log event,
and every change with ``seq > hw`` wins by LWW. Replaying the
interleaved stream into an empty sink converges to the true source
state without ever pausing the tail or locking the table.

Spark-first shape (this module is batch-expressible on purpose — the
per-chunk watermarking happens at the *source*; once chunk rows arrive
annotated with their ``(lw, hw)`` pair, the dedup + ordering is a plain
dataframe computation that foreachBatch can run incrementally):

* the window-drop is ONE anti join: chunks vs the change log on the
  key columns with the residual ``lw < seq < hw`` predicate — an
  equi-join with a filter, never a nested loop (plan-asserted);
* the change side is projected to fixed-width ``(key, seq)`` before
  the join — change payloads never shuffle for the dedup;
* the total order is arithmetic, not a sort: log events get
  ``out_seq = 2*seq``, surviving chunk rows ``2*hw - 1`` (strictly
  after every in-window event, strictly before the first post-``hw``
  one — watermark positions are their own log entries, so no change
  event occupies ``hw`` itself);
* final state is the same LWW window the rest of the engine uses.

At 100 TB: |chunks| rows shuffle once for the anti join (hash on the
high-cardinality key — no skew), |changes| contributes only key+seq,
and resolution is one more hash exchange of the union. Nothing is
quadratic, nothing collects.

Reference anchor: the reference (src/chunker/*.d) is a byte-stream
chunker with no snapshot machinery; this module exists because the
north-star brief is a CDC ingest engine and a watermark-interleaved
snapshot is how such an engine bootstraps from a live source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: bookkeeping columns the interleave adds to the unified stream
OUT_SEQ = "out_seq"
SRC = "src"


def interleave_snapshot(
    changes: DataFrame,
    chunks: DataFrame,
    key_cols: list[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    lw_col: str = "lw_seq",
    hw_col: str = "hw_seq",
) -> DataFrame:
    """Merge snapshot chunk rows into the change stream (DBLog rule).

    Parameters
    ----------
    changes : the tailed change log — ``key_cols`` + ``seq_col`` (a
        total order over the log, e.g. the packed binlog seq) +
        ``op_col`` ('c'/'u'/'r' upserts, 'd' deletes) + payload columns.
    chunks : snapshot chunk rows — ``key_cols`` + ``lw_col``/``hw_col``
        (the watermark positions captured around that chunk's SELECT)
        + the SAME payload columns. Chunk rows are upserts by
        definition (op 'r').

    Returns one unified stream: ``key_cols`` + payload + ``op_col`` +
    ``out_seq`` (long; LWW-resolvable total order) + ``src``
    ('log' | 'snapshot'). Payload columns are everything that is not a
    key, seq/watermark, or op column; their names must match between
    the two inputs.
    """
    for c in (*key_cols, seq_col, op_col):
        if c not in changes.columns:
            raise ValueError(f"changes is missing column {c!r}")
    for c in (*key_cols, lw_col, hw_col):
        if c not in chunks.columns:
            raise ValueError(f"chunks is missing column {c!r}")
    payload = [
        c for c in changes.columns if c not in (*key_cols, seq_col, op_col)
    ]
    missing = [c for c in payload if c not in chunks.columns]
    if missing:
        raise ValueError(f"chunks is missing payload columns {missing}")

    # the doubling uses one extra bit — same loud guard as
    # keychange.split_key_changes, never a silent sign wrap
    from .keychange import MAX_SEQ

    def checked(col):
        longcol = col.cast("long")
        return F.when(
            F.assert_true(
                longcol < MAX_SEQ,
                F.lit("interleave_snapshot: seq >= 2^62 cannot double-pack"),
            ).isNull(),
            longcol,
        )

    # Window-drop: anti join on the key with the residual watermark
    # range — the change side carries ONLY (key, seq), so change
    # payloads never shuffle here.
    slim = changes.select(*key_cols, F.col(seq_col).alias("_dbl_seq"))
    on = [chunks[k] == slim[k] for k in key_cols]
    rng = (slim["_dbl_seq"] > chunks[lw_col]) & (slim["_dbl_seq"] < chunks[hw_col])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    survivors = chunks.join(slim, cond & rng, "left_anti")

    snap = survivors.select(
        *key_cols,
        *payload,
        F.lit("r").alias(op_col),
        (checked(F.col(hw_col)) * 2 - 1).alias(OUT_SEQ),
        F.lit("snapshot").alias(SRC),
    )
    log = changes.select(
        *key_cols,
        *payload,
        F.col(op_col),
        (checked(F.col(seq_col)) * 2).alias(OUT_SEQ),
        F.lit("log").alias(SRC),
    )
    return log.unionByName(snap)


def resolve_final_state(
    stream: DataFrame,
    key_cols: list[str],
    *,
    op_col: str = "op",
    out_seq_col: str = OUT_SEQ,
    delete_op: str = "d",
) -> DataFrame:
    """Last-writer-wins over ``out_seq`` per key, tombstones dropped —
    the sink state the interleaved stream converges to. ``out_seq`` is
    unique per key by construction (log seqs are unique, chunk rows sit
    at odd positions, and PK-chunking puts each key in at most one
    chunk), so the window needs no tiebreak.

    ``delete_op`` names the tombstone op code (``"d"`` Debezium-style,
    ``"D"`` for the engine's typed event schema) — a wrong code
    resurrects every deleted key as its final state."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(out_seq_col).desc())
    return (
        stream.withColumn("_dbl_rn", F.row_number().over(w))
        .where((F.col("_dbl_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_dbl_rn", out_seq_col, SRC, op_col)
    )


def dblog_fixture_paths(base: str = "/tmp/chunker_spark_fixtures") -> dict:
    """Write the deterministic DBLog fixture (three parquet files) once
    and return ``{"initial", "changes", "chunks"}`` paths.

    The fixture simulates a live source: 60 (repo, path) keys in three
    PK chunks of 20, initial rows for keys 0–47, and a scripted change
    log (seq 1–70) flowing WHILE the three chunks are selected
    (chunk 0: lw=10 hw=15 read-at p=12; chunk 1: lw=30 hw=36 p=33;
    chunk 2: lw=50 hw=55 p=52). Chunk contents are derived by replaying
    the log up to each chunk's ``p`` — exactly what a SELECT against
    the live table would have seen. Planted cases, one per failure
    mode of the algorithm:

    * update BEFORE lw (key 1): chunk carries the new value, survives;
    * update IN-WINDOW after the read (keys 3, 40): the chunk copy is
      STALE — if the window-drop is broken, the stale snapshot row
      out-sequences the log event and the final content is wrong;
    * delete in-window (keys 4, 42): un-dropped chunk rows would
      resurrect the deleted key;
    * update/delete AFTER hw (keys 5, 6, 41): chunk survives but the
      log wins by LWW;
    * log inserts before/inside/after the window (keys 20, 21, 22, 48)
      and a delete + in-window re-insert (key 25);
    * snapshot-only keys (never in the log) that only the chunks can
      deliver, and key 49 which never exists anywhere.

    pyarrow-written so oracle_sql() needs no SparkSession. The DuckDB
    oracle computes the truth from ``initial`` + ``changes`` alone
    (plain LWW replay — no watermarks), so the equality genuinely
    verifies the interleave instead of restating it.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = {
        "initial": f"{base}/dblog_initial_v1.parquet",
        "changes": f"{base}/dblog_changes_v1.parquet",
        "chunks": f"{base}/dblog_chunks_v1.parquet",
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    def key(i: int) -> tuple[str, str]:
        return (f"repo-{i // 20}", f"src/f{i:03d}.py")

    initial = {key(i): f"v0:{i}" for i in range(48)}

    # (seq, op, i, content) — scripted log; seqs 10/15/30/36/50/55 are
    # the watermark writes themselves (rows in DBLog's watermark table,
    # not in this one), so no change event occupies them.
    script = [
        (3, "u", 1, "v3:1"),      # pre-lw update: chunk carries it
        (7, "d", 25, None),       # deleted, later re-inserted in-window
        (8, "d", 24, None),       # deleted before chunk 1's read
        (9, "u", 23, "v9:23"),    # pre-lw update to a twice-updated key
        (11, "u", 2, "v11:2"),    # in-window, before the read
        (13, "u", 3, "v13:3"),    # in-window, AFTER the read (stale copy)
        (14, "d", 4, None),       # in-window delete
        (20, "u", 5, "v20:5"),    # post-hw update: LWW beats the chunk
        (21, "d", 6, None),       # post-hw delete
        (25, "c", 20, "v25:20"),  # insert before chunk 1's window
        (31, "c", 21, "v31:21"),  # insert in-window, before the read
        (32, "u", 23, "v32:23"),  # first of two in-window updates
        (33, "c", 25, "v33:25"),  # in-window re-insert of the seq-7 delete
        (34, "c", 22, "v34:22"),  # insert in-window, after the read
        (35, "u", 23, "v35:23"),  # second in-window update: log's last wins
        (51, "u", 40, "v51:40"),  # in-window before read (chunk 2)
        (53, "d", 42, None),      # in-window delete (chunk 2)
        (58, "c", 48, "v58:48"),  # post-hw insert: log-only key
        (60, "u", 41, "v60:41"),  # post-hw update
        (65, "u", 0, "v65:0"),    # late update of a chunk-0 key
    ]
    script.sort()  # state_at() replays in seq order and early-breaks
    seqs = [s for s, *_ in script]
    assert len(set(seqs)) == len(seqs), "fixture seqs must be unique"
    assert not set(seqs) & {10, 15, 30, 36, 50, 55}, "watermark seqs are reserved"

    def state_at(p: int) -> dict:
        st = dict(initial)
        for s, op, i, content in script:
            if s > p:
                break
            if op == "d":
                st.pop(key(i), None)
            else:
                st[key(i)] = content
        return st

    chunk_plan = [  # (chunk_id, lo_i, hi_i, lw, hw, read_at)
        (0, 0, 20, 10, 15, 12),
        (1, 20, 40, 30, 36, 33),
        (2, 40, 60, 50, 55, 52),
    ]
    chunk_rows = []
    for cid, lo, hi, lw, hw, p in chunk_plan:
        st = state_at(p)
        for i in range(lo, hi):
            k = key(i)
            if k in st:
                chunk_rows.append((*k, cid, lw, hw, st[k]))

    os.makedirs(base, exist_ok=True)

    def write(path, table):
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    write(
        paths["initial"],
        pa.table(
            {
                "repo": pa.array([k[0] for k in initial], pa.string()),
                "path": pa.array([k[1] for k in initial], pa.string()),
                "content": pa.array(list(initial.values()), pa.string()),
            }
        ),
    )
    write(
        paths["changes"],
        pa.table(
            {
                "repo": pa.array([key(i)[0] for _, _, i, _ in script], pa.string()),
                "path": pa.array([key(i)[1] for _, _, i, _ in script], pa.string()),
                "seq": pa.array([s for s, *_ in script], pa.int64()),
                "op": pa.array([op for _, op, *_ in script], pa.string()),
                "content": pa.array([c for *_, c in script], pa.string()),
            }
        ),
    )
    write(
        paths["chunks"],
        pa.table(
            {
                "repo": pa.array([r[0] for r in chunk_rows], pa.string()),
                "path": pa.array([r[1] for r in chunk_rows], pa.string()),
                "chunk_id": pa.array([r[2] for r in chunk_rows], pa.int32()),
                "lw_seq": pa.array([r[3] for r in chunk_rows], pa.int64()),
                "hw_seq": pa.array([r[4] for r in chunk_rows], pa.int64()),
                "content": pa.array([r[5] for r in chunk_rows], pa.string()),
            }
        ),
    )
    return paths
