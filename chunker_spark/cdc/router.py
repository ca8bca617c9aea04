"""Multi-table routing: one CDC stream fanning out to per-table lakes.

A real binlog/WAL tail carries every table of the source database in
one totally-ordered stream; the envelope parsers surface the table name
as ``src_table``. ``route_batch`` applies one micro-batch to each
destination lake with a composite ``(batch_id, table)`` idempotency
key, so exactly-once holds independently per table: a crash after
table A committed but before table B did leads to a re-delivery where
A no-ops and B applies — the standard per-destination ledger pattern.

Scale shape: the checkpointed batch is counted ONCE per micro-batch
(a single groupBy(table).count() job replaces the old per-destination
isEmpty probes) and then applied once per non-empty destination with a
partition-prunable equality filter; destinations is a small static set
(tables in the source DB), so the driver-side loop is O(tables), never
O(rows). Rows with an unrouted table name are returned (not dropped) —
the caller decides whether that is a DLQ case or a config bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernel.chunker import ChunkerParams
from .events import SOURCE_PARAMS
from .lake import LakeTable
from .merge import apply_batch


def route_batch(
    lakes: dict[str, LakeTable],
    events: DataFrame,
    batch_id: str | int,
    table_col: str = "src_table",
    params: ChunkerParams = SOURCE_PARAMS,
    **apply_kwargs,
) -> tuple[dict[str, dict | None], DataFrame]:
    """Apply one parsed micro-batch to every routed lake.

    Returns ``(commits, unrouted)``: per-table commit dicts (None where
    the (batch, table) pair was a no-op — already committed, or no rows
    for that table in this batch; applied commits carry their
    ``routed_rows`` count), and the DataFrame of rows whose
    ``table_col`` matched no destination.
    """
    # Evaluate the batch ONCE: each destination re-reads `events`, and
    # a wire-parsed batch would re-run its from_json parse T times per
    # micro-batch. localCheckpoint materializes the parsed rows up
    # front; truncating lineage also keeps per-table plans flat.
    # Lifecycle: the checkpoint blocks back the returned `unrouted`
    # frame too, so nothing here may release them — they are reclaimed
    # by the ContextCleaner once the caller drops the returned frames.
    events = events.localCheckpoint(eager=True)
    # Single-pass accounting (one job, not one isEmpty probe per
    # destination): per-table row counts decide which slices to apply —
    # skipping empties keeps 10^4 batches x T tables from bloating every
    # untouched table's commit history (idempotency unaffected: a
    # redelivered empty slice re-skips) — and ride along as routing
    # stats on each commit.
    counts = {
        r["k"]: r["n"]
        for r in events.groupBy(F.col(table_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    commits: dict[str, dict | None] = {}
    for name, lake in lakes.items():
        if not counts.get(name):
            commits[name] = None
            continue
        part = events.where(F.col(table_col) == name).drop(table_col)
        commit = apply_batch(
            lake, part, f"{batch_id}:{name}", params=params, **apply_kwargs
        )
        if commit is not None:
            commit["routed_rows"] = counts[name]
        commits[name] = commit
    unrouted = events.where(
        F.col(table_col).isNull() | ~F.col(table_col).isin(list(lakes))
    )
    return commits, unrouted
