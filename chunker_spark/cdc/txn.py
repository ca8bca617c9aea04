"""Transaction-atomic release across micro-batch boundaries.

A micro-batch boundary is arbitrary: a file shipper (or Kafka producer)
can cut a segment in the middle of a source transaction, so batch k
holds the first half of txn X's changes and batch k+1 the rest. Applying
batch k as-is would expose a state no source transaction ever produced —
"torn" reads for any downstream consumer of the lake (the same anomaly
MERGE atomicity prevents WITHIN a batch, reintroduced BETWEEN batches).

``TxnGate`` restores source-transaction atomicity on top of the
engine's exactly-once batch contract:

- Events carry a nullable ``txn_id`` (wal2json ``include-xids``; null
  = unframed event, passes straight through).
- Logical decoding emits a transaction's change lines strictly BEFORE
  its commit line (wal2json streams per COMMITTED transaction, in
  commit order), so within any log prefix "the commit line has been
  seen" is a complete, count-free test of transaction completeness.
- Per batch: union the carried-over pending events with the new ones,
  release every event whose txn committed (or that carries no txn),
  persist the remainder as the next batch's carry-over.

Exactly-once/redelivery: the pending set after batch k is a pure
function of (pending after k-1, batch k's content), persisted as a
versioned snapshot ``v=<batch_id>`` BEFORE the lake commit. Redelivery
of batch k reads snapshot v<k — never its own crashed half-write — and
idempotently overwrites v=k, reproducing the exact released set, which
the lake's batch-id ledger then no-ops. The snapshot is deliberately a
FULL copy of the pending set, not a delta: pending is bounded by the
events of transactions straddling one batch edge (typically zero to a
few rows), so a one-file overwrite per batch is cheaper than any
log+compact scheme and trivially crash-consistent.

Rollbacks need no handling: logical decoding never emits aborted
transactions, so every pending transaction WILL commit in a later
batch; a transaction truncated by the log itself stays pending forever,
which is exactly the contract (never expose a torn prefix).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


class TxnGate:
    """Buffer events of not-yet-committed source transactions across
    micro-batches; see module docstring for the contract.

    ``state_dir`` must be scoped to one stream generation (batch ids
    restart at 0 for every fresh checkpoint — ``IngestStream`` passes a
    run-scoped subdirectory exactly like its DLQ tree).
    ``keep_snapshots`` bounds the retained history; anything older than
    the newest ``keep_snapshots`` versions is pruned after each write.
    """

    def __init__(self, spark: SparkSession, state_dir: str, keep_snapshots: int = 8):
        if keep_snapshots < 1:
            raise ValueError(f"keep_snapshots must be >= 1 (got {keep_snapshots})")
        self.spark = spark
        self.state_dir = state_dir
        self.keep_snapshots = keep_snapshots
        #: pending-snapshot schema, remembered at write time so reads
        #: skip the per-read parquet schema-inference job; a fresh gate
        #: (restart/redelivery) falls back to inference once
        self._pending_schema = None

    # -- snapshot bookkeeping ------------------------------------------
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("v="):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    pass
        return sorted(out)

    def pending(self, batch_id: int | None = None) -> DataFrame | None:
        """The pending set as of the newest snapshot strictly below
        ``batch_id`` (or the newest overall when ``batch_id`` is None);
        None when no such snapshot exists."""
        vs = self._versions()
        if batch_id is not None:
            vs = [v for v in vs if v < batch_id]
        if not vs:
            return None
        reader = self.spark.read
        if self._pending_schema is not None:
            reader = reader.schema(self._pending_schema)
        return reader.parquet(f"{self.state_dir}/v={vs[-1]}")

    def _prune(self, batch_id: int) -> None:
        keep = set(v for v in self._versions() if v <= batch_id)
        keep = set(sorted(keep)[-self.keep_snapshots:])
        for v in self._versions():
            if v <= batch_id and v not in keep:
                shutil.rmtree(f"{self.state_dir}/v={v}", ignore_errors=True)

    # -- the gate ------------------------------------------------------
    def gate(self, events: DataFrame, commits: DataFrame, batch_id: int) -> DataFrame:
        """One micro-batch step: returns the released events (unframed +
        members of committed transactions, including carry-overs from
        earlier batches) and persists the new pending set as snapshot
        ``v=<batch_id>``.

        ``events`` must carry a nullable ``txn_id`` column; ``commits``
        is a one-column (``txn_id``) frame of this batch's commit
        records. Both are localCheckpointed here: each is consumed by
        two downstream sinks (release + pending snapshot), and a
        micro-batch source must not be re-scanned per action. The
        checkpoints are LAZY: the pending-snapshot write below is the
        first action and references each frame exactly once, so it
        materializes both in its own job (no race, no dedicated
        checkpoint actions); the release sink then reads the persisted
        blocks — the source is still scanned exactly once.
        """
        evs = events.localCheckpoint(eager=False)
        # no distinct(): both consumers are semi/anti joins, for which
        # build-side duplicates are harmless — the distinct was a pure
        # extra shuffle per micro-batch
        cms = commits.select("txn_id").localCheckpoint(eager=False)
        prior = self.pending(batch_id)
        all_evs = prior.unionByName(evs) if prior is not None else evs
        unframed = all_evs.where(F.col("txn_id").isNull())
        framed = all_evs.where(F.col("txn_id").isNotNull())
        # commits is a handful of ids — broadcast both the release semi
        # and the pending anti join so the event rows never shuffle
        released = framed.join(F.broadcast(cms), "txn_id", "left_semi")
        pending = framed.join(F.broadcast(cms), "txn_id", "left_anti")
        # snapshot BEFORE the caller's lake commit: a crash between the
        # two writes redelivers the batch, which re-reads v<batch_id and
        # idempotently overwrites this snapshot (same rows)
        pending.coalesce(1).write.mode("overwrite").parquet(
            f"{self.state_dir}/v={batch_id}"
        )
        self._pending_schema = pending.schema
        self._prune(batch_id)
        return unframed.unionByName(released)
