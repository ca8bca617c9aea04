"""Incrementally-maintained dedup state from a change-data-feed.

The batch dedup ops (`ops/dedup.py`) answer "which documents are
duplicates" by scanning the corpus. At 100 TB the corpus barely
changes between ingest commits, so rescanning it per refresh is the
wrong cost model: the change feed (`LakeTable.changes`) already names
exactly the keys that moved. This module maintains a **fingerprint
store** — one fixed-width (key..., fp) row per live document — purely
from CDF intervals:

- upserted keys contribute sha2(content) computed MAP-SIDE on the
  interval's postimages (the content column never shuffles — only
  fixed-width key+fp rows do, plan-asserted in tests);
- every touched key's previous row is retracted with an anti-join
  against the interval's key set (broadcast-sized: an interval is a
  batch, not a corpus);
- deletes simply contribute no replacement row.

Invariant (tested after every commit): the maintained store equals
``sha2(content)`` over a full recompute of the resolved table. Dup
groups are then one groupBy(fp) over fixed-width rows — no text.

The persistence wrapper (`FingerprintStore`) keeps the store as
parquet beside a tiny JSON state file recording the last-applied
commit, applying intervals idempotently: a re-run of the same refresh
sees ``since == last_applied`` and no-ops, the same ledger discipline
the lake itself uses for batches.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def update_fingerprint_store(
    store: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path"),
    content_col: str = "content",
) -> DataFrame:
    """Apply one CDF interval to a (key..., fp) store; returns the new
    store. ``changes`` is the `LakeTable.changes` output (net change
    per key: insert / update_postimage / delete)."""
    keys = list(key_cols)
    upserts = (
        changes.where(F.col("_change_type") != "delete")
        .select(*keys, F.sha2(F.col(content_col).cast("binary"), 256).alias("fp"))
    )
    touched = changes.select(*keys).distinct()
    survivors = store.join(F.broadcast(touched), on=keys, how="left_anti")
    return survivors.unionByName(upserts)


def dup_groups(store: DataFrame, key_cols: tuple[str, ...] = ("repo", "path")) -> DataFrame:
    """Duplicate-content groups from the store alone: (fp, n_copies,
    example key columns minimum). Fixed-width aggregate; the corpus
    text is never touched."""
    keys = list(key_cols)
    return (
        store.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            *[F.min(k).alias(f"min_{k}") for k in keys],
        )
        .where(F.col("n_copies") > 1)
    )


class FingerprintStore:
    """Parquet-persisted fingerprint store with exactly-once interval
    application (last-applied commit in a JSON sidecar)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: tuple[str, ...] = ("repo", "path"),
        content_col: str = "content",
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = tuple(key_cols)
        self.content_col = content_col
        os.makedirs(path, exist_ok=True)

    @property
    def _state_file(self) -> str:
        return os.path.join(self.path, "state.json")

    def last_applied(self) -> int | None:
        if not os.path.exists(self._state_file):
            return None
        with open(self._state_file) as f:
            return json.load(f)["last_commit"]

    def _data_dir(self, commit: int) -> str:
        return os.path.join(self.path, f"store-{commit:012d}")

    def read(self) -> DataFrame:
        last = self.last_applied()
        if last is None:
            schema = ", ".join([f"{k} string" for k in self.key_cols] + ["fp string"])
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self._data_dir(last))

    def refresh(self, lake) -> dict:
        """Advance the store to the lake's current commit. Bootstrap
        (first call) fingerprints the full resolved table once; every
        later call processes only `changes(last, current)`. Returns
        {'applied': bool, 'from': ..., 'to': ...}."""
        cur = lake.current_commit()["commit_seq"]
        last = self.last_applied()
        if last is not None and cur <= last:
            return {"applied": False, "from": last, "to": cur}
        keys = list(self.key_cols)
        if last is None:
            new_store = lake.read().select(
                *keys,
                F.sha2(F.col(self.content_col).cast("binary"), 256).alias("fp"),
            )
        else:
            new_store = update_fingerprint_store(
                self.read(),
                lake.changes(since=last, until=cur),
                key_cols=self.key_cols,
                content_col=self.content_col,
            )
        target = self._data_dir(cur)
        new_store.write.mode("overwrite").parquet(target)
        tmp = f"{self._state_file}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"last_commit": cur}, f)
        os.replace(tmp, self._state_file)  # atomic cutover, crash-safe
        # previous generation stays until the NEXT refresh overwrites
        # its own target; cheap GC of older generations:
        for d in os.listdir(self.path):
            if d.startswith("store-") and d != f"store-{cur:012d}":
                import shutil

                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return {"applied": True, "from": last, "to": cur}
