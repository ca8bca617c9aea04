"""Iceberg-style copy-on-write lake table on plain Parquet + JSON commits.

The sandbox has no Iceberg runtime jar, so the exactly-once MERGE sink is
built behind this small table format (SURVEY.md §7.3.3). Semantics kept
Iceberg-shaped so a `MERGE INTO` implementation can drop in:

* data files are immutable parquet, hash-bucketed on the table key —
  a MERGE rewrites ONLY the buckets containing touched keys and carries
  every other file forward by reference (copy-on-write at bucket
  granularity; at 10^10-row scale a micro-batch touches a bounded set
  of buckets, never the whole table);
* a commit is one JSON manifest listing {bucket -> files}, written
  tmp-then-`os.rename` (atomic on POSIX); the latest commit defines the
  table — readers never see partial writes;
* every commit records its ``batch_id``: re-delivery of an
  already-committed micro-batch is detected and becomes a no-op, which
  is the exactly-once contract for `foreachBatch` retries;
* old commits/snapshots remain readable (time-travel-lite, used by the
  resume tests).

Bucketing uses ``xxhash64(repo, path) pmod num_buckets`` — computed
JVM-side, identical in every run, so co-located joins between updates
and table state never re-shuffle the big side.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schema import KEY_COLS, TABLE_SCHEMA


def bucket_expr(num_buckets: int, key_cols=KEY_COLS) -> F.Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets))


class LakeTable:
    """A bucketed copy-on-write table rooted at ``root``."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        num_buckets: int = 16,
        schema=TABLE_SCHEMA,
    ) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.num_buckets = num_buckets
        self.schema = schema
        os.makedirs(f"{self.root}/meta", exist_ok=True)
        os.makedirs(f"{self.root}/data", exist_ok=True)

    # ---- commit log ------------------------------------------------

    def _commit_files(self) -> list[str]:
        meta = f"{self.root}/meta"
        return sorted(
            f for f in os.listdir(meta) if f.startswith("commit-") and f.endswith(".json")
        )

    def current_commit(self) -> dict | None:
        files = self._commit_files()
        if not files:
            return None
        with open(f"{self.root}/meta/{files[-1]}") as f:
            return json.load(f)

    def committed_batch_ids(self) -> set[str]:
        ids = set()
        for name in self._commit_files():
            with open(f"{self.root}/meta/{name}") as f:
                ids.add(str(json.load(f)["batch_id"]))
        return ids

    def _write_commit(self, commit: dict) -> None:
        seq = commit["commit_seq"]
        meta = f"{self.root}/meta"
        tmp = f"{meta}/.tmp-{uuid.uuid4().hex}.json"
        final = f"{meta}/commit-{seq:012d}.json"
        with open(tmp, "w") as f:
            json.dump(commit, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # atomic commit point

    # ---- reads -----------------------------------------------------

    def _files_for(self, commit: dict | None, buckets: list[int] | None = None) -> list[str]:
        if not commit:
            return []
        fmap = commit["files"]
        keys = [str(b) for b in buckets] if buckets is not None else list(fmap)
        return [p for k in keys for p in fmap.get(k, [])]

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current table state (optionally restricted to buckets —
        bucket pruning, the physical analogue of partition pruning)."""
        paths = self._files_for(self.current_commit(), buckets)
        if not paths:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*paths)

    # ---- writes ----------------------------------------------------

    def overwrite_buckets(
        self,
        new_rows: DataFrame,
        touched_buckets: list[int],
        batch_id: str,
        stats: dict | None = None,
    ) -> dict:
        """Commit: replace ``touched_buckets`` with ``new_rows`` (which
        must contain only keys hashing into those buckets), carry all
        other buckets forward by file reference."""
        prev = self.current_commit()
        seq = (prev["commit_seq"] + 1) if prev else 0
        snap_dir = f"{self.root}/data/snap-{seq:012d}"

        out = new_rows.withColumn("__bucket", bucket_expr(self.num_buckets))
        # one shuffle, partitioned by bucket → one-ish file per bucket
        out.repartition(max(len(touched_buckets), 1), "__bucket").write.partitionBy(
            "__bucket"
        ).mode("overwrite").parquet(snap_dir)

        new_files: dict[str, list[str]] = {}
        for d in os.listdir(snap_dir):
            if d.startswith("__bucket="):
                b = d.split("=", 1)[1]
                new_files[b] = sorted(
                    f"{snap_dir}/{d}/{f}"
                    for f in os.listdir(f"{snap_dir}/{d}")
                    if f.endswith(".parquet")
                )
        files = dict(prev["files"]) if prev else {}
        for b in touched_buckets:
            files[str(b)] = new_files.get(str(b), [])  # empty bucket = all deleted

        commit = {
            "commit_seq": seq,
            "batch_id": str(batch_id),
            "ts": time.time(),
            "num_buckets": self.num_buckets,
            "touched_buckets": sorted(int(b) for b in touched_buckets),
            "files": files,
            "stats": stats or {},
        }
        self._write_commit(commit)
        return commit
