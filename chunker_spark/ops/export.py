"""Training-corpus export: deterministic sharded JSONL + manifest.

The last step of a curation pipeline is not a lake table — trainers
consume fixed-size shard files (JSONL here; the layout generalizes to
webdataset/tfrecord). The export must be:

* **deterministic** — re-running it over the same curated frame
  produces byte-identical shards, so a shard set can be content-
  addressed, diffed, and resumed;
* **distributed** — shard assignment is a pure hash of the document id
  (`pmod(xxhash64(id), n_shards)`), so no global sort, no driver
  bottleneck, and a document's shard never depends on partitioning;
  one repartition ON the shard id co-locates each shard in exactly one
  task, and dynamic partition write emits one file per shard;
* **self-describing** — a manifest (one row per shard: doc count,
  total bytes, order-insensitive content digest) is written beside the
  shards; `verify_export` recomputes it from the shard files
  themselves, so a truncated or bit-rotten shard is caught before a
  training run consumes it (the digest covers id AND text, so an
  id-swap is as detectable as a text flip).

Rows within a shard are sorted by id (`sortWithinPartitions`), making
file bytes a pure function of the data — the same reproducibility
discipline as the curation ops upstream (content-hash splits, A-ES
sampling).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.digests import content_digest as _content_digest


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Write ``df`` as ``shard=N/*.json`` JSONL under ``path`` plus a
    ``_manifest`` parquet; returns the manifest DataFrame
    (shard, n_docs, total_bytes, digest)."""
    if n_shards <= 0:
        raise ValueError(f"need n_shards > 0, got {n_shards}")
    tagged = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    (
        tagged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )
    row_repr = F.concat_ws("\x1f", F.col(id_col).cast("string"), F.col(text_col))
    manifest = (
        tagged.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(F.col(text_col).cast("binary"))).alias("total_bytes"),
            _content_digest(row_repr).alias("digest"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "_manifest"))
    return manifest


def verify_export(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recompute the per-shard manifest FROM THE SHARD FILES and join
    it against the stored one. Returns one row per shard with an ``ok``
    verdict (count + bytes + digest all equal); a missing shard or a
    corrupted document fails its row. Run before a training job points
    at the export."""
    stored = spark.read.parquet(os.path.join(path, "_manifest"))
    # read only the shard dirs (basePath keeps the partition column and
    # the glob keeps the json reader away from the parquet _manifest)
    actual = (
        spark.read.option("basePath", path).json(os.path.join(path, "shard=*"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("a_docs"),
            F.sum(F.length(F.col(text_col).cast("binary"))).alias("a_bytes"),
            _content_digest(
                F.concat_ws("\x1f", F.col(id_col).cast("string"), F.col(text_col))
            ).alias("a_digest"),
        )
    )
    return (
        stored.join(actual, "shard", "full_outer")
        .select(
            "shard",
            "n_docs",
            "a_docs",
            (
                F.col("n_docs").eqNullSafe(F.col("a_docs"))
                & F.col("total_bytes").eqNullSafe(F.col("a_bytes"))
                & F.col("digest").eqNullSafe(F.col("a_digest"))
            ).alias("ok"),
        )
        .orderBy("shard")
    )
