"""Sequence packing: lay a document corpus into fixed-token-budget
training sequences.

LLM pretraining consumes fixed-length token sequences, not documents.
The standard pipeline step ("packing") concatenates documents in some
deterministic order and slices the concatenation into `budget`-token
bins; a document whose tokens straddle a bin boundary contributes to
two (or more) consecutive bins. The useful outputs are, per document:
which bin its first token lands in, which bin its last token lands in,
and its token offset inside the first bin — enough for a downstream
tokenizer-writer to materialize the actual sequences.

Scale design (100 TB):
- Packing is a prefix-sum, which is inherently sequential — so we
  shard first. A shard is an independent packing domain (real
  pipelines do exactly this: one packed stream per output file).
  Sharding by content hash keeps the layout stable under
  re-partitioning and re-ingestion; `n_shards` controls the
  parallelism/sequentiality trade (thousands of shards at 100 TB).
- Within a shard the cumulative token count is ONE window sort over
  that shard only — Spark sorts shards independently after a single
  hash-partition shuffle. No global sort, no driver state.
- All arithmetic is integer (token counts, cumulative sums, integer
  division) — exact, engine-independent, hash-stable in any oracle.

Cross-engine determinism contract (pinned by the `doc_pack` oracle):
shard = first hash byte of sha256(text) mod n_shards; order within a
shard = (sha256(text), doc_id) ascending; bin boundaries by integer
division of the running token count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def pack_documents(
    df: DataFrame,
    tokens_col: Column,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document a (shard, start_bin, end_bin, bin_offset)
    under fixed-`budget` sequence packing.

    ``tokens_col`` is the per-document token count expression (any
    integer Column — e.g. ``functions.text.token_count``). Zero-token
    documents (empty text) occupy no tokens: they are assigned the bin
    the running cursor is at, with ``end_bin = start_bin``.

    Returns columns: id_col, shard, tokens, start_bin, end_bin,
    bin_offset (token offset of the document's first token within
    start_bin). Documents never reorder across runs: the layout is a
    pure function of corpus content.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

    h = F.sha2(F.col(text_col), 256)
    shard = F.pmod(F.conv(F.substring(h, 1, 2), 16, 10).cast("int"), F.lit(n_shards))
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        h.alias("_h"),
        tokens_col.cast("long").alias("tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("tokens").over(w), F.lit(0))
    packed = base.withColumn("_cum_before", cum_before)
    last_token = F.col("_cum_before") + F.greatest(F.col("tokens"), F.lit(1)) - 1
    return packed.select(
        id_col,
        "shard",
        "tokens",
        F.floor(F.col("_cum_before") / budget).cast("long").alias("start_bin"),
        F.floor(last_token / budget).cast("long").alias("end_bin"),
        F.pmod(F.col("_cum_before"), F.lit(budget)).cast("long").alias("bin_offset"),
    )


def packing_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing stats: docs, total tokens, bins used, and the
    fill ratio of the fully-packed prefix (total_tokens / (bins *
    budget)) — the number a curation engineer watches to confirm the
    packer isn't fragmenting. Pure aggregate over the fixed-width
    `pack_documents` output; the document text never reaches this
    stage."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("total_tokens"),
            (F.max("end_bin") + 1).alias("bins_used"),
        )
        .withColumn(
            "fill_ratio",
            F.round(
                F.col("total_tokens").cast("decimal(20,6)")
                / (F.col("bins_used") * F.lit(budget)).cast("decimal(20,6)"),
                4,
            ).cast("double"),
        )
        .orderBy("shard")
    )
