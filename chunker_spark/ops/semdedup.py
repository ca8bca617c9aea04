"""Semantic deduplication (SemDeDup) over an embedding column.

The published recipe (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540):
cluster the corpus embeddings with k-means, then look for
near-duplicates ONLY within each cluster — pairwise cosine across
cluster boundaries is provably below the within-cluster radius for any
threshold worth pruning at, so the O(n^2) global comparison collapses
to sum(c_i^2) over cluster sizes. With k chosen ~ n / target_cluster
size, that is O(n * c) total work, embarrassingly parallel per
cluster.

Spark shape: centroid assignment is the broadcast-degenerate map-only
stage from `ops/clustering.kmeans_assign` (centroid literals live in
the generated code — no exchange); the within-cluster pairwise stage
is a self equi-join on `cluster`, so the only shuffle of embedding
payloads is one hash-partition by cluster id on each side. The
per-row verdict aggregate that follows shuffles fixed-width
(id, cluster, other_id, cosine) rows only — embeddings never enter the
second exchange. Skew note: parallelism of the pairwise stage is
bounded by k, and a mega-cluster goes quadratic in that cluster — at
scale you pick k proportional to n (the paper uses 50k clusters for
5B embeddings) so cluster sizes stay bounded; AQE skew-join splits an
outlier bucket.

Reference anchor: this engine's embedding near-dup family
(`ops/dedup.py` exact + LSH paths) gives the global answers; SemDeDup
is the cluster-scoped middle ground a training-data pipeline actually
runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def semantic_dedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-row semantic-duplicate verdicts, cluster-scoped.

    A row is a semantic duplicate iff some LOWER-id row in the same
    k-means cluster has cosine similarity >= ``threshold`` (cosines
    rounded to the house 6 decimals before the compare, so verdicts
    are engine-portable). Keeping ``NOT is_dup`` rows retains exactly
    one representative — the lowest id — per semantic group, the
    deterministic stand-in for the paper's keep-one-per-group rule.

    Returns one row per input row:
      (id_col, cluster, is_dup, dup_of, max_cosine)
    where ``dup_of`` is the smallest lower id that witnesses the
    duplication (null when none) and ``max_cosine`` the maximum cosine
    against any lower-id same-cluster row (null for the cluster's
    lowest id; per-pair values rounded to the house 6 decimals — no
    second rounding, which double-rounds differently across engines —
    and -0.0 canonicalized via +0.0).
    """
    from .clustering import kmeans_assign
    from .similarity import _dot, _norm

    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("emb")
    )
    # per-row norm computed ONCE before the pair join (identical float
    # ops to the inline cosine — same fold, same division operands —
    # but 1 array fold per pair instead of 3)
    assigned = (
        kmeans_assign(v, centroids, vec_col="emb")
        .select("id", "emb", "cluster")
        .withColumn("nrm", _norm(F.col("emb")))
    )
    lower = assigned.select(
        F.col("cluster").alias("cluster_b"),
        F.col("id").alias("other_id"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = assigned.join(
        lower,
        (F.col("cluster") == F.col("cluster_b")) & (F.col("other_id") < F.col("id")),
        "left",
    )
    cos = F.round(
        _dot(F.col("emb"), F.col("emb_b")) / (F.col("nrm") * F.col("nrm_b")), 6
    )
    scored = pairs.select(
        "id",
        "cluster",
        "other_id",
        F.when(F.col("other_id").isNotNull(), cos).alias("cos"),
    )
    return (
        scored.groupBy("id", "cluster")
        .agg(
            (F.max("cos") + F.lit(0.0)).alias("max_cosine"),
            F.min(
                F.when(F.col("cos") >= F.lit(float(threshold)), F.col("other_id"))
            ).alias("dup_of"),
        )
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "max_cosine",
        )
    )
