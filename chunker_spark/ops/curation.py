"""Training-data curation ops: deterministic splits and sampling.

Random sampling is the wrong tool for corpus curation at 100 TB: it is
not reproducible across runs, not stable under re-partitioning, and a
re-ingested duplicate document can land in a different split than its
twin (train/eval leakage). Content-hash assignment fixes all three: the
split is a pure function of the document bytes, so identical content
always lands on the same side, any engine recomputes the same split,
and no state or seed has to be carried around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def content_hash_split(
    df: DataFrame,
    text_col: str = "text",
    train_frac: float = 0.75,
    split_col: str = "split",
) -> DataFrame:
    """Assign 'train' / 'eval' by the first byte of sha256(content).

    ``train_frac`` quantizes to 1/256 granularity (the first hex byte).
    Fully JVM-side (sha2 + string compare), embarrassingly parallel, no
    shuffle. The same content string is ALWAYS assigned the same split —
    the anti-leakage property random sampling lacks.
    """
    if not (0.0 <= train_frac <= 1.0):
        raise ValueError(f"train_frac must be in [0,1], got {train_frac}")
    if train_frac >= 1.0:
        # the 255-clamp + strict '<' below would still send hashes
        # starting 'ff' to eval; a full train fraction means ALL train
        return df.withColumn(split_col, F.lit("train"))
    threshold = format(min(int(train_frac * 256), 255), "02x")
    first_byte = F.substring(F.sha2(F.col(text_col), 256), 1, 2)
    return df.withColumn(
        split_col,
        F.when(first_byte < F.lit(threshold), "train").otherwise("eval"),
    )


def hash_sample(
    df: DataFrame,
    text_col: str = "text",
    frac: float = 0.1,
) -> DataFrame:
    """Deterministic ~``frac`` sample by content hash (same mechanism as
    the split: stable, reproducible, dedup-consistent). Quantizes to
    1/65536 granularity (first two hex bytes)."""
    if not (0.0 <= frac <= 1.0):
        raise ValueError(f"frac must be in [0,1], got {frac}")
    if frac >= 1.0:
        return df  # full sample: the clamped-threshold '<' would drop 1/65536
    threshold = format(min(int(frac * 65536), 65535), "04x")
    return df.where(F.substring(F.sha2(F.col(text_col), 256), 1, 4) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    frac_num: int,
    frac_den: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT per-stratum sampling: keep ceil(n_stratum * frac) rows of
    every stratum, chosen deterministically.

    `hash_sample` above gives each stratum only an *expected* fraction —
    a small language or source can be over/under-sampled by luck, which
    is exactly what corpus mixture weighting cannot tolerate. This
    variant ranks rows within each stratum by (sha256(text), id) — a
    content-determined total order — and keeps the first
    ceil(n * frac_num/frac_den). The fraction is a rational, and the
    keep test is pure integer arithmetic ((rank-1) * den < n * num), so
    the result is bit-identical across engines and runs: no float
    rounding can move the cutoff.

    Cost: one hash-partition shuffle on the strata + per-stratum sort
    (Spark sorts strata independently); fixed-width rank/count state.
    At 100 TB a stratum is a language/source pair — thousands of
    strata, each far smaller than the corpus, so the per-stratum sort
    parallelizes. A single mega-stratum would need the same time-bucket
    split trick sessionize uses; strata this op is meant for (mixture
    weights) are bounded by construction.
    """
    if frac_den <= 0 or frac_num < 0:
        raise ValueError(f"fraction must be >=0 with positive denominator, got {frac_num}/{frac_den}")
    if frac_num > frac_den:
        raise ValueError(f"fraction must be <= 1, got {frac_num}/{frac_den}")
    order = [F.sha2(F.col(text_col), 256), F.col(id_col)]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    wn = Window.partitionBy(*strata_cols)
    ranked = df.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    keep = (F.col("_rk") - 1) * F.lit(frac_den) < F.col("_n") * F.lit(frac_num)
    return ranked.where(keep).drop("_rk", "_n")


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    quotas: dict[str, tuple[int, int]],
    default: tuple[int, int] = (0, 1),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus mixture weighting (the Pile/DoReMi recipe): keep a
    DIFFERENT exact fraction of each stratum — ``quotas`` maps a
    stratum value to a rational (num, den); strata not listed get
    ``default`` ((0, 1) = drop, (1, 1) = keep all).

    Same machinery as `stratified_sample` — content-determined rank
    within the stratum, integer keep test, bit-identical across
    engines — but the fraction is per-stratum, which is what a training
    mixture actually is: 100% of a small high-quality source, 4% of a
    crawl. One shuffle on the stratum; the quota lookup is a literal
    CASE chain (mixture specs are small by nature — if yours has 10^5
    entries it is a join, not a mixture).
    """
    for k, (num, den) in quotas.items():
        if den <= 0 or num < 0 or num > den:
            raise ValueError(f"quota for {k!r} must be 0 <= num/den <= 1, got {num}/{den}")
    dn, dd = default
    if dd <= 0 or dn < 0 or dn > dd:
        raise ValueError(f"default quota must be 0 <= num/den <= 1, got {dn}/{dd}")
    num_c, den_c = F.lit(dn), F.lit(dd)
    for k, (num, den) in sorted(quotas.items()):
        hit = F.col(stratum_col) == F.lit(k)
        num_c = F.when(hit, F.lit(num)).otherwise(num_c)
        den_c = F.when(hit, F.lit(den)).otherwise(den_c)
    order = [F.sha2(F.col(text_col), 256), F.col(id_col)]
    w = Window.partitionBy(stratum_col).orderBy(*order)
    wn = Window.partitionBy(stratum_col)
    ranked = df.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    keep = (F.col("_rk") - 1) * den_c < F.col("_n") * num_c
    return ranked.where(keep).drop("_rk", "_n")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_col: str = "sample_key",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row gets key = ln(u) / w with u a uniform
    derived from the CONTENT hash, and the k largest keys win — the
    probability a row is selected is proportional to its weight, yet
    the draw is a pure function of the data (reproducible across runs,
    engines, partitionings; duplicate content draws the same u, the
    property seeded RNG sampling cannot give).

    Scale shape: map-only key computation, then a global top-k —
    Spark's sort+limit plans as TakeOrderedAndProject (per-partition
    partial top-k, only k rows per partition reach the driver-side
    merge), NOT a full sort shuffle.

    Float policy (the house parity protocol): the key is rounded to 6
    decimals and ties break on ``id_col``, so rank order is stable
    under last-ulp ln() differences between engines. Rows with
    non-positive or null weight are excluded (they have zero selection
    probability; -inf keys would poison the sort).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        F.conv(F.substring(F.sha2(F.col(text_col), 256), 1, 8), 16, 10).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    # + 0.0 canonicalizes IEEE negative zero: a key in (-5e-7, 0)
    # rounds to -0.0, which engines render/hash differently from 0.0
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 6) + F.lit(0.0)
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col))
        .limit(k)
    )


def retain_canonical(
    members: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    score_col: str = "score",
) -> DataFrame:
    """Per-cluster canonical-survivor selection: the retention decision
    a curation pipeline applies AFTER dedup clustering (exact groups,
    MinHash/CC clusters, containment groups) — keep exactly one member
    per cluster, the one with the highest ``score_col``, ties broken by
    lowest id so the choice is deterministic under re-partitioning.

    Input: one row per cluster member carrying (id, cluster, score);
    singletons are ordinary size-1 clusters. Output adds ``kept``
    (exactly one true per cluster), ``rep`` (the cluster's minimum id —
    a stable cluster name independent of the score), and ``n_members``.

    Scale shape: one hash exchange on ``cluster_col``; both the argmax
    (row_number) and the rep/size (min/count) ride the SAME sort-free
    window partitioning, so Spark plans a single Exchange followed by
    window evaluation — no self-join, no second shuffle. Score payload
    is a scalar; document text never enters the shuffle.
    """
    w = Window.partitionBy(cluster_col)
    wo = Window.partitionBy(cluster_col).orderBy(
        F.desc(score_col), F.col(id_col)
    )
    return members.select(
        F.col(id_col),
        F.col(cluster_col),
        F.col(score_col),
        F.min(id_col).over(w).alias("rep"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_members"),
        (F.row_number().over(wo) == 1).alias("kept"),
    )
