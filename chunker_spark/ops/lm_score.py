"""Unigram language-model quality scoring (perplexity filtering).

CCNet-style pipelines rank documents by language-model perplexity and
drop the worst tail. The full KenLM is out of scope for this engine
(and this container), but the distributable core — fit a model on the
corpus, score every document by per-token cross-entropy — is engine
territory, and a smoothed unigram model is its deterministic,
SQL-checkable representative: gibberish, boilerplate and
wrong-language text all score far from the corpus average.

Scale shape: the fit is ONE fixed-width (word, tf) aggregate with a
deterministic top-V cut (tf desc, word asc — reruns identical); the
model is V+1 rows and BROADCASTS (a vocabulary is KBs against a corpus
of TBs). Scoring explodes each document's words once, map-side joins
the broadcast vocabulary, and aggregates per document — the text
column never shuffles, only (id, word) pairs do.

Float policy (the house discipline): each log-probability is computed
once, rounded to 6, and stored as DECIMAL(20,6); per-document sums are
then EXACT decimal arithmetic — commutative, so Spark's and any
oracle's aggregation order produce bit-identical totals — and the
final per-token division is one IEEE double op on identical operands.
A raw double sum over words would be accumulation-order-dependent and
unhashable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WORD_SPLIT = r"[^a-z]+"


def _words(text_col) -> F.Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), _WORD_SPLIT), lambda w: w != "")


def unigram_model(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> DataFrame:
    """Fit the smoothed unigram model: (word, logp DECIMAL(20,6)) for
    the top ``vocab_size`` corpus words plus one ``<oov>`` row.

    Add-one smoothing over (N + V + 1) where N = total in-vocab token
    mass and V = |vocab|: logp(w) = ln((tf_w + 1) / (N + V + 1)),
    logp(<oov>) = ln(1 / (N + V + 1)). The cut is deterministic
    (tf desc, word asc), so refits on the same corpus are identical.
    """
    if vocab_size <= 0:
        raise ValueError(f"need vocab_size > 0, got {vocab_size}")
    counts = (
        df.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # the corpus-wide explode+aggregate runs ONCE: the V-row vocab is
    # checkpointed, so the totals collect below, the <oov> lookup and
    # the scoring join all read V cached rows, never the corpus again.
    # Lazy checkpoint: the totals collect right below materializes it —
    # one job where the eager form paid a dedicated checkpoint action
    # first (guide §1.2: fewer passes)
    vocab = (
        counts.orderBy(F.desc("tf"), F.asc("word"))
        .limit(vocab_size)
        .localCheckpoint(eager=False)
    )
    totals = vocab.agg(
        F.sum("tf").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    denom = float(totals["n"] or 0) + float(totals["v"] or 0) + 1.0
    logp = F.round(F.log((F.col("tf") + 1) / F.lit(denom)), 6).cast("decimal(20,6)")
    oov = df.sparkSession.createDataFrame(
        [("<oov>",)], "word string"
    ).select(
        "word",
        F.round(F.log(F.lit(1.0) / F.lit(denom)), 6).cast("decimal(20,6)").alias("logp"),
    )
    return vocab.select("word", logp.alias("logp")).unionByName(oov)


def lm_cross_entropy(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under the unigram model:
    (id, n_tokens, cross_entropy) where cross_entropy =
    -sum(logp(w)) / n_tokens over the document's words (OOV words take
    the ``<oov>`` probability). Lower = more corpus-typical. Documents
    with zero words are dropped (no defined score). The model side
    broadcasts; per-word decimal sums are exact, so scores are
    engine-portable.

    The ``<oov>`` probability is attached as a broadcast 1-row cross
    join instead of a driver collect — no extra Spark action just to
    read one scalar; a model missing its ``<oov>`` row fails loudly at
    execution via ``raise_error`` (it would otherwise silently score
    OOV words as null)."""
    oov1 = (
        model.where(F.col("word") == "<oov>")
        .select(F.col("logp").alias("__oov_logp"))
        .limit(1)
    )
    tokens = df.select(
        F.col(id_col), F.explode(_words(text_col)).alias("word")
    )
    scored = (
        tokens.join(
            F.broadcast(model.where(F.col("word") != "<oov>")), "word", "left"
        )
        .join(F.broadcast(oov1), F.lit(True), "left")
        .select(
            id_col,
            F.coalesce(
                F.col("logp"),
                F.col("__oov_logp"),
                F.raise_error(
                    "model has no <oov> row — fit with unigram_model"
                ).cast("decimal(20,6)"),
            ).alias("logp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("logp").alias("total_logp"),
    )
    # per-token score in EXACT integer micro-nats: p = -total·10^6 is an
    # exact integer (logps are scale-6 decimals), and (2p + n) div (2n)
    # is round-half-up division in pure bigint arithmetic — no float
    # division at a rounding boundary to disagree across engines. The
    # double column is for humans; the micro column is the contract.
    n = F.col("n_tokens").cast("long")
    return agg.select(
        id_col,
        n.alias("n_tokens"),
        F.expr(
            "(2 * CAST(-total_logp * 1000000 AS BIGINT) + n_tokens) div (2 * n_tokens)"
        ).alias("ce_micro_nats"),
        F.round((-F.col("total_logp").cast("double")) / n, 6).alias("cross_entropy"),
    )
