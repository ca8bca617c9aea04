"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

Tokenizer training is a corpus-scale pipeline step (SentencePiece / HF
tokenizers train it single-machine over an in-memory word-type table;
at 100 TB the word-type table itself outgrows memory). The classic
algorithm (Sennrich et al., arXiv:1508.07909) reduces exactly to
relational operations:

1. ONE corpus pass builds the word-frequency frame ``(word, count)`` —
   a partial-combining aggregate; the corpus text never shuffles again.
2. Each word is a symbol array (initially characters). Per iteration:
   adjacent-pair counting is ``explode(pairs) -> groupBy(pair) ->
   sum(count)`` over the word-TYPE frame (weighted by count, so the
   cost per iteration is O(word types), not O(corpus)); the argmax
   pair — deterministic tie-break: count desc, then pair lexicographic
   asc — becomes the next merge; applying it is a pure-JVM
   ``aggregate`` fold over each symbol array (leftmost-first,
   re-scanning after each merge, the reference semantics).
3. The frame is re-materialized (``localCheckpoint``) every iteration:
   algorithmically so iteration k+1 does not replay the whole merge
   chain of 1..k, and practically because stacking dozens of
   higher-order-function rewrites into one lazy projection overflows
   Spark's interpreted lambda evaluation (see ops/substrings.py).

``encode_counts`` applies a learned merge table with the standard
rank-greedy per-word algorithm inside an Arrow-batched pandas UDF
(per-word memoization across the batch — the HF fast path), because
merge application is sequential per word and iterating ``num_merges``
JVM rewrites per query would stack exactly the lambda depth step 3
avoids.

Simplifications vs production tokenizers (documented, not hidden): no
end-of-word marker (merges cannot cross words here by construction,
and tokens are reconstructable by concatenation — the round-trip
invariant tests rely on that), whitespace pre-tokenization, no byte
fallback.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _chars(word_col) -> F.Column:
    """word -> array of single characters (JVM, no regex edge cases)."""
    w = F.col(word_col) if isinstance(word_col, str) else word_col
    return F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
    )


def _apply_merge(syms, a: str, b: str) -> F.Column:
    """Leftmost-first merge of adjacent (a, b) inside a symbol array —
    a JVM aggregate fold; after a merge, scanning continues with the
    merged token as the new left context (reference BPE semantics)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda out, s: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(out, 1, F.size(out) - 1),
                F.array(F.concat(F.element_at(out, -1), s)),
            ),
        ).otherwise(F.concat(out, F.array(s))),
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus pass: (word, count) with words = whitespace
    tokens, lowercased. Fixed-width rows from here on."""
    words = F.explode(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != "")
    ).alias("word")
    return docs.select(words).groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def _train_bpe_local(
    syms_counts: list[tuple[list[str], int]], num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Driver-side trainer over a COLLECTED word-type table — the exact
    same recurrence as the distributed loop (positional adjacent-pair
    counting weighted by word count; argmax tie-break count desc then
    pair lexicographic asc, which matches Spark's binary-UTF8 string
    order because UTF-8 byte order preserves code-point order; merge
    application is the leftmost-first fold of ``_apply_merge`` with the
    merged token as new left context). Equality of the learned merge
    sequence against the distributed path is pinned in tests."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in syms_counts:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        nxt: list[tuple[list[str], int]] = []
        for syms, c in syms_counts:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt.append((out, c))
        syms_counts = nxt
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_pair_count: int = 2,
    driver_type_threshold: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus; stops
    early when no adjacent pair reaches ``min_pair_count`` weighted
    occurrences. Returns the ordered merge list.

    The merge loop is inherently sequential, and after the one corpus
    pass the ONLY iterated state is the word-TYPE frame. When that
    frame fits under ``driver_type_threshold`` rows it is collected
    once and the iterations run driver-side (``_train_bpe_local``):
    one Spark job total instead of ~2 per merge — the same
    bounded-collect pattern as the IVF k-means fit. A corpus whose
    type table exceeds the threshold (or ``driver_type_threshold=0``)
    takes the distributed loop, whose per-iteration cost stays
    O(word types); there the re-materialization each iteration is a
    LAZY localCheckpoint folded into the next argmax job (half the
    actions of the former eager checkpoints, and the final iteration's
    frame — which nothing reads — is never materialized at all)."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if driver_type_threshold:
        head = (
            word_frequencies(docs, text_col)
            .limit(driver_type_threshold + 1)
            .collect()
        )
        if len(head) <= driver_type_threshold:
            return _train_bpe_local(
                [(list(r["word"]), int(r["count"])) for r in head],
                num_merges,
                min_pair_count,
            )
        # type table larger than the bound: fall through (the partial
        # head is discarded — a truncated type table would train a
        # DIFFERENT tokenizer, never acceptable silently)
    wf = (
        word_frequencies(docs, text_col)
        .select(_chars("word").alias("syms"), "count")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = wf.select(
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
            "count",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        prev = wf
        # lazy: materializes inside the NEXT iteration's argmax job
        # (module docstring step 3 still holds — lineage is truncated
        # before another merge stacks on top)
        wf = wf.select(_apply_merge(F.col("syms"), a, b).alias("syms"), "count")
        wf = wf.localCheckpoint(eager=False)
        prev.unpersist()  # bound block-manager storage to 2 generations
    return merges


def bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference rank-greedy encoder for ONE word (also used by tests
    as the independent scalar oracle for the distributed trainer's
    apply step): repeatedly merge the lowest-rank adjacent pair."""
    syms = list(word)
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL occurrences of that pair, leftmost-first
        a, b = syms[best], syms[best + 1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# EXACTLY the trainer's tokenizer: Java \s+ is ASCII-only
# ([ \t\n\x0B\f\r]); Python \s is Unicode-aware unless re.ASCII, so
# str.split() here would disagree with the JVM on U+00A0 etc. and
# break the bpe_tokens >= n_words invariant (caught in review by
# running a non-breaking-space document through both). The ONE
# tokenizer shared by every encoder below — do not fork it.
_WS = re.compile(r"\s+", flags=re.ASCII)


def _doc_tokens(text, encode_word) -> list[str]:
    """Tokenize one document with the shared whitespace rule and a
    memoized per-word encoder — the single tokenizer body behind
    ``encode_counts``/``encode_tokens``/``vocab``."""
    out: list[str] = []
    for w in _WS.split((text or "").lower()):
        if w:
            out.extend(encode_word(w))
    return out


def _memo_word_encoder(merges: list[tuple[str, str]]):
    """Per-batch memoized word encoder (the HF fast path: word types
    repeat heavily within an Arrow batch)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    cache: dict[str, list[str]] = {}

    def enc(w: str) -> list[str]:
        toks = cache.get(w)
        if toks is None:
            toks = bpe_word(w, ranks)
            cache[w] = toks
        return toks

    return enc


def encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document BPE token count under the learned merge table —
    Arrow-batched pandas UDF with per-word memoization (encoding is
    sequential per word; see module docstring for why this is the one
    deliberate Python entry)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        enc = _memo_word_encoder(merges)
        return texts.map(lambda t: len(_doc_tokens(t, enc)))

    return docs.withColumn(out_col, _count(F.col(text_col)))


def encode_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Per-document BPE token SEQUENCE (array<string>) under the
    learned merge table — same tokenizer/memoization as
    ``encode_counts``; concatenating a word's tokens reproduces the
    word (no end-of-word marker), which the tests assert."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _tokens(texts: pd.Series) -> pd.Series:
        enc = _memo_word_encoder(merges)
        return texts.map(lambda t: _doc_tokens(t, enc))

    return docs.withColumn(out_col, _tokens(F.col(text_col)))


def vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """The shippable tokenizer artifact: (token, count, token_id) over
    the encoded corpus — ids assigned by (count desc, token asc), so
    the mapping is a pure function of corpus + merges (stable across
    runs and partitionings).

    Cost model matches the trainer, not the corpus: one corpus pass
    builds the (word, count) TYPE frame, each word type is encoded
    once (``encode_tokens`` over the type frame — a word is its own
    whitespace token, so the shared tokenizer applies verbatim), and
    token counts are the count-weighted sum over types. Only the small
    type/vocab frames ever shuffle — O(word types), not O(corpus
    tokens). The final id assignment is one global sort of the vocab
    (single-partition window, fine: a vocab is merges+alphabet-sized).
    """
    from pyspark.sql.window import Window

    counts = (
        encode_tokens(word_frequencies(docs, text_col), merges, text_col="word")
        .select(F.explode("tokens").alias("token"), "count")
        .groupBy("token")
        .agg(F.sum("count").alias("count"))
    )
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return counts.withColumn("token_id", F.row_number().over(w) - 1)
