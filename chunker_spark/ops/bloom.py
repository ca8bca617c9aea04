"""Distributed Bloom-filter membership sketch (build + probe).

The training-data op behind bloom-based decontamination/dedup (e.g.
AI2 Dolma's "BFF" dedup): flag corpus documents whose fingerprint is a
member of a reference set — eval benchmarks, an opt-out list, a
previously-shipped corpus — without ever joining the reference STRINGS
against the corpus.

PySpark exposes no ``bloom_filter_agg``, so the filter is built
RELATIONALLY, which is also the shape that scales: the classic m-bit
array becomes a DataFrame of ``(word_idx: long, bits: long)`` rows —
one row per set 64-bit word — aggregated with ``bit_or`` (commutative,
map-side combinable, insertion-order-free, so the bitmap is a pure
function of the member set). The probe explodes each corpus row's k
positions, broadcast-joins the bitmap on ``word_idx`` (fixed-width ints;
the bitmap is ~1.44·k/64 longs per member — bit-packed, far smaller
than broadcasting member fingerprints, let alone member text), and
AND-reduces per row. The k exploded rows of one document never leave
their input partition, so the ``groupBy(id)`` partial-aggregates them
map-side and the one shuffle carries exactly ONE fixed-width
``(id, bool)`` row per document.

Guarantees (and what the oracle checks): NO false negatives — every
true member probes positive, mathematically; false positives bounded by
the sizing fpp (k independent xxhash64 lanes, seeded by lane index).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Classic sizing: m = -n·ln p / ln²2 bits (rounded up to a whole
    64-bit word), k = m/n·ln 2 hash lanes."""
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(fp: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for one fingerprint: lane i
    hashes xxhash64(fp, i) — k independent 64-bit lanes, not the
    weaker double-hashing h1+i·h2 scheme."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(F.xxhash64(fp, i), F.lit(m_bits)),
    )


def bloom_build(items: DataFrame, fp_col: str, m_bits: int, k: int) -> DataFrame:
    """Member fingerprints -> the bit-packed bitmap relation
    ``(word_idx, bits)``. One explode + one fixed-width groupBy; only
    words with at least one set bit are materialized (absent word =
    all-zero word at probe time)."""
    pos = items.select(
        F.explode(_positions(F.col(fp_col), m_bits, k)).alias("pos")
    )
    # shiftleft with a COLUMN shift count only exists SQL-side (the
    # Python wrapper pins numBits to a literal int)
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
    return pos.groupBy(F.shiftright("pos", 6).alias("word_idx")).agg(
        F.bit_or(mask).alias("bits")
    )


def bloom_probe(
    docs: DataFrame,
    bloom: DataFrame,
    fp_col: str,
    id_col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Per-document membership verdict ``(id_col, bloom_hit)``.

    ``bloom_hit`` is true iff ALL k positions are set — guaranteed true
    for every true member inserted by :func:`bloom_build` with the same
    (m_bits, k). Broadcast join on the bitmap words; a position whose
    word row is absent is an unset bit (left join + coalesce false).
    """
    probe = docs.select(
        F.col(id_col),
        F.explode(_positions(F.col(fp_col), m_bits, k)).alias("pos"),
    ).select(
        id_col,
        F.shiftright("pos", 6).alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("_mask"),
    )
    joined = probe.join(F.broadcast(bloom), "word_idx", "left").select(
        id_col,
        F.coalesce(
            F.col("bits").bitwiseAND(F.col("_mask")) != F.lit(0), F.lit(False)
        ).alias("_hit"),
    )
    return joined.groupBy(id_col).agg(F.bool_and("_hit").alias("bloom_hit"))
