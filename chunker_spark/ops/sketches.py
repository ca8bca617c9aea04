"""Count-min-sketch frequency estimation (heavy hitters at scale).

Spark 4 exposes the CMS *aggregate* (``F.count_min_sketch`` — fixed
``O(width x depth)`` state per group, map-side combinable) but no
SQL-side estimator for the resulting binary, so the read path goes
through the JVM sketch class on the driver: the sketch is computed
distributed, exactly ONE bounded binary (``depth * width * 8`` bytes,
independent of table size — ~80 KB at eps=1e-3 / confidence=0.99) is
collected, and per-key estimates are projected back onto the keyed
rows as a literal map.  This mirrors the bounded IVF fit-sample
collect (``ops/similarity.py``): the only collects in package code are
O(1) in the corpus.

Why CMS next to the HLL / approx-percentile sketches already in the
suite: HLL answers "how many distinct", the quantile sketch answers
"where is the p95", CMS answers "how often does THIS key occur" from
fixed state — the primitive behind per-domain crawl caps, hot-key
detection before a shuffle, and frequency-capped sampling in a
training-data pipeline.  At 100 TB the exact per-key count requires a
full shuffle of the key column; the sketch is one map-side pass.

Contract (Cormode & Muthukrishnan 2005): the estimate never
undercounts, and with probability >= ``confidence`` it overcounts by
at most ``eps * N`` where N is the total ingested count.  Both halves
are asserted as boolean invariant columns in the query that uses this
module (``event_freq_cms`` in ``__spark_entry__``), the same
oracle-as-invariant pattern as ``user_approx_distinct`` (HLL) and
``value_approx_quantiles`` (GK).

Reference anchor: the reference engine (a byte-stream chunker) has no
sketch surface; this is engine-side widening per SURVEY.md §2.3
(aggregations) for the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["cms_sketch_bytes", "cms_open", "cms_estimates"]


def cms_sketch_bytes(
    df: DataFrame,
    col: str,
    eps: float = 1e-3,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Aggregate ``col`` into one count-min sketch, distributed, and
    return its serialized form.

    The aggregate is Spark's built-in ``count_min_sketch`` — partial
    sketches are built per partition and merged (sketch merge is cell-
    wise addition), so the shuffle carries ``numPartitions`` fixed-size
    binaries, never rows.  The returned binary is the single bounded
    driver-side artifact.
    """
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("sk")
    ).collect()[0]
    return bytes(row["sk"])


def cms_open(spark: SparkSession, sk_bytes: bytes):
    """Deserialize a Spark CMS binary into the JVM sketch object
    (``org.apache.spark.util.sketch.CountMinSketch``), which carries
    ``totalCount()`` and ``estimateCount(item)``."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(sk_bytes))
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)


def cms_estimates(
    spark: SparkSession, sk_bytes: bytes, keys: list
) -> tuple[dict, int]:
    """Estimate the frequency of each key in ``keys`` from a serialized
    sketch.  Returns ``(estimates, total_count)``.

    ``keys`` must be bounded by construction (a top-k list, a fixed
    candidate set) — this runs on the driver, one JVM call per key.
    String and integral keys map to the JVM overloads py4j picks
    natively, matching what the aggregate hashed executor-side.
    """
    cms = cms_open(spark, sk_bytes)
    est = {k: int(cms.estimateCount(k)) for k in keys}
    return est, int(cms.totalCount())
