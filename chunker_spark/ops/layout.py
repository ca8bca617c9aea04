"""Multi-dimensional file layout (z-order) for data-skipping at scale.

Parquet/lake data-skipping prunes files (and row groups) whose min/max
column statistics exclude a predicate. A linear sort gives perfect
pruning on ONE column and none on the others; interleaving the bits of
several columns' bucket numbers (a Morton / z-order curve) gives each
participating column locality proportional to its share of the bits, so
point/range predicates on ANY of the z-columns prune a large fraction
of files. This is the layout step a 100 TB table runs at compaction
time; the cluster-killer alternative — full multi-column sort — orders
globally on the first column only and leaves the rest unprunable.

Everything here is JVM-side column arithmetic (subtract/multiply/shift/
mask/or); the only Spark actions are one stats aggregate (min/max
strategy) or one ``approxQuantile`` (quantile strategy), both O(cols)
driver-side scalars. The write path is ``repartitionByRange`` on the
z-value — Spark's range partitioner samples boundaries, so output files
tile the curve evenly even when the value distribution is skewed.

Bucketing strategies:

- ``minmax``: bucket = (x - min) * 2^bits // (max - min + 1). Exact
  integer arithmetic, fully reproducible in ANSI SQL (the correctness
  oracle runs this); weak when a column is heavily skewed (most rows
  collapse into few buckets).
- ``quantile``: buckets are equi-depth via ``approxQuantile`` — the
  production default (what lakehouse OPTIMIZE ZORDER implementations
  use), robust to skew; boundary placement is approximate so it is
  behaviour-tested (locality/pruning), not value-pinned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide bucket numbers: output bit
    (b * ncols + i) is bit b of column i. Built as a balanced OR-tree of
    shift/mask terms — pure codegen-friendly long arithmetic."""
    ncols = len(buckets)
    terms = []
    for i, col in enumerate(buckets):
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(col, b).bitwiseAND(F.lit(1)), b * ncols + i)
            )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    strategy: str = "minmax",
    out_col: str = "zvalue",
) -> DataFrame:
    """Add the z-order curve position of each row over ``cols``.

    ``bits`` buckets per column (2^bits), so the z-value occupies
    ``bits * len(cols)`` low bits of a long. Columns must be numeric;
    nulls map to bucket 0 (they sort together at the curve origin,
    which keeps them in few files — the best skipping outcome a null
    can get).
    """
    if not cols or len(cols) < 2:
        raise ValueError(f"z-order needs >= 2 columns (got {cols}); use a plain sort for 1")
    if not (1 <= bits * len(cols) <= 62):
        raise ValueError(f"bits*len(cols) must fit a long: got {bits}*{len(cols)}")
    if strategy not in ("minmax", "quantile"):
        raise ValueError(f"unknown strategy {strategy!r}")
    n_buckets = 1 << bits
    if strategy == "minmax":
        stats = df.agg(
            *[F.min(c).cast("long").alias(f"_zmin_{c}") for c in cols],
            *[F.max(c).cast("long").alias(f"_zmax_{c}") for c in cols],
        )
        with_stats = df.crossJoin(F.broadcast(stats))
        buckets = []
        for c in cols:
            lo, hi = F.col(f"_zmin_{c}"), F.col(f"_zmax_{c}")
            # exact for |values| < 2^45ish: the double division below is
            # exact up to 2^53 and inputs are bucket-scaled longs
            raw = F.floor(
                (F.col(c).cast("long") - lo) * F.lit(n_buckets) / (hi - lo + F.lit(1))
            )
            buckets.append(F.coalesce(raw, F.lit(0)).cast("long"))
        out = with_stats.withColumn(out_col, _interleave(buckets, bits))
        return out.drop(*[f"_zmin_{c}" for c in cols], *[f"_zmax_{c}" for c in cols])
    # equi-depth buckets from approximate quantiles: one driver-side
    # boundary list per column (n_buckets-1 doubles — bounded, not
    # corpus-sized), then a binary-search CASE via array + filter
    boundary_lists = {
        c: df.approxQuantile(c, [i / n_buckets for i in range(1, n_buckets)], 0.001)
        for c in cols
    }
    buckets = []
    for c in cols:
        bounds = F.array(*[F.lit(float(b)) for b in boundary_lists[c]])
        # bucket = number of boundaries <= x  (0..n_buckets-1)
        cnt = F.size(
            F.filter(bounds, lambda b: b <= F.col(c).cast("double"))
        ).cast("long")
        buckets.append(F.coalesce(cnt, F.lit(0)))
    return df.withColumn(out_col, _interleave(buckets, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 8,
    strategy: str = "quantile",
) -> None:
    """Write ``df`` as ``n_files`` parquet files laid out along the
    z-curve of ``cols``: range-partition on the z-value (sampled
    boundaries — even file sizes under skew), sort within each file so
    row-group stats are tight too, drop the helper column."""
    z = zorder_value(df, cols, bits=bits, strategy=strategy)
    (
        z.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
