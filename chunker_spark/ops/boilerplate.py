"""Line-level boilerplate removal (CCNet/RefinedWeb-style paragraph dedup).

Web-scale corpora are full of lines that repeat across *documents* —
navigation menus, cookie banners, license headers, forum signatures.
Document-level dedup never sees them (the surrounding text differs);
the standard fix (CCNet, RefinedWeb) is to hash every line, count how
many distinct documents each normalized line appears in, and strip
lines whose document frequency crosses a threshold.

Scale shape (the part that matters at 100 TB):

- the document-frequency aggregate runs over ``(line_hash, doc_id)``
  pairs — two fixed-width ints per line, never the line text;
- the drop decision joins back to the exploded lines on the hash but
  projects only ``(doc_id, pos)`` — again fixed width;
- text is rebuilt **from the original document column** with a
  positional ``filter`` over ``split(text)`` — entirely JVM-side array
  expressions, so the full text participates in zero Exchanges.  The
  only thing that ever shuffles is ints.

Everything is built-in functions: no Python UDF anywhere on the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _norm(line: Column) -> Column:
    """Counting key for a line: case- and edge-whitespace-insensitive
    (the CCNet normalization — '  Privacy Policy' and 'privacy policy'
    are the same banner)."""
    return F.lower(F.trim(line))


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    out_col: str = "clean_text",
    removed_col: str = "n_lines_removed",
) -> DataFrame:
    """Strip every line whose normalized form appears in >= ``min_docs``
    distinct documents; keep surviving lines in their original order.

    Returns ``df`` with two added columns: ``out_col`` (the document
    text minus boilerplate lines, '\\n'-joined — '' when every line was
    boilerplate) and ``removed_col`` (how many lines were dropped).

    A line repeated WITHIN one document counts that document once (it
    is document frequency, not term frequency — a poem repeating its
    refrain is not boilerplate); but if the line IS boilerplate, every
    in-document occurrence is removed.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2 (got {min_docs}); 1 would drop every line")
    lines = df.select(
        F.col(id_col).alias("_bp_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_bp_pos", "_bp_line"),
    ).withColumn("_bp_h", F.xxhash64(_norm(F.col("_bp_line"))))
    # document frequency per normalized line: distinct (hash, doc) then
    # count — both stages shuffle two ints per line, nothing else
    doc_freq = (
        lines.select("_bp_h", "_bp_id")
        .distinct()
        .groupBy("_bp_h")
        .agg(F.count(F.lit(1)).alias("_bp_df"))
        .where(F.col("_bp_df") >= F.lit(min_docs))
    )
    # positions to drop, per document: the join projects (id, pos) only
    drops = (
        lines.join(doc_freq, "_bp_h")
        .groupBy("_bp_id")
        .agg(F.collect_list("_bp_pos").alias("_bp_drop"))
    )
    out = df.join(drops, F.col(id_col) == F.col("_bp_id"), "left").drop("_bp_id")
    drop_arr = F.coalesce(F.col("_bp_drop"), F.array().cast("array<int>"))
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda x, i: ~F.array_contains(drop_arr, i),
    )
    return (
        out.withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn(removed_col, F.size(drop_arr))
        .drop("_bp_drop")
    )
