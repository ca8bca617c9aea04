"""Order-insensitive distributed content digests.

One digest expression shared by every subsystem that derives an
idempotency key or integrity check from row contents (DLQ replay batch
ids, export shard manifests): per-row 60-bit sha256 prefixes summed as
DECIMAL(38,0). Commutative and associative (so any aggregation order
gives the same total), overflow-free (38 digits hold 2^60·n for any
real n), and accidental-collision odds ~2^-60 per pair. Centralized
because two drifting copies of an idempotency-critical expression
would silently change batch ids on one side only.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def content_digest(col) -> F.Column:
    """Aggregate expression: order-insensitive digest of a string
    column (use inside .agg())."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(
        F.conv(F.substring(F.sha2(col.cast("binary"), 256), 1, 15), 16, 10).cast(
            "decimal(38,0)"
        )
    )
