"""Schema evolution, part 2: safe type widening (Iceberg promotion
rules) for the declared-schema read path.

``schema.py`` handles the *shape* evolutions the fixtures exercise —
column add (v2 ``branch``) and rename (v3 ``lang``→``language``) — as
field-identity mappings compiled to CASE expressions. This module adds
the third evolution class a long-lived lake hits: a column's physical
type widening across writer generations (a row-count column outgrows
int32, a float metric becomes double). Iceberg's spec allows exactly
three safe promotions — int→long, float→double, decimal(P,S)→
decimal(P',S) with P'≥P — because each is value-preserving for every
representable input; everything else (narrowing, cross-family,
scale changes) silently corrupts or fails per-row, so ``evolve_schema``
raises instead.

Read-path mechanics on Spark 4: the lake reads delta files with an
explicit declared schema (``lake.py`` ``spark.read.schema(FILE_SCHEMA)``),
and the vectorized parquet reader widens int32→int64 / float→double /
decimal-precision per column at scan time (SPARK-40876), so files
written before the widening stay readable forever — no rewrite, the
promotion happens in the scan. ``tests/test_widening.py`` pins that
behavior with a two-generation parquet proof.

Scale shape: pure driver-side StructType arithmetic — nothing here
touches data; the cost of a widening at 100 TB is a metadata commit.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ByteType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)


class SchemaEvolutionError(ValueError):
    """An incoming batch schema requires an unsafe type change."""


#: integer family by width — promotion allowed strictly upward.
#: (Iceberg's spec names int→long; the sub-int types arrive from
#: narrow-typed sources like Avro/JDBC and widen by the same rule.)
_INT_RANK: dict[type, int] = {ByteType: 0, ShortType: 1, IntegerType: 2, LongType: 3}


def is_safe_widening(frm: DataType, to: DataType) -> bool:
    """True iff reading values written as ``frm`` under declared type
    ``to`` is value-preserving (Iceberg promotion rules)."""
    if frm == to:
        return True
    fr, tr = _INT_RANK.get(type(frm)), _INT_RANK.get(type(to))
    if fr is not None and tr is not None:
        return fr < tr
    if isinstance(frm, FloatType) and isinstance(to, DoubleType):
        return True
    if isinstance(frm, DecimalType) and isinstance(to, DecimalType):
        return to.scale == frm.scale and to.precision >= frm.precision
    return False


def widen(a: DataType, b: DataType) -> DataType:
    """The narrower-of-the-two's safe target: ``a`` or ``b`` if one
    safely widens to the other, else raise ``SchemaEvolutionError``."""
    if is_safe_widening(a, b):
        return b
    if is_safe_widening(b, a):
        return a
    raise SchemaEvolutionError(
        f"no safe promotion between {a.simpleString()} and {b.simpleString()}"
    )


def evolve_schema(
    current: StructType,
    incoming: StructType,
    renames: dict[str, str] | None = None,
) -> StructType:
    """Merge an incoming batch schema into the current table schema.

    Rules, in order:

    * ``renames`` maps incoming physical names to current canonical
      names (field identity, Iceberg-style) and is applied first;
    * a field in both: types equal → kept; incoming safely wider →
      promoted (the widening is one-way — a later narrower batch reads
      fine under the wider declared type); anything else →
      ``SchemaEvolutionError``;
    * incoming-only fields append as nullable adds;
    * current-only fields are kept (an untouched column, not a drop —
      column drop is a destructive operation that must be an explicit
      admin action, never inferred from one batch's shape).

    Field order: current fields first (stable positions for readers),
    adds appended in incoming order.
    """
    renames = renames or {}
    incoming_by_name = {
        renames.get(f.name, f.name): f for f in incoming.fields
    }
    out: list[StructField] = []
    for cur in current.fields:
        inc = incoming_by_name.pop(cur.name, None)
        if inc is None:
            out.append(cur)
            continue
        try:
            wide = widen(cur.dataType, inc.dataType)
        except SchemaEvolutionError as e:
            raise SchemaEvolutionError(f"column {cur.name!r}: {e}") from None
        out.append(StructField(cur.name, wide, cur.nullable or inc.nullable))
    for name, inc in incoming_by_name.items():
        out.append(StructField(name, inc.dataType, True))  # adds are nullable
    return StructType(out)
