"""Type-widening schema evolution (chunker_spark.cdc.widening).

Unit-pins the Iceberg promotion rules, the evolve_schema merge, and —
the part that actually matters for a lake — a two-generation parquet
proof that Spark 4's vectorized reader widens older int32/float files
at scan time under the wider declared schema, so a widening never
forces a rewrite.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from chunker_spark.cdc.widening import (
    SchemaEvolutionError,
    evolve_schema,
    is_safe_widening,
    widen,
)


def test_promotion_rules():
    assert is_safe_widening(IntegerType(), LongType())
    assert is_safe_widening(FloatType(), DoubleType())
    assert is_safe_widening(DecimalType(10, 2), DecimalType(14, 2))
    assert is_safe_widening(LongType(), LongType())
    # narrowings and cross-family moves are all unsafe
    assert not is_safe_widening(LongType(), IntegerType())
    assert not is_safe_widening(DoubleType(), FloatType())
    assert not is_safe_widening(IntegerType(), DoubleType())  # Iceberg: no int->double
    assert not is_safe_widening(StringType(), LongType())
    assert not is_safe_widening(DecimalType(14, 2), DecimalType(10, 2))
    assert not is_safe_widening(DecimalType(10, 2), DecimalType(14, 3))  # scale change


def test_widen_is_symmetric_max():
    assert widen(IntegerType(), LongType()) == LongType()
    assert widen(LongType(), IntegerType()) == LongType()
    with pytest.raises(SchemaEvolutionError):
        widen(StringType(), LongType())


def test_evolve_add_widen_rename():
    current = StructType(
        [
            StructField("repo", StringType(), False),
            StructField("size", IntegerType(), True),
            StructField("score", FloatType(), True),
        ]
    )
    incoming = StructType(
        [
            StructField("repo", StringType(), False),
            StructField("size", LongType(), True),  # widening
            StructField("quality", FloatType(), True),  # rename -> score
            StructField("branch", StringType(), True),  # add
        ]
    )
    evolved = evolve_schema(current, incoming, renames={"quality": "score"})
    by_name = {f.name: f.dataType for f in evolved.fields}
    assert by_name == {
        "repo": StringType(),
        "size": LongType(),
        "score": FloatType(),
        "branch": StringType(),
    }
    # current-first field order, adds appended
    assert [f.name for f in evolved.fields] == ["repo", "size", "score", "branch"]


def test_evolve_keeps_untouched_columns_and_rejects_narrowing():
    current = StructType([StructField("n", LongType(), True), StructField("k", StringType(), True)])
    # a batch that only carries n (k untouched) is fine
    evolved = evolve_schema(current, StructType([StructField("n", LongType(), True)]))
    assert [f.name for f in evolved.fields] == ["n", "k"]
    # but a batch claiming n:string must be rejected loudly
    with pytest.raises(SchemaEvolutionError, match="column 'n'"):
        evolve_schema(current, StructType([StructField("n", StringType(), True)]))


def test_parquet_scan_time_widening(spark, tmp_path):
    """Two writer generations, one declared schema: gen-1 wrote
    (size:int, score:float), gen-2 writes (size:long, score:double).
    Reading BOTH files under the evolved schema must return exact
    values from each generation — the promotion happens in the scan,
    no rewrite of gen-1 files."""
    gen1_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("size", IntegerType(), True),
            StructField("score", FloatType(), True),
        ]
    )
    gen2_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("size", LongType(), True),
            StructField("score", DoubleType(), True),
        ]
    )
    d = str(tmp_path / "lake")
    spark.createDataFrame(
        [Row(id=1, size=2**30, score=1.5), Row(id=2, size=7, score=-0.25)], gen1_schema
    ).write.mode("append").parquet(d)
    spark.createDataFrame(
        [Row(id=3, size=2**40, score=3.75)], gen2_schema
    ).write.mode("append").parquet(d)

    declared = evolve_schema(gen1_schema, gen2_schema)
    got = {r.id: (r.size, r.score) for r in spark.read.schema(declared).parquet(d).collect()}
    assert got == {1: (2**30, 1.5), 2: (7, -0.25), 3: (2**40, 3.75)}
    by_name = {f.name: f.dataType for f in spark.read.schema(declared).parquet(d).schema.fields}
    assert by_name["size"] == LongType() and by_name["score"] == DoubleType()
