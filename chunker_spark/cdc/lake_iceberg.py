"""Iceberg-backed sink: the drop-in replacement for the built-in lake.

SURVEY.md §7.3.3 keeps the table format behind a small interface so the
engine can target real Apache Iceberg when its runtime jar is on the
classpath: ``MERGE INTO`` for the upsert, snapshot summary properties
for the exactly-once batch-id ledger. This sandbox has no Iceberg jar
(no network), so construction raises unless the catalog is actually
configured — the built-in merge-on-read lake (lake.py) implements the
same contract (append deltas, LWW resolution, atomic commits,
idempotent batch ids) in pure Spark + parquet and is what tests and
benches run against.

Interface parity with ``lake.LakeTable``:
    committed_batch_ids() / read() / append_delta(delta, touched, id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schema import KEY_COLS


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergLakeTable:
    """Same sink contract as lake.LakeTable, on an Iceberg catalog table."""

    BATCH_PROP = "chunker-spark.batch-id"

    def __init__(self, spark: SparkSession, table: str) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use cdc.lake.LakeTable "
                "(the built-in merge-on-read format with identical semantics)"
            )
        self.spark = spark
        self.table = table

    def committed_batch_ids(self) -> set[str]:
        rows = self.spark.sql(
            f"SELECT summary['{self.BATCH_PROP}'] AS b FROM {self.table}.snapshots"
        ).collect()
        return {r["b"] for r in rows if r["b"] is not None}

    def read(self) -> DataFrame:
        return self.spark.read.table(self.table)

    def append_delta(self, delta_rows: DataFrame, touched, batch_id: str, stats=None) -> dict:
        """MERGE INTO keyed on (repo, path): update/insert upserts,
        delete tombstones; then stamp the snapshot with the batch id."""
        delta_rows.createOrReplaceTempView("__cdc_delta")
        on = " AND ".join(f"t.{c} = s.{c}" for c in KEY_COLS)
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING __cdc_delta s ON {on}
            WHEN MATCHED AND s.deleted AND s.seq > t.seq THEN DELETE
            WHEN MATCHED AND NOT s.deleted AND s.seq > t.seq THEN UPDATE SET *
            WHEN NOT MATCHED AND NOT s.deleted THEN INSERT *
            """
        )
        self.spark.sql(
            f"ALTER TABLE {self.table} SET TBLPROPERTIES ('{self.BATCH_PROP}'='{batch_id}')"
        )
        return {"batch_id": str(batch_id), "table": self.table, "stats": stats or {}}
