"""Local simulation of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count + sorted-column value frame. Usable as a
script for quick iteration (not collected by pytest directly;
tests/test_entry.py wraps it)."""

from __future__ import annotations

import math

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df):
    """pandas frame -> canonical sorted string grid for hashing.

    Dtype-faithful on purpose: a float64 128.0 renders "128.0", an
    int64 128 renders "128" — so an oracle returning HUGEINT-via-float
    where Spark returns BIGINT fails here exactly like it fails in the
    driver's hash compare (round-1 events_gap_audit lesson)."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(float(v), 9))  # float(): numpy 2.x repr wraps np.float64
        return str(v)

    grid = df.map(cell)
    rows = sorted("|".join(r) for r in grid.itertuples(index=False, name=None))
    return rows


def compare_query(spark, sf_dir: str, name: str, qfn, sql: str | None):
    spark_pdf = qfn(spark, sf_dir).toPandas()
    result = {"name": name, "rows": len(spark_pdf), "oracle": sql is not None}
    if sql is None:
        result["status"] = "rows-only"
        return result
    con = duckdb_conn(sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    con.close()
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    result["oracle_rows"] = len(b)
    if len(a) != len(b):
        result["status"] = "ROWCOUNT MISMATCH"
    elif sorted(spark_pdf.columns.str.lower()) != sorted(duck_pdf.columns.str.lower()):
        result["status"] = f"SCHEMA MISMATCH {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    elif a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        result["status"] = f"VALUE MISMATCH e.g. {diff}"
    else:
        result["status"] = "ok"
    return result


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare_query(spark, sf_dir, name, fn, oracles.get(name))
        except Exception as ex:
            r = {"name": name, "status": f"ERROR {type(ex).__name__}: {ex}"}
            import traceback
            traceback.print_exc()
        print(r, flush=True)
        if r["status"] not in ("ok", "rows-only"):
            failures += 1
    print(f"failures: {failures}")
    return failures


if __name__ == "__main__":
    import sys

    argv = sys.argv[1:]
    if argv and "/" in argv[0]:
        raise SystemExit(main(sf_dir=argv[0], only=argv[1:] or None))
    raise SystemExit(main(only=argv or None))
