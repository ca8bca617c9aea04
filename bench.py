"""Headline benchmark: times every implemented query at a given scale.

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] cores (default 32)

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "rows": {name: n, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("chunker-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session (JVM codegen, python workers, parquet footers)
    # so the first timed query isn't charged cold-start costs; the
    # warmup fans one Arrow task to every core so ALL python workers
    # exist before timing starts (a 1-partition warmup would leave 31
    # cold workers to be paid for by the first pandas-UDF query)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    row_counts: dict[str, int] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as ex:  # keep the bench alive; report the failure
            timings[name] = -1.0
            row_counts[name] = -1
            print(f"query {name} failed: {ex}", file=sys.stderr)
            continue
        timings[name] = round(time.time() - t0, 3)
        row_counts[name] = n

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "rows": row_counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
