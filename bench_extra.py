"""Per-query isolation harness (guide §1.4/§1.5) — NOT the driver bench.

Times individual queries with the noop sink so the computation is
measured without the sink, counts the Spark jobs (actions) each query
launches, and dumps .explain("formatted") plans to plans/r06/.

Usage:
  python bench_extra.py [--plans-dir plans/r06] [--suffix before] \
      [--repeats 2] [query ...]

With no query names: runs every query. Prints one JSON line per query:
  {"q": name, "steady_sec": .., "cold_sec": .., "jobs": N, "rows": N}
and a final summary line. Env contract mirrors bench.py
(SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans-dir", default=None, help="dump explain(formatted) here")
    ap.add_argument("--suffix", default="before", help="plan file suffix (before/after)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("chunker-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warm-up as bench.py
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()
    from pyspark.sql import functions as _F

    spark.range(0, 100_000).groupBy(
        (_F.col("id") % 97).cast("string").alias("k")
    ).count().count()

    all_q = entrymod.queries()
    names = args.queries or list(all_q)
    unknown = [n for n in names if n not in all_q]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    results = {}
    for name in names:
        fn = all_q[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"{args.plans_dir}/{name}_{args.suffix}.txt", "w") as fh:
                fh.write(plan)
        times = []
        jobs = rows = 0
        for rep in range(args.repeats):
            group = f"{name}-{rep}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} pass {rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                rows = -1
            else:
                rows = df.count()
            times.append(round(time.time() - t0, 3))
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobDescription(None)
        rec = {
            "q": name,
            "steady_sec": times[-1],
            "cold_sec": times[0],
            "all_sec": times,
            "jobs": jobs,
            "rows": rows,
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)
    total = round(sum(r["steady_sec"] for r in results.values()), 3)
    print(json.dumps({"metric": "isolated_steady_total_sec", "value": total, "n": len(results)}))
    spark.stop()


if __name__ == "__main__":
    main()
