"""Per-query shuffle/input volume audit — noise-immune scale evidence.

Wall-clock numbers on this host swing 2-3x with co-tenant interference
(BENCH/BASELINE.md), but the BYTES a query shuffles are a pure function
of plan + data: they don't care who else is on the box. This harness
runs every `queries()` entry once at the target sf and records, per
query, the input rows scanned, shuffle bytes written and shuffle rows
written, attributed via the Spark UI REST API (stage totals diffed
around each query; queries run strictly sequentially; each query runs
once through a noop sink — full column evaluation — and once as the
row count).

Why it matters at 100 TB: shuffle volume is THE cost driver of a
distributed plan. A query whose shuffle bytes are a small fraction of
its input is map-dominated and scales with input bandwidth; a query
shuffling multiples of its input will be network-bound. The audit
makes the repo's "fixed-width rows only" claims falsifiable per query.

Usage: python bench/shuffle_audit.py [sf_dir] [out.jsonl]
Prints one JSON line per query plus a total line; writes the same to
out.jsonl (default BENCH/shuffle_<sfname>.jsonl).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(ui: str) -> dict:
    with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
    ) as r:
        stages = json.load(r)
    return {
        # NOTE inputBytes is NOT used: on local[] file:// scans the
        # Hadoop-FS byte statistic under-reports by >100x (verified);
        # record counts and shuffle-write metrics are exact.
        "input_records": sum(s.get("inputRecords", 0) for s in stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_write_records": sum(s.get("shuffleWriteRecords", 0) for s in stages),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH", f"shuffle_{sf_name}.jsonl"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("shuffle-audit")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" if (
        spark.sparkContext.uiWebUrl
    ) else "http://localhost:4049"

    import __spark_entry__ as entry

    rows = []
    before = _stage_totals(ui)
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            # noop sink, not count(): count() lets Spark prune a
            # map-only plan down to parquet-footer row counts, hiding
            # its true input volume; noop evaluates every column of
            # every row JVM-side and discards them
            df.write.format("noop").mode("overwrite").save()
            n = df.count()
            after = _stage_totals(ui)
            rec = {
                "query": name,
                "rows": n,
                "input_rows": after["input_records"] - before["input_records"],
                "shuffle_mb": round(
                    (after["shuffle_write_bytes"] - before["shuffle_write_bytes"]) / 1e6, 3
                ),
                "shuffle_rows": after["shuffle_write_records"]
                - before["shuffle_write_records"],
            }
            before = after
        except Exception as e:  # keep auditing the rest
            rec = {"query": name, "error": str(e)[:200]}
            before = _stage_totals(ui)
        rows.append(rec)
        print(json.dumps(rec))

    total = {
        "query": "__total__",
        "sf_dir": sf_dir,
        "input_rows": sum(r.get("input_rows", 0) for r in rows),
        "shuffle_mb": round(sum(r.get("shuffle_mb", 0) for r in rows), 3),
        "shuffle_rows": sum(r.get("shuffle_rows", 0) for r in rows),
        "queries": len(rows),
        "errors": sum(1 for r in rows if "error" in r),
    }
    rows.append(total)
    print(json.dumps(total))
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
