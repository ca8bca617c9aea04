#!/usr/bin/env python3
"""Stage-level N->4N scaling of the dominant parallel stage.

Measures the scan -> Arrow -> manifest-pandas-UDF -> aggregate stage
(the parallelizable part of ingest: no LWW shuffle, no commit, no
ledger serial section) over the same segment directory at two
parallelism levels, back-to-back so both land in the same host noise
regime (tight-pair protocol, BENCH/BASELINE.md "Host noise").

This decomposes the end-to-end ladder number: end-to-end N->4N =
(serial section + this stage) under Amdahl; if this stage scales ~1.0
the residual gap in the end-to-end ladder is the serial section plus
host bandwidth, not the engine.

Usage: python bench/stage_scaling.py [SEG_DIR] [P_LO] [P_HI]
Defaults: /dev/shm/cdc-seg-6400k 1 4
"""
import json
import os
import sys
import time


def run(seg_dir: str, par: int):
    from pyspark.sql import SparkSession, functions as F
    from chunker_spark.functions.manifest import manifest_udf
    from chunker_spark.kernel import ChunkerParams

    spark = (SparkSession.builder.master(f"local[{par}]")
             .config("spark.sql.shuffle.partitions", str(max(8, 4 * par)))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "12g")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    params = ChunkerParams(average_bits=13, min_size=2048, max_size=65536)
    df = spark.read.parquet(seg_dir)
    nbytes = df.select(F.sum(F.length(F.col("content").cast("binary")))).collect()[0][0]
    t0 = time.time()
    (df.select(F.size(manifest_udf(params)(F.col("content"))).alias("n"))
       .select(F.sum("n")).collect())
    dt = time.time() - t0
    spark.stop()
    return nbytes, dt


def main():
    seg = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/cdc-seg-6400k"
    p_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    p_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    # pin the numpy kernel unless the caller overrides, for comparability
    os.environ.setdefault("CHUNKER_NATIVE", "0")
    out = {}
    for par in (p_lo, p_hi):
        nb, dt = run(seg, par)
        mbs = nb / dt / 1e6
        out[f"p{par}"] = {"gb": round(nb / 1e9, 1), "sec": round(dt, 1),
                          "mb_s": round(mbs, 1)}
        print(f"p{par}: {nb/1e9:.1f} GB in {dt:.1f}s = {mbs:.1f} MB/s", flush=True)
    eff = out[f"p{p_hi}"]["mb_s"] / (out[f"p{p_lo}"]["mb_s"] * (p_hi / p_lo))
    out["efficiency"] = round(eff, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
