"""applyInPandasWithState running per-repo totals across micro-batches."""

import pandas as pd

from chunker_spark.cdc import GenSpec, gen_events_local, write_segments
from chunker_spark.cdc.events import EVENT_SCHEMA
from chunker_spark.cdc.stateful import running_repo_stats


def test_running_repo_stats_accumulate(spark, tmp_path):
    spec = GenSpec(seed=9, n_keys=20, mean_blocks=2)
    events = list(gen_events_local(spec, 120))
    seg_dir = str(tmp_path / "segments")
    write_segments(spark, spec, 120, seg_dir, n_segments=3)

    out_rows = []

    def sink(df, bid):
        out_rows.extend((bid, r) for r in df.collect())

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seg_dir)
    )
    q = (
        running_repo_stats(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # final emitted totals per repo == batch ground truth over all events
    final = {}
    for bid, r in out_rows:
        final[r["repo"]] = r  # latest trigger wins
    pdf = pd.DataFrame(events)
    for repo, grp in pdf.groupby("repo"):
        r = final[repo]
        assert r["events_total"] == len(grp)
        assert r["bytes_total"] == int(grp["content"].fillna("").str.len().sum())
        assert r["deletes_total"] == int((grp["op"] == "D").sum())
        assert r["max_seq"] == int(grp["seq"].max())
    # state accumulated across multiple triggers (some repo was emitted
    # in more than one micro-batch)
    emitted_per_repo = pd.Series([r["repo"] for _, r in out_rows]).value_counts()
    assert (emitted_per_repo > 1).any()
