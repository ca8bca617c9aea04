"""Log compaction (cdc.logcompact): replay equivalence, tombstone
retention horizon, idempotence, and the latest-per-key contract against
a pandas brute-force oracle."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chunker_spark.cdc import (
    EVENT_SCHEMA,
    GenSpec,
    LakeTable,
    apply_batch,
    compact_log,
    compaction_stats,
    gen_events_local,
)
from chunker_spark.kernel import ChunkerParams

PARAMS = ChunkerParams(average_bits=9, min_size=256, max_size=4096)
SPEC = GenSpec(seed=23, n_keys=50, mean_blocks=3, schema_ver_plan=((120, 2), (240, 3)))
N_EVENTS = 360

COMPARE = ["repo", "path", "commit", "language", "branch", "content_sha256"]


def _events_df(spark, events):
    pdf = pd.DataFrame(events)[[f.name for f in EVENT_SCHEMA.fields]]
    return spark.createDataFrame(pdf, EVENT_SCHEMA)


def _state(lake):
    return {tuple(r) for r in lake.read().select(*COMPARE).collect()}


def test_replay_equivalence_full_vs_compacted(spark, tmp_path):
    """THE compaction contract: applying the compacted log from scratch
    yields the identical final table state as applying the full log —
    including schema evolution riding through untouched, and with every
    pre-horizon tombstone dropped (horizon = end of log, the maximal
    drop a from-scratch replay permits)."""
    events = list(gen_events_local(SPEC, N_EVENTS))
    full = _events_df(spark, events)
    compacted = compact_log(full, tombstone_horizon=N_EVENTS + 1)

    lake_a = LakeTable(spark, str(tmp_path / "full"), num_buckets=4)
    apply_batch(lake_a, full, "b0", params=PARAMS, collect_metrics=False)
    lake_b = LakeTable(spark, str(tmp_path / "compacted"), num_buckets=4)
    apply_batch(lake_b, compacted, "b0", params=PARAMS, collect_metrics=False)

    assert _state(lake_a) == _state(lake_b)
    # and compaction actually removed replay cost on this history
    stats = compaction_stats(full, compacted)
    assert stats["events_dropped"] > 0
    assert stats["events_in"] == N_EVENTS
    assert 0.0 < stats["reduction"] < 1.0


def test_latest_per_key_matches_bruteforce(spark):
    """Every surviving row is the max-seq event of its key, verbatim
    (all columns); row count = number of keys (no horizon)."""
    events = list(gen_events_local(SPEC, N_EVENTS))
    got = compact_log(_events_df(spark, events)).toPandas()

    pdf = pd.DataFrame(events)
    exp = pdf.loc[pdf.groupby(["repo", "path"])["seq"].idxmax()]
    assert len(got) == len(exp)
    g = got.sort_values(["repo", "path"]).reset_index(drop=True)
    e = exp.sort_values(["repo", "path"]).reset_index(drop=True)
    for col in ("repo", "path", "seq", "op", "commit", "content"):
        assert list(g[col].fillna("~")) == list(e[col].fillna("~")), col


def test_tombstone_horizon_split(spark):
    """Planted: an old winning tombstone (seq < horizon) is dropped, a
    recent one (seq >= horizon) is kept, and a winning UPSERT below the
    horizon is never dropped (the horizon ages only deletes)."""
    rows = [
        # key a: deleted long ago -> dropped at horizon 100
        ("r", "a", 5, "I", "c1", "x"),
        ("r", "a", 7, "D", "c2", None),
        # key b: deleted recently -> kept
        ("r", "b", 150, "I", "c3", "y"),
        ("r", "b", 160, "D", "c4", None),
        # key c: old upsert wins -> kept regardless of age
        ("r", "c", 3, "I", "c5", "z"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, seq long, op string, commit string, content string")
    out = {r["path"]: (r["op"], r["seq"]) for r in compact_log(df, tombstone_horizon=100).collect()}
    assert "a" not in out
    assert out["b"] == ("D", 160)
    assert out["c"] == ("I", 3)
    # no horizon: every winner survives, including the stale tombstone
    keep_all = {r["path"] for r in compact_log(df).collect()}
    assert keep_all == {"a", "b", "c"}


def test_compaction_idempotent(spark):
    """compact(compact(log)) == compact(log) — a compacted log is a
    fixed point, so re-running the maintenance job is always safe."""
    events = list(gen_events_local(SPEC, 200))
    once = compact_log(_events_df(spark, events), tombstone_horizon=90)
    twice = compact_log(once, tombstone_horizon=90)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_custom_op_code_and_validation(spark):
    """delete_op parameterization (the lowercase-dialect trap from the
    round-4 review) and the construction-time missing-column error."""
    rows = [("r", "a", 1, "insert", "x"), ("r", "a", 2, "delete", None)]
    df = spark.createDataFrame(rows, "repo string, path string, seq long, op string, content string")
    assert compact_log(df, tombstone_horizon=10, delete_op="delete").count() == 0
    # default 'D' would NOT recognize the lowercase tombstone
    assert compact_log(df, tombstone_horizon=10).count() == 1
    with pytest.raises(ValueError, match="missing columns"):
        compact_log(df.drop("seq"))


def test_compacted_log_plan_single_shuffle(spark):
    """Scale-shape audit: the compaction plan contains exactly one
    Exchange (the key aggregation) and plans as partial->final hash
    aggregation so map-side combine collapses per-key history before
    the shuffle."""
    events = list(gen_events_local(SPEC, 200))
    plan = compact_log(_events_df(spark, events))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "max_by" in plan or "HashAggregate" in plan
