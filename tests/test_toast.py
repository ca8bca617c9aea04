"""Unchanged-TOAST placeholder fill: planted-case fixture, randomized
equivalence against a pure-Python resolver, and the single-Exchange
plan audit."""

import random

import pytest
from pyspark.sql import functions as F

from chunker_spark.cdc.toast import (
    DEBEZIUM_UNAVAILABLE as PH,
    fill_unavailable,
    toast_fixture_path,
)

KEYS = ["repo", "path"]


def _filled(spark, df, cols=("content", "meta")):
    out = fill_unavailable(df, KEYS, list(cols))
    return {
        (r["repo"], r["path"], r["seq"]): tuple(
            [r[c] for c in cols] + [r["toast_unresolved"]]
        )
        for r in out.collect()
    }


def test_planted_cases(spark):
    got = _filled(spark, spark.read.parquet(toast_fixture_path()))

    def k(i, seq):
        return (f"repo-{i % 2}", f"src/f{i:03d}.py", seq)

    # chain of placeholders resolves to the last real write
    assert got[k(0, 2)] == ("body-v1:0", "m2:0", 0)
    assert got[k(0, 3)] == ("body-v1:0", "m2:0", 0)
    assert got[k(0, 9)] == ("body-v9:0", "m2:0", 0)
    # honest NULL carries: the placeholder resolves to NULL, resolved
    assert got[k(1, 3)] == (None, "m2:1", 0)
    # delete fences: fills from the re-insert, not the old incarnation
    assert got[k(2, 4)] == ("new-incarnation:2", "m4:2", 0)
    # placeholder after delete with no re-insert: unresolvable, loud
    assert got[k(3, 3)] == (None, "m3:3", 1)
    # stream tailed mid-history: first event already a placeholder
    assert got[k(4, 5)] == (None, "m5:4", 1)
    # alternating staleness across two columns
    assert got[k(5, 2)] == ("body-v1:5", "m2:5", 0)
    assert got[k(5, 3)] == ("body-v3:5", "m2:5", 0)
    assert got[k(5, 4)] == ("body-v3:5", "m4:5", 0)
    # non-placeholder rows pass through untouched
    assert got[k(0, 1)] == ("body-v1:0", "m1:0", 0)


def _python_truth(rows):
    """{(key, seq): (content, unresolved)} by direct per-key replay."""
    out, last, seg = {}, {}, {}
    for key, seq, op, v in sorted(rows):
        s = seg.get(key, 0)
        if op == "d":
            s += 1
            seg[key] = s
            out[(key, seq)] = (v, 0)
            continue
        if v == PH:
            carried = last.get(key)
            if carried is not None and carried[0] == s:
                out[(key, seq)] = (carried[1], 0)
            else:
                out[(key, seq)] = (None, 1)
        else:
            last[key] = (s, v)
            out[(key, seq)] = (v, 0)
    return out


def test_randomized_equivalence(spark):
    for seed in (5, 17):
        rng = random.Random(seed)
        rows = []
        for i in range(25):
            key = f"k{i}"
            for seq in range(1, 1 + rng.randint(3, 14)):
                op = rng.choices(["c", "u", "d"], weights=[2, 6, 1])[0]
                v = (
                    None
                    if op == "d"
                    else rng.choice([PH, PH, f"v{seq}:{key}", None])
                )
                rows.append((key, seq, op, v))
        df = spark.createDataFrame(
            [("r", k, s, op, v) for k, s, op, v in rows],
            "repo string, path string, seq long, op string, content string",
        )
        got = {
            (r["path"], r["seq"]): (r["content"], r["toast_unresolved"])
            for r in fill_unavailable(df, KEYS, ["content"]).collect()
            if r["op"] != "d"
        }
        ops = {(k, s): op for k, s, op, _ in rows}
        truth = {
            ks: v for ks, v in _python_truth(rows).items() if ops[ks] != "d"
        }
        assert got == truth, seed


def test_single_exchange_plan(spark):
    """Segment counter + every column's carry ride one window spec:
    exactly ONE hash Exchange on the key, no Python."""
    df = spark.read.parquet(toast_fixture_path())
    out = fill_unavailable(df, KEYS, ["content", "meta"])
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = out._jdf.queryExecution().explainString(jmode)
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_input_validation(spark):
    df = spark.read.parquet(toast_fixture_path())
    with pytest.raises(ValueError, match="missing column"):
        fill_unavailable(df.drop("op"), KEYS, ["content"])
    with pytest.raises(ValueError, match="string-typed"):
        fill_unavailable(
            df.withColumn("n", F.lit(1)), KEYS, ["n"]
        )


def test_delete_op_code_matches_typed_event_schema(spark):
    """The engine's typed events use I/U/D — with delete_op='D' the
    delete fence and the not-a-source rule hold; with the lowercase
    default they would silently break on this frame (the review trap
    this parameter exists for)."""
    df = spark.createDataFrame(
        [
            ("r", "a", 1, "I", "v1"),
            ("r", "a", 2, "D", "v1"),   # delete row carries a before-image
            ("r", "a", 3, "U", PH),     # placeholder after delete, no re-insert
        ],
        "repo string, path string, seq long, op string, content string",
    )
    out = {
        r["seq"]: (r["content"], r["toast_unresolved"])
        for r in fill_unavailable(
            df, KEYS, ["content"], delete_op="D"
        ).collect()
    }
    # the pre-delete v1 (and the delete row's own image) must NOT fill
    assert out[3] == (None, 1)

    # the wrong code is the documented failure: fence off, v1 leaks
    leaked = {
        r["seq"]: (r["content"], r["toast_unresolved"])
        for r in fill_unavailable(df, KEYS, ["content"]).collect()
    }
    assert leaked[3] == ("v1", 0)


def test_fill_from_state_cross_batch_and_rename(spark):
    """Second-stage fill: placeholders with no in-batch history resolve
    from the sink's current state — under the OLD key for renames —
    and a key absent from state keeps its mark (quarantine candidate)."""
    from chunker_spark.cdc.toast import fill_from_state

    batch = spark.createDataFrame(
        [
            # plain cross-batch placeholder (key exists in state)
            ("r", "a", None, None, 10, "U", PH),
            # rename: previous version lives under the OLD key
            ("r", "b2", None, "b", 11, "U", PH),
            # unresolvable: nowhere in batch or state
            ("r", "ghost", None, None, 12, "U", PH),
            # untouched clean row
            ("r", "c", None, None, 13, "U", "v13"),
        ],
        "repo string, path string, old_repo string, old_path string, "
        "seq long, op string, content string",
    )
    state = spark.createDataFrame(
        [("r", "a", "state-a"), ("r", "b", "state-b")],
        "repo string, path string, content string",
    )
    local = fill_unavailable(
        batch, KEYS, ["content"], delete_op="D", keep_marks=True
    )
    out = {
        r["path"]: (r["content"], r["toast_unresolved"])
        for r in fill_from_state(
            local, state, KEYS, ["content"], old_prefix="old_"
        ).collect()
    }
    assert out["a"] == ("state-a", 0)
    assert out["b2"] == ("state-b", 0)   # resolved across the rename
    assert out["ghost"] == (None, 1)     # still marked, loudly
    assert out["c"] == ("v13", 0)

    with pytest.raises(ValueError, match="keep_marks"):
        fill_from_state(batch, state, KEYS, ["content"])


def test_streaming_toast_fill_cross_batch_with_quarantine(spark, tmp_path):
    """IngestStream(toast_value_cols=['content']): a placeholder whose
    previous version was merged in an EARLIER batch resolves from the
    lake state (old key for the rename), and a genuinely unresolvable
    placeholder row is quarantined under dlq/toast instead of merging a
    fabricated NULL."""
    import glob as _glob
    import json as _json

    from chunker_spark.cdc import LakeTable
    from chunker_spark.cdc.keychange import split_key_changes
    from chunker_spark.cdc.streaming import IngestStream
    from chunker_spark.kernel import ChunkerParams

    def wj(action, lsn, path, content=None, old_path=None):
        body = {"action": action, "lsn": lsn, "table": "files"}
        if action == "D":
            body["identity"] = [{"name": "repo", "value": "r"},
                                {"name": "path", "value": path}]
        else:
            body["columns"] = [{"name": "repo", "value": "r"},
                               {"name": "path", "value": path},
                               {"name": "content", "value": content}]
        if action == "U":
            body["identity"] = [{"name": "repo", "value": "r"},
                                {"name": "path", "value": old_path or path}]
        return _json.dumps(body)

    log_dir = tmp_path / "wal"
    log_dir.mkdir()
    # batch 1: three inserts (merged into the lake first)
    (log_dir / "seg-0.jsonl").write_text("\n".join([
        wj("I", "0/100", "a.sql", "va\n"),
        wj("I", "0/200", "b.sql", "vb\n"),
        wj("I", "0/300", "keep.sql", "vk\n"),
    ]) + "\n")
    # batch 2: cross-batch placeholder update; rename with placeholder
    # (content TOAST'd because it did not change); unresolvable ghost
    (log_dir / "seg-1.jsonl").write_text("\n".join([
        wj("U", "1/100", "a.sql", PH),
        wj("U", "1/200", "b2.sql", PH, old_path="b.sql"),
        wj("U", "1/300", "ghost.sql", PH),
    ]) + "\n")

    lake = LakeTable(spark, str(tmp_path / "lake"), num_buckets=2)
    IngestStream(
        spark, lake, str(log_dir), str(tmp_path / "ckpt"),
        params=ChunkerParams(average_bits=6, min_size=64, max_size=256),
        wire_format="wal2json", max_files_per_trigger=1,
        parser_kwargs={"with_old_keys": True},
        toast_value_cols=["content"],
        event_transform=lambda df: split_key_changes(
            df, ["repo", "path"], delete_op="D"
        ),
    ).run_available()

    state = {r.path: r.content for r in lake.read().collect()}
    assert state == {
        "a.sql": "va\n",      # cross-batch placeholder resolved
        "b2.sql": "vb\n",     # rename + placeholder resolved via old key
        "keep.sql": "vk\n",
    }
    assert "ghost.sql" not in state  # never merged with a fabricated NULL
    q = _glob.glob(f"{lake.root}/dlq/toast/*/*/*.parquet")
    assert q, "quarantine parquet expected"
    qrows = spark.read.parquet(f"{lake.root}/dlq/toast").collect()
    assert [r.path for r in qrows] == ["ghost.sql"]


def test_replay_toast_quarantine_after_missing_version_lands(spark, tmp_path):
    """Out-of-order delivery: the quarantined placeholder UPDATE's base
    version arrives in a LATER batch (lower seq). replay_toast_quarantine
    then resolves it from the lake state, merges it as one
    content-addressed batch, and empties the quarantine; a second replay
    is a no-op."""
    import glob as _glob
    import json as _json
    import os as _os

    from chunker_spark.cdc import LakeTable
    from chunker_spark.cdc.keychange import split_key_changes
    from chunker_spark.cdc.streaming import IngestStream, replay_toast_quarantine
    from chunker_spark.kernel import ChunkerParams

    def wj(action, lsn, path, content=None):
        body = {"action": action, "lsn": lsn, "table": "files",
                "columns": [{"name": "repo", "value": "r"},
                            {"name": "path", "value": path},
                            {"name": "content", "value": content}]}
        if action == "U":
            body["identity"] = [{"name": "repo", "value": "r"},
                                {"name": "path", "value": path}]
        return _json.dumps(body)

    log_dir = tmp_path / "wal"
    log_dir.mkdir()
    (log_dir / "seg-0.jsonl").write_text(
        wj("U", "1/300", "ghost.sql", PH) + "\n"  # arrives BEFORE its insert
    )
    params = ChunkerParams(average_bits=6, min_size=64, max_size=256)
    lake = LakeTable(spark, str(tmp_path / "lake"), num_buckets=2)
    transform = lambda df: split_key_changes(df, ["repo", "path"], delete_op="D")  # noqa: E731

    def run():
        IngestStream(
            spark, lake, str(log_dir), str(tmp_path / "ckpt"), params=params,
            wire_format="wal2json", max_files_per_trigger=1,
            parser_kwargs={"with_old_keys": True},
            toast_value_cols=["content"], event_transform=transform,
        ).run_available()

    run()
    assert {r.path for r in lake.read().collect()} == set()  # quarantined, not merged
    assert _glob.glob(f"{lake.root}/dlq/toast/*/*/*.parquet")

    # the missing base version lands late (lower seq, later batch)
    (log_dir / "seg-1.jsonl").write_text(wj("I", "0/50", "ghost.sql", "vg\n") + "\n")
    run()
    assert {r.path: r.content for r in lake.read().collect()} == {"ghost.sql": "vg\n"}

    res = replay_toast_quarantine(lake, ["content"], params=params, event_transform=transform)
    assert (res["replayed"], res["still_bad"]) == (1, 0)
    state = {r.path: r.content for r in lake.read().collect()}
    assert state == {"ghost.sql": "vg\n"}  # resolved to the unchanged value
    assert not _os.path.isdir(f"{lake.root}/dlq/toast") or not _os.listdir(
        f"{lake.root}/dlq/toast"
    )
    res2 = replay_toast_quarantine(lake, ["content"], params=params, event_transform=transform)
    assert res2["replayed"] == 0  # empty quarantine: no-op


def test_toast_value_cols_validated_at_construction(spark, tmp_path):
    import pytest as _pytest

    from chunker_spark.cdc import LakeTable
    from chunker_spark.cdc.streaming import IngestStream

    lake = LakeTable(spark, str(tmp_path / "lake"), num_buckets=2)
    with _pytest.raises(ValueError, match="not string event columns"):
        IngestStream(spark, lake, str(tmp_path), str(tmp_path / "ckpt"),
                     toast_value_cols=["seq"])
