"""PK-change (rename) splitting: planted-case final state, randomized
equivalence against a pure-Python resolver, zero-Exchange plan audit,
and the seq-overflow guard."""

import random

import pytest
from pyspark.sql import functions as F

from chunker_spark.cdc.dblog import resolve_final_state
from chunker_spark.cdc.keychange import split_key_changes, rename_fixture_path

KEYS = ["repo", "path"]


def _final(spark, events) -> dict:
    split = split_key_changes(events, KEYS)
    out = resolve_final_state(split, KEYS, out_seq_col="seq")
    return {(r["repo"], r["path"]): r["content"] for r in out.collect()}


def test_planted_rename_cases(spark):
    got = _final(spark, spark.read.parquet(rename_fixture_path()))
    assert got == {
        ("repo-0", "x.py"): "body-a1",       # chain a->b->c then onto x.py
        ("repo-0", "keep.py"): "body-keep7",
        ("repo-0", "a.py"): "body-new-a9",   # re-created at the vacated path
        ("repo-0", "m.py"): "body-m13",      # cross-repo move landed
        ("repo-1", "n.py"): "body-n14",
        # b.py, c.py, gone.py, moved.py, repo-1/m.py: tombstoned
    }


def _python_truth(rows) -> dict:
    """Final {key: content} interpreting old-key updates as renames."""
    st = {}
    for repo, path, orepo, opath, seq, op, content in sorted(
        rows, key=lambda r: r[4]
    ):
        old = (orepo or repo, opath or path)
        if op != "d" and (orepo is not None or opath is not None) and old != (repo, path):
            st.pop(old, None)
        if op == "d":
            st.pop((repo, path), None)
        else:
            st[(repo, path)] = content
    return st


def test_randomized_equivalence(spark):
    for seed in (3, 29):
        rng = random.Random(seed)
        paths = [f"f{i}.py" for i in range(12)]
        live, rows = set(), []
        for seq in range(1, 140):
            p = rng.choice(paths)
            roll = rng.random()
            if roll < 0.25 and live:
                src = rng.choice(sorted(live))
                if src != p:  # rename src -> p (partial old image half the time)
                    rows.append(
                        ("r", p, None if rng.random() < 0.5 else "r", src,
                         seq, "u", f"v{seq}")
                    )
                    live.discard(src)
                    live.add(p)
                    continue
            if roll < 0.4 and p in live:
                rows.append(("r", p, None, None, seq, "d", None))
                live.discard(p)
            else:
                rows.append(("r", p, None, None, seq, "c", f"v{seq}"))
                live.add(p)
        df = spark.createDataFrame(
            rows,
            "repo string, path string, old_repo string, old_path string, "
            "seq long, op string, content string",
        )
        assert _final(spark, df) == _python_truth(rows), seed


def test_map_only_zero_exchange(spark):
    """The split itself is two projections + a union: NO Exchange, no
    Python — embarrassingly parallel at any scale."""
    df = spark.read.parquet(rename_fixture_path())
    split = split_key_changes(df, KEYS)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = split._jdf.queryExecution().explainString(jmode)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_seq_overflow_guard(spark):
    df = spark.createDataFrame(
        [("r", "a", None, None, 1 << 62, "c", "v")],
        "repo string, path string, old_repo string, old_path string, "
        "seq long, op string, content string",
    )
    with pytest.raises(Exception, match="cannot double-pack"):
        split_key_changes(df, KEYS).collect()


def test_input_validation(spark):
    df = spark.read.parquet(rename_fixture_path())
    with pytest.raises(ValueError, match="missing column"):
        split_key_changes(df.drop("old_path"), KEYS)


def test_no_split_rows_pass_through_with_packed_seq(spark):
    df = spark.read.parquet(rename_fixture_path())
    split = split_key_changes(df, KEYS)
    plain = {r["seq"] for r in df.collect()}
    out = {r["seq"] for r in split.collect()}
    assert {2 * s + 1 for s in plain} <= out  # every original row survives
    # exactly the 5 key-changing updates synthesize tombstones
    assert len(out - {2 * s + 1 for s in plain}) == 5