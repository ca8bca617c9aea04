"""DBLog chunk-interleaved snapshot: planted-case fixture, randomized
equivalence against a pure-Python replay truth, and the plan audit.

The truth oracle everywhere here is the SAME independent computation:
replay initial-state + the full change log by seq (plain LWW, drop
tombstones) — no watermarks, no chunks. The interleave must converge
to it from (chunks, changes) alone.
"""

import random

from pyspark.sql import functions as F

from chunker_spark.cdc.dblog import (
    dblog_fixture_paths,
    interleave_snapshot,
    resolve_final_state,
)

KEYS = ["repo", "path"]


def _truth(initial: dict, script: list) -> dict:
    """{key: content} after replaying the full log over initial state."""
    st = dict(initial)
    for s, op, k, content in sorted(script):
        if op == "d":
            st.pop(k, None)
        else:
            st[k] = content
    return st


def _resolved(spark, changes, chunks) -> dict:
    out = resolve_final_state(
        interleave_snapshot(changes, chunks, KEYS), KEYS
    )
    return {(r["repo"], r["path"]): r["content"] for r in out.collect()}


def _fixture_frames(spark):
    p = dblog_fixture_paths()
    return (
        spark.read.parquet(p["initial"]),
        spark.read.parquet(p["changes"]),
        spark.read.parquet(p["chunks"]),
    )


def test_fixture_final_state_equals_log_replay_truth(spark):
    initial, changes, chunks = _fixture_frames(spark)
    truth = _truth(
        {(r["repo"], r["path"]): r["content"] for r in initial.collect()},
        [
            (r["seq"], r["op"], (r["repo"], r["path"]), r["content"])
            for r in changes.collect()
        ],
    )
    assert _resolved(spark, changes, chunks) == truth


def test_planted_cases(spark):
    """Each planted failure mode individually — a broken window-drop or
    a wrong out_seq ordering flips a specific key's final content."""
    _initial, changes, chunks = _fixture_frames(spark)
    got = _resolved(spark, changes, chunks)

    def k(i):
        return (f"repo-{i // 20}", f"src/f{i:03d}.py")

    assert got[k(1)] == "v3:1"     # pre-lw update rides the chunk
    assert got[k(3)] == "v13:3"    # stale chunk copy dropped, log wins
    assert k(4) not in got         # in-window delete not resurrected
    assert got[k(5)] == "v20:5"    # post-hw update beats the chunk by LWW
    assert k(6) not in got         # post-hw delete beats the chunk
    assert got[k(7)] == "v0:7"     # snapshot-only key delivered by chunk
    assert got[k(23)] == "v35:23"  # last of two in-window updates wins
    assert k(24) not in got        # deleted before the chunk read
    assert got[k(25)] == "v33:25"  # delete + in-window re-insert survives
    assert got[k(22)] == "v34:22"  # inserted after the chunk read
    assert k(42) not in got        # chunk-2 in-window delete
    assert got[k(48)] == "v58:48"  # log-only key (post-hw insert)
    assert k(49) not in got        # never existed anywhere
    assert got[k(0)] == "v65:0"    # late update over a surviving chunk row


def test_randomized_equivalence(spark):
    """Random logs + random chunk schedules, chunk contents simulated
    by replaying the log to each chunk's read position (what a SELECT
    against the live table sees). Final state must equal the plain
    log-replay truth for every schedule."""
    for seed in (11, 23, 47):
        rng = random.Random(seed)
        n_keys, n_events = 40, 120
        keys = [(f"r{i % 4}", f"f{i:03d}") for i in range(n_keys)]
        initial = {keys[i]: f"init:{i}" for i in range(n_keys) if rng.random() < 0.6}

        # three chunks over the PK order, selected at increasing log
        # positions with non-overlapping (lw, hw) windows; watermark
        # seqs themselves are reserved (no change event occupies them)
        bounds = sorted(rng.sample(range(5, n_events - 5), 6))
        plan = []  # (lo_i, hi_i, lw, hw, read_at)
        for c in range(3):
            lw, hw = bounds[2 * c], bounds[2 * c + 1]
            plan.append(
                (c * 14, min(n_keys, (c + 1) * 14 if c < 2 else n_keys),
                 lw, hw, rng.randint(lw + 1, hw - 1) if hw - lw > 1 else lw)
            )
        reserved = {b for c in range(3) for b in bounds[2 * c:2 * c + 2]}

        script, used = [], set(reserved)
        for _ in range(n_events):
            s = rng.randint(1, n_events * 2)
            while s in used:
                s += 1
            used.add(s)
            k = keys[rng.randrange(n_keys)]
            op = rng.choices(["c", "u", "d"], weights=[3, 4, 2])[0]
            script.append((s, op, k, None if op == "d" else f"v{s}:{k[1]}"))
        script.sort()

        def state_at(p):
            st = dict(initial)
            for s, op, k, content in script:
                if s > p:
                    break
                if op == "d":
                    st.pop(k, None)
                else:
                    st[k] = content
            return st

        chunk_rows = []
        for lo, hi, lw, hw, p in plan:
            st = state_at(p)
            for i in range(lo, hi):
                if keys[i] in st:
                    chunk_rows.append((*keys[i], lw, hw, st[keys[i]]))

        changes = spark.createDataFrame(
            [(k[0], k[1], s, op, c) for s, op, k, c in script],
            "repo string, path string, seq long, op string, content string",
        )
        chunks = spark.createDataFrame(
            chunk_rows, "repo string, path string, lw_seq long, hw_seq long, content string"
        )
        assert _resolved(spark, changes, chunks) == _truth(initial, script), seed


def test_plan_no_nested_loop_and_slim_change_side(spark):
    """The window-drop must plan as an EQUI anti join with the range as
    a residual filter — never a nested loop — and the change side of
    that join must carry only (key, seq): change payloads do not
    shuffle for the dedup."""
    _initial, changes, chunks = _fixture_frames(spark)
    stream = interleave_snapshot(changes, chunks, KEYS)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = stream._jdf.queryExecution().explainString(jmode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "_dbl_seq" in line:
            assert "content" not in line, line


def test_input_validation(spark):
    import pytest

    _initial, changes, chunks = _fixture_frames(spark)
    with pytest.raises(ValueError, match="missing column"):
        interleave_snapshot(changes.drop("seq"), chunks, KEYS)
    with pytest.raises(ValueError, match="missing column"):
        interleave_snapshot(changes, chunks.drop("hw_seq"), KEYS)
    with pytest.raises(ValueError, match="payload"):
        interleave_snapshot(changes, chunks.drop("content"), KEYS)


def test_resolve_delete_op_code(spark):
    """resolve_final_state(delete_op='D'): uppercase tombstones drop;
    the lowercase default would resurrect the deleted key."""
    stream = spark.createDataFrame(
        [("r", "a", "U", 2, "v1"), ("r", "a", "D", 4, None)],
        "repo string, path string, op string, out_seq long, content string",
    )
    assert resolve_final_state(stream, KEYS, delete_op="D").count() == 0
    assert resolve_final_state(stream, KEYS).count() == 1  # wrong code: resurrect


def test_interleave_seq_overflow_guard(spark):
    import pytest

    changes = spark.createDataFrame(
        [("r", "a", 1 << 62, "c", "v")],
        "repo string, path string, seq long, op string, content string",
    )
    chunks = spark.createDataFrame(
        [], "repo string, path string, lw_seq long, hw_seq long, content string"
    )
    with pytest.raises(Exception, match="cannot double-pack"):
        interleave_snapshot(changes, chunks, KEYS).collect()
