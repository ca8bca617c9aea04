"""Cross-dialect wire-envelope conformance corpus (VERDICT r4 item 5).

ONE logical change history, encoded in all seven supported dialects with
each dialect's *documented* edge noise interleaved, must normalize to
the SAME EVENT_SCHEMA rows. Noise must be DROPPED (a healthy stream is
full of it), never dead-lettered; genuinely undecodable rows must be
dead-lettered, never silently dropped. Sources for the edge shapes are
the dialects' public docs:

* Debezium: tombstone record (null Kafka value) after every delete
  (debezium.io/documentation: "tombstone events").
* Maxwell: bootstrap-start / bootstrap-insert / bootstrap-complete rows
  (maxwells-daemon.io/bootstrapping; bootstrap rows have null position).
* wal2json v2: B(egin)/C(ommit) transaction frames, T(runcate),
  M(essage) lines carrying no row image.
* Canal: DDL FlatMessages (isDdl=true, data=null).
* AWS DMS: control records (metadata.record-type="control") for task
  lifecycle / DDL.
* Debezium MongoDB: updateDescription-only updates (no full document)
  are undecodable by contract -> DLQ, not silently dropped.
* GoldenGate: TRUNCATE ops (op_type="T") dropped; primary-key-updating
  U ops surface the old key from ``before`` for the key-change split.

The logical history (keys are (repo, path), LWW on seq):
    1. INSERT  r/a.py  "v1\\n"
    2. UPDATE  r/a.py  "v2\\n"
    3. INSERT  r/b.py  "w1\\n"
    4. DELETE  r/a.py
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

EXPECTED = [
    ("I", "a.py", "v1\n"),
    ("U", "a.py", "v2\n"),
    ("I", "b.py", "w1\n"),
    ("D", "a.py", None),
]


def _dbz(op, lsn, path, content=None):
    img = {"repo": "r", "path": path}
    if content is not None:
        img["content"] = content
    return json.dumps({
        "op": op, "ts_ms": 1700000000000 + lsn,
        "before": img if op == "d" else None,
        "after": None if op == "d" else img,
        "source": {"lsn": str(lsn)},
    })


def _mxw(typ, pos, path=None, content=None, data=None):
    body = {"type": typ, "ts": 1700000000}
    if pos is not None:
        body["position"] = f"mysql-bin.000001:{pos}"
    if data is not None:
        body["data"] = data
    elif path is not None:
        d = {"repo": "r", "path": path}
        if content is not None:
            d["content"] = content
        body["data"] = d
    return json.dumps(body)


def _wj(action, lsn=None, path=None, content=None, xid=None):
    body = {"action": action}
    if xid is not None:
        body["xid"] = xid
    if lsn is not None:
        body["lsn"] = lsn
    if action in ("I", "U"):
        cols = [{"name": "repo", "value": "r"}, {"name": "path", "value": path}]
        if content is not None:
            cols.append({"name": "content", "value": content})
        body["columns"] = cols
    if action == "D":
        body["identity"] = [{"name": "repo", "value": "r"},
                            {"name": "path", "value": path}]
    return json.dumps(body)


def _canal(typ, mid, path=None, content=None, is_ddl=False, sql=None):
    body = {"id": mid, "database": "db", "table": "files",
            "type": typ, "isDdl": is_ddl, "es": 1700000000000,
            "ts": 1700000001000}
    if is_ddl:
        body["sql"] = sql or "ALTER TABLE files ADD COLUMN note TEXT"
        body["data"] = None
    else:
        d = {"repo": "r", "path": path}
        if content is not None:
            d["content"] = content
        body["data"] = [d]
    return json.dumps(body)


def _dms(op, txn, path=None, content=None, control=None):
    meta = {"record-type": "control" if control else "data",
            "operation": control or op,
            "timestamp": "2024-03-01T00:00:00.000000Z",
            "schema-name": "s", "table-name": "files",
            "transaction-id": str(txn), "transaction-record-id": "0"}
    d = {}
    if path is not None:
        d = {"repo": "r", "path": path}
        if content is not None:
            d["content"] = content
    return json.dumps({"data": d, "metadata": meta})


def _mongo(op, sec, ordn, path=None, content=None, doc=None):
    if doc is None and path is not None:
        d = {"repo": "r", "path": path}
        if content is not None:
            d["content"] = content
        doc = json.dumps(d)
    return json.dumps({
        "op": op, "ts_ms": sec * 1000,
        "before": doc if op == "d" else None,
        "after": None if op == "d" else doc,
        "source": {"ts_ms": sec * 1000, "ord": ordn, "collection": "files"},
    })


def _gg(op, rba, path=None, content=None, before=None, after=None):
    body = {"table": "PDB.S.FILES", "op_type": op,
            "op_ts": "2024-03-01 00:00:00.000000",
            "pos": f"0000000001{rba:010d}",
            "primary_keys": ["repo", "path"]}
    if before is not None:
        body["before"] = before
    if after is not None:
        body["after"] = after
    if before is None and after is None and path is not None:
        img = {"repo": "r", "path": path}
        if content is not None:
            img["content"] = content
        body["before" if op == "D" else "after"] = img
    return json.dumps(body)


# each corpus: (payload-or-None)* — None is a Kafka tombstone record
CORPUS = {
    "debezium": [
        _dbz("c", 1, "a.py", "v1\n"),
        _dbz("u", 2, "a.py", "v2\n"),
        _dbz("c", 3, "b.py", "w1\n"),
        _dbz("d", 4, "a.py"),
        None,  # tombstone-after-delete: compaction hint, not an event
    ],
    "maxwell": [
        _mxw("bootstrap-start", None, data={}),
        _mxw("insert", 100, "a.py", "v1\n"),
        _mxw("update", 200, "a.py", "v2\n"),
        _mxw("bootstrap-complete", None, data={}),
        _mxw("insert", 300, "b.py", "w1\n"),
        _mxw("delete", 400, "a.py"),
    ],
    "wal2json": [
        _wj("B", xid=77),
        _wj("I", "0/100", "a.py", "v1\n"),
        _wj("U", "0/200", "a.py", "v2\n"),
        _wj("C", xid=77),
        _wj("T"),  # TRUNCATE between transactions
        _wj("B", xid=78),
        _wj("M"),  # logical message
        _wj("I", "0/300", "b.py", "w1\n"),
        _wj("D", "0/400", "a.py"),
        _wj("C", xid=78),
    ],
    "canal": [
        _canal("INSERT", 1, "a.py", "v1\n"),
        _canal("UPDATE", 2, "a.py", "v2\n"),
        _canal("ALTER", 3, is_ddl=True),
        _canal("INSERT", 4, "b.py", "w1\n"),
        _canal("DELETE", 5, "a.py"),
    ],
    "dms": [
        _dms("insert", 1, "a.py", "v1\n"),
        _dms("update", 2, "a.py", "v2\n"),
        _dms(None, 3, control="create-table"),
        _dms("insert", 4, "b.py", "w1\n"),
        _dms("delete", 5, "a.py"),
    ],
    "mongo": [
        _mongo("c", 1700000001, 1, "a.py", "v1\n"),
        _mongo("u", 1700000002, 1, "a.py", "v2\n"),
        _mongo("c", 1700000003, 1, "b.py", "w1\n"),
        _mongo("d", 1700000004, 1, "a.py"),
        None,  # Kafka tombstone (Debezium transport, same contract)
    ],
    "goldengate": [
        _gg("I", 100, "a.py", "v1\n"),
        _gg("U", 200, "a.py", "v2\n"),
        _gg("T", 250),  # TRUNCATE: no row image, dropped
        _gg("I", 300, "b.py", "w1\n"),
        _gg("D", 400, "a.py"),
    ],
}


def _parse(spark, dialect, payloads, **kw):
    from chunker_spark.cdc.envelopes import WIRE_PARSERS, split_malformed

    raw = spark.createDataFrame([(p,) for p in payloads], "value string")
    parser = WIRE_PARSERS[dialect]
    if kw:
        import functools

        parser = functools.partial(parser, **kw)
    return split_malformed(raw, parser=parser)


@pytest.mark.parametrize("dialect", sorted(CORPUS))
def test_same_logical_history_normalizes_identically(spark, dialect):
    clean, dlq = _parse(spark, dialect, CORPUS[dialect])
    rows = clean.orderBy("seq").select("op", "path", "content").collect()
    assert [(r.op, r.path, r.content) for r in rows] == EXPECTED, dialect
    # documented noise is dropped, never dead-lettered
    assert dlq.count() == 0, f"{dialect}: noise rows dead-lettered"
    # seqs are strictly increasing (orderable) and ops keyed correctly
    seqs = [r.seq for r in clean.orderBy("seq").select("seq").collect()]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


def test_bootstrap_and_full_load_rows_order_before_any_cdc(spark):
    """Maxwell bootstrap-insert and DMS full-load rows are snapshot
    upserts: both land at seq 0, so any CDC change to the same key wins
    LWW regardless of the snapshot/CDC phases' incomparable clocks."""
    clean_m, dlq_m = _parse(
        spark, "maxwell",
        [_mxw("bootstrap-start", None, data={}),
         _mxw("bootstrap-insert", None, "seed.py", "s0\n"),
         _mxw("bootstrap-complete", None, data={}),
         _mxw("update", 100, "seed.py", "s1\n")],
    )
    rows = {r.seq: (r.op, r.content) for r in clean_m.collect()}
    assert dlq_m.count() == 0
    assert rows[0] == ("I", "s0\n") and len(rows) == 2
    assert min(s for s in rows if s != 0) > 0

    clean_d, dlq_d = _parse(
        spark, "dms",
        [_dms("load", 999, "seed.py", "s0\n"),
         _dms("update", 1, "seed.py", "s1\n")],
    )
    rows = {r.seq: (r.op, r.content) for r in clean_d.collect()}
    assert dlq_d.count() == 0
    assert rows[0] == ("I", "s0\n") and len(rows) == 2


def test_undecodable_rows_dead_letter_not_drop(spark):
    """The inverse contract: rows a dialect documents as UNRESOLVABLE
    must surface in the DLQ with their original payload."""
    # Mongo updateDescription-only update: no full document image
    upd_only = json.dumps({
        "op": "u", "ts_ms": 1700000001000,
        "updateDescription": {"updatedFields": "{\"content\": \"x\"}"},
        "source": {"ts_ms": 1700000001000, "ord": 1, "collection": "files"},
    })
    clean, dlq = _parse(spark, "mongo", [upd_only])
    assert clean.count() == 0
    assert [r.value for r in dlq.collect()] == [upd_only]

    # GoldenGate pos of the wrong width: unorderable
    bad_pos = json.loads(_gg("I", 1, "a.py", "x\n"))
    bad_pos["pos"] = "123"
    bad_pos = json.dumps(bad_pos)
    clean, dlq = _parse(spark, "goldengate", [bad_pos])
    assert clean.count() == 0
    assert [r.value for r in dlq.collect()] == [bad_pos]

    # broken JSON dead-letters in every dialect
    for dialect in sorted(CORPUS):
        clean, dlq = _parse(spark, dialect, ["{{{ not json"])
        assert clean.count() == 0, dialect
        assert dlq.count() == 1, dialect


def test_goldengate_pk_update_feeds_keychange_split(spark):
    """A GoldenGate primary-key-changing UPDATE (rename) carries the old
    key in ``before``; with_old_keys surfaces it and the key-change
    split turns the row into D(old)+I(new) exactly like the other
    old-image dialects."""
    from chunker_spark.cdc.keychange import split_key_changes

    payloads = [
        _gg("I", 100, "old.py", "v1\n"),
        _gg("U", 200, before={"repo": "r", "path": "old.py"},
            after={"repo": "r", "path": "new.py", "content": "v1\n"}),
    ]
    clean, dlq = _parse(spark, "goldengate", payloads, with_old_keys=True)
    assert dlq.count() == 0
    ev = split_key_changes(clean, ["repo", "path"], delete_op="D")
    got = [(r.op, r.path) for r in ev.orderBy("seq", "op").collect()]
    # the canonical pair: tombstone at the old key, upsert (original op)
    # at the new key — and no upsert left targeting the old key
    assert ("D", "old.py") in got and ("U", "new.py") in got
    assert ("U", "old.py") not in got
