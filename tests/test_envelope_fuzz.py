"""Adversarial-input robustness for every wire-dialect parser.

The production failure mode this pins: a producer bug (or a corrupted
segment) floods the stream with garbage, and the ingest MUST keep
running — every row either parses clean or lands in the DLQ with its
bytes intact; nothing throws, nothing is silently dropped. The corpus
below is deterministic (seeded stdlib random, no hypothesis dependency
for the Spark-heavy path) and deliberately nasty: truncated JSON,
wrong-typed fields, field-subset dropouts, deep nesting, unicode
control characters, empty strings, JSON scalars at top level.
"""

import json
import random

import pytest
from pyspark.sql import functions as F

from chunker_spark.cdc.envelopes import (
    parse_canal,
    parse_debezium,
    parse_dms,
    parse_goldengate,
    parse_maxwell,
    parse_mongo,
    parse_wal2json,
    split_malformed,
)

PARSERS = [
    parse_debezium,
    parse_maxwell,
    parse_wal2json,
    parse_canal,
    parse_dms,
    parse_mongo,
    parse_goldengate,
]

_TEMPLATE = {
    "op": "c",
    "ts_ms": 1700000000000,
    "after": {"repo": "r1", "path": "a/b.py", "commit": "c1", "lang": "py",
              "content": "print(1)\n"},
    "before": None,
    "source": {"lsn": "123", "file": "binlog.000001", "pos": "4",
               "ts_ms": "1700000000000", "ord": "1", "table": "files"},
    "data": [{"repo": "r1", "path": "a/b.py"}],
    "type": "insert",
    "database": "d", "table": "files", "ts": 1700000000,
    "metadata": {"operation": "insert", "timestamp": "2024-01-01T00:00:00Z"},
    "pos": "00000000010000000042",
    "op_ts": "2024-01-01 00:00:00.000000",
    "xid": 77,
    "change": [{"kind": "insert",
                "columnnames": ["repo", "path", "commit", "lang", "content"],
                "columnvalues": ["r1", "a/b.py", "c1", "py", "x"]}],
}


def _mutations(n: int = 200) -> list[str]:
    rng = random.Random(20260818)
    out: list[str] = []
    keys = list(_TEMPLATE)
    for i in range(n):
        kind = i % 8
        if kind == 0:  # drop a random subset of fields
            keep = [k for k in keys if rng.random() > 0.5]
            out.append(json.dumps({k: _TEMPLATE[k] for k in keep}))
        elif kind == 1:  # retype a field (object -> scalar, num -> str)
            d = json.loads(json.dumps(_TEMPLATE))
            k = rng.choice(keys)
            d[k] = rng.choice([42, "42", [1, 2], {"x": None}, True, None])
            out.append(json.dumps(d))
        elif kind == 2:  # truncate valid JSON mid-way
            s = json.dumps(_TEMPLATE)
            out.append(s[: rng.randrange(1, len(s))])
        elif kind == 3:  # non-JSON garbage / control chars / unicode
            out.append(
                rng.choice([
                    "", " ", "\x00\x01\x02", "nulll", "{{{{", "]" * 40,
                    "\u202e\x00\ud7ff", "-", "NaN", "Infinity",
                ])
            )
        elif kind == 4:  # JSON scalar / array at top level
            out.append(rng.choice(["17", '"just a string"', "[1,2,3]",
                                   "null", "true", "[]", "{}"]))
        elif kind == 5:  # deep nesting
            out.append('{"after":' + "[" * 50 + "]" * 50 + "}")
        elif kind == 6:  # valid envelope with nulled-out identity fields
            d = json.loads(json.dumps(_TEMPLATE))
            d["after"] = {"repo": None, "path": None}
            d["data"] = [{"repo": None, "path": None}]
            out.append(json.dumps(d))
        else:  # duplicate keys / exotic numbers
            out.append('{"op":"c","op":"d","ts_ms":1e400,"after":{"repo":"r","path":"p"}}')
    return out


@pytest.mark.parametrize("parser", PARSERS, ids=lambda p: p.__name__)
def test_parser_total_partition_on_adversarial_corpus(spark, parser):
    """clean + dlq is a PARTITION of the input: no exception, no loss,
    no duplication, every clean row fully keyed, every DLQ row's bytes
    verbatim from the input."""
    corpus = _mutations()
    raw = spark.createDataFrame([(s,) for s in corpus], "value string")
    clean, dlq = split_malformed(raw, parser=parser)
    n_clean, n_dlq = clean.count(), dlq.count()
    assert n_clean + n_dlq == len(corpus)
    # every clean row is applicable: op/seq/repo/path all present
    assert (
        clean.where(
            F.col("op").isNull() | F.col("seq").isNull()
            | F.col("repo").isNull() | F.col("path").isNull()
        ).count() == 0
    )
    # DLQ rows carry the original bytes (replayable after a fix)
    dlq_vals = {r["value"] for r in dlq.collect()}
    assert dlq_vals <= set(corpus)
