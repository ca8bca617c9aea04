"""Confluent-Avro wire seam (cdc/wire_avro.py): everything provable
without the spark-avro jar — the binary frame splitter (pure JVM
exprs), the frame/split round-trip through the existing Debezium JSON
parser (proves the framing preserves payload bytes end-to-end and both
funnels converge on EVENT_SCHEMA), the pinned reader schema's field
compatibility with the JSON path, and the construction guard. Mirrors
the Kafka seam's jar-less test strategy (test_kafka_seam.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from chunker_spark.cdc.envelopes import _DEBEZIUM_SCHEMA, parse_debezium
from chunker_spark.cdc.wire_avro import (
    DEBEZIUM_AVRO_VALUE_SCHEMA,
    avro_available,
    confluent_frame,
    confluent_split,
    decode_confluent,
)


def _dbz(op, lsn, repo="r1", path="a.py", content="x = 1\n"):
    img = {"repo": repo, "path": path, "commit": "c1", "lang": "py",
           "content": content, "schema_ver": "1"}
    env = {
        "op": op,
        "ts_ms": 1709251200000 + lsn,
        "before": img if op == "d" else None,
        "after": None if op == "d" else img,
        "source": {"lsn": str(lsn), "table": "files"},
    }
    return json.dumps(env)


def _frames_df(spark, payloads_ids):
    rows = [Row(value=v) for v in payloads_ids]
    return spark.createDataFrame(rows, "value binary")


def test_confluent_split_good_and_malformed_frames(spark):
    good = b"\x00" + (77).to_bytes(4, "big") + b'{"op":"c"}'
    big_id = b"\x00" + (2**31 - 1).to_bytes(4, "big") + b"payload"
    wrong_magic = b"\x01" + (77).to_bytes(4, "big") + b'{"op":"c"}'
    short = b"\x00\x00\x00"
    out = {
        bytes(r["value"]): r
        for r in confluent_split(
            _frames_df(spark, [good, big_id, wrong_magic, short])
        ).collect()
    }
    g = out[good]
    assert g["frame_ok"] and g["schema_id"] == 77
    assert bytes(g["payload"]) == b'{"op":"c"}'
    assert out[big_id]["schema_id"] == 2**31 - 1  # int32 range, unsigned hex conv
    for bad in (wrong_magic, short):
        r = out[bad]
        assert r["frame_ok"] is False
        assert r["schema_id"] is None and r["payload"] is None


def test_frame_split_roundtrip_through_debezium_parser(spark):
    """JSON payloads framed with confluent_frame, split back, then fed
    to parse_debezium must equal parsing the unframed JSON directly —
    byte preservation + funnel convergence, no Avro jar needed."""
    payloads = [_dbz("c", 10), _dbz("u", 11), _dbz("d", 12)]
    plain = spark.createDataFrame([Row(value=p) for p in payloads], "value string")
    framed = _frames_df(spark, [p.encode() for p in payloads]).select(
        confluent_frame(F.col("value"), schema_id=42).alias("value")
    )
    split = confluent_split(framed)
    assert split.where(~F.col("frame_ok")).count() == 0
    assert split.select("schema_id").distinct().collect()[0][0] == 42
    via_frame = parse_debezium(
        split.select(F.col("payload").cast("string").alias("value"))
    )
    direct = parse_debezium(plain)
    assert sorted(map(tuple, via_frame.collect())) == sorted(
        map(tuple, direct.collect())
    )
    ops = {r["op"] for r in via_frame.collect()}
    assert ops == {"I", "U", "D"}


def test_pinned_reader_schema_matches_json_path():
    """The Avro reader schema's fields must stay in lockstep with the
    JSON path's _DEBEZIUM_SCHEMA (same names, all optional) so both
    wire formats decode to the same struct shape."""
    avro = json.loads(DEBEZIUM_AVRO_VALUE_SCHEMA)
    avro_fields = {f["name"] for f in avro["fields"]}
    assert avro_fields == set(_DEBEZIUM_SCHEMA.fieldNames())
    for f in avro["fields"]:
        assert isinstance(f["type"], list) and f["type"][0] == "null", f
        assert f["default"] is None


def test_decode_guard_without_jar(spark):
    """This sandbox has no spark-avro jar: the guard must see that and
    decode_confluent must refuse construction with the submit recipe."""
    if avro_available(spark):  # pragma: no cover - jar-present environments
        pytest.skip("spark-avro present; guard path not applicable")
    df = _frames_df(spark, [b"\x00\x00\x00\x00\x01abc"])
    with pytest.raises(RuntimeError, match="--packages org.apache.spark:spark-avro"):
        decode_confluent(spark, df)
