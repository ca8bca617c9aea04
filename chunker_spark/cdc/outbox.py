"""Transactional-outbox event routing (the Debezium "Outbox Event
Router" pattern, re-expressed as one declarative projection).

Pattern (public Debezium docs / Richardson's microservices.io): a
service avoids the dual-write problem by INSERTing a domain-event row
into an ``outbox`` table inside the SAME local transaction as its state
change; CDC tails that table and re-publishes each insert as a domain
event whose destination is derived from ``aggregatetype``. Three rules
define the router:

* only INSERTs are events — updates never happen, and deletes are the
  documented cleanup idiom (services delete the outbox row immediately
  after insert so the table stays empty), so ``op != 'c'`` is dropped;
* destination = ``route_prefix + aggregatetype`` and the partition key
  is ``aggregateid`` (events for one aggregate stay totally ordered);
* the envelope transport is at-least-once, so consumers deduplicate on
  the event ``id`` (a UUID the producer wrote) — we fold that into the
  router as a deterministic keep-first-by-seq.

Scale shape: one ``from_json`` projection plus one window over
``event_id`` — fixed-width rows (the payload string is carried, never
parsed), no Python anywhere, and the dedup window partitions by the
high-cardinality event id so there is no skew by construction. Routing
fan-out to per-destination sinks then rides the existing
``route_batch`` machinery (``router.py``) with ``destination`` as the
table column.

Reference anchor: the reference engine (a byte-stream chunker,
src/chunker/*.d) has no messaging layer; this module exists because the
north-star brief is a CDC ingest engine and the outbox is the standard
way application events enter such a pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .envelopes import _DEBEZIUM_SCHEMA, _packed_binlog_seq

#: canonical output columns, in order
OUTBOX_COLUMNS = (
    "event_id",
    "destination",
    "aggregate_id",
    "event_type",
    "seq",
    "ts",
    "payload",
)


def route_outbox(
    raw: DataFrame,
    value_col: str = "value",
    *,
    table: str | None = "outbox",
    route_prefix: str = "outbox.event.",
    dedup_ids: bool = True,
) -> DataFrame:
    """Debezium envelopes of the outbox table -> routed domain events.

    Parameters
    ----------
    raw : DataFrame with a JSON-string ``value_col`` (Debezium envelope
        per row — the same wire shape ``parse_debezium`` reads).
    table : keep only envelopes whose ``source.table`` equals this (the
        outbox stream usually shares a topic/binlog with other tables);
        ``None`` skips the filter.
    route_prefix : prepended to ``aggregatetype`` to form
        ``destination`` (Debezium default ``outbox.event.``).
    dedup_ids : drop redelivered envelopes, keeping the lowest-``seq``
        copy of each ``event_id`` (at-least-once transport -> effectively
        exactly-once routing; deterministic, so a replay produces the
        identical frame).

    Returns the columns in ``OUTBOX_COLUMNS``. Malformed JSON, non-insert
    ops, and rows missing id/aggregatetype/aggregateid are dropped — the
    caller that needs a DLQ splits with ``split_malformed`` first.
    """
    env = F.from_json(F.col(value_col), _DEBEZIUM_SCHEMA)
    after = env["after"]
    seq = F.coalesce(
        F.element_at(env["source"], "lsn").try_cast("long"),
        _packed_binlog_seq(
            F.element_at(env["source"], "file"),
            F.element_at(env["source"], "pos"),
        ),
    )
    routed = raw.select(
        env["op"].alias("_op"),
        F.element_at(env["source"], "table").alias("_src_table"),
        F.element_at(after, "id").alias("event_id"),
        F.concat(
            F.lit(route_prefix), F.element_at(after, "aggregatetype")
        ).alias("destination"),
        F.element_at(after, "aggregateid").alias("aggregate_id"),
        F.element_at(after, "type").alias("event_type"),
        seq.alias("seq"),
        F.timestamp_millis(env["ts_ms"]).alias("ts"),
        F.element_at(after, "payload").alias("payload"),
    )
    keep = (
        (F.col("_op") == "c")
        & F.col("event_id").isNotNull()
        & F.col("aggregate_id").isNotNull()
        & F.col("destination").isNotNull()
        & F.col("seq").isNotNull()
    )
    if table is not None:
        keep = keep & (F.col("_src_table") == table)
    routed = routed.where(keep).drop("_op", "_src_table")
    if dedup_ids:
        w = Window.partitionBy("event_id").orderBy(F.col("seq").asc())
        routed = (
            routed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    return routed.select(*OUTBOX_COLUMNS)


def outbox_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic outbox-envelope fixture (parquet, one
    ``value`` JSON string column) once and return its path. 52 envelopes:
    36 outbox inserts over 3 aggregate types (order/customer/shipment),
    4 redeliveries of existing event ids (at-least-once duplicates), 6
    cleanup deletes + 2 updates on the outbox table (non-events), 3 rows
    from a different table sharing the stream, and 1 malformed payload.
    pyarrow-written so oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/outbox_v1.parquet"
    if os.path.exists(path):
        return path

    types = ("order", "customer", "shipment")

    def env(op, lsn, k, src_table="outbox"):
        agg = types[k % 3]
        row = {
            "id": f"evt-{k:04d}",
            "aggregatetype": agg,
            "aggregateid": f"{agg}-{k % 7}",
            "type": f"{agg}.changed",
            "payload": json.dumps({"k": k, "rev": lsn}, sort_keys=True),
        }
        body = {
            "op": op,
            "ts_ms": 1700000000000 + lsn * 1000,
            "before": row if op == "d" else None,
            "after": None if op == "d" else row,
            "source": {"lsn": str(lsn), "db": "app", "table": src_table},
        }
        return json.dumps(body, sort_keys=True)

    values = []
    lsn = 0
    for k in range(36):  # the domain events
        lsn += 1
        values.append(env("c", lsn, k))
    for k in (2, 9, 17, 30):  # redelivered ids (higher seq, must lose)
        lsn += 1
        values.append(env("c", lsn, k))
    for k in range(0, 12, 2):  # cleanup deletes: not events
        lsn += 1
        values.append(env("d", lsn, k))
    for k in (5, 6):  # updates: not events either
        lsn += 1
        values.append(env("u", lsn, k))
    for k in range(3):  # another table sharing the stream
        lsn += 1
        values.append(env("c", lsn, 100 + k, src_table="accounts"))
    values.append('{"op": "c", truncated')  # malformed

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
