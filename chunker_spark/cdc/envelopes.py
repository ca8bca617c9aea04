"""Wire-format envelope parsers: Debezium / Maxwell JSON -> EVENT_SCHEMA.

Real binlog/WAL tails arrive as JSON envelopes on a message bus, not as
typed parquet. These parsers normalize the two most common envelope
dialects into this engine's ``EVENT_SCHEMA`` rows so the rest of the
pipeline (``normalize_events`` -> ``apply_batch``) is wire-agnostic,
mirroring how the reference's event model is keyed by (repo, path, seq)
with I/U/D ops (see /root/reference/src/chunker/package.d:444-481 for
the replay semantics the downstream engine must preserve).

Scale notes: parsing is a single JVM-side ``from_json`` projection — no
Python, no shuffle, fully pipelined into the scan; a malformed-record
side channel (``_corrupt`` rows) is split out with a cheap filter on
the same pass, so one scan serves both the clean stream and the DLQ.

Debezium envelope (unwrapped payload):
    {"op": "c|u|d|r", "ts_ms": 123,
     "before": {...row...} | null, "after": {...row...} | null,
     "source": {"ts_ms": ..., "lsn"/"pos": <offset>, ...}}

Maxwell envelope:
    {"type": "insert|update|delete", "ts": <epoch-s>,
     "position": "<binlog pos>", "data": {...row...}}

wal2json envelope (Postgres logical decoding, format-version 2 —
one JSON line per change):
    {"action": "I|U|D", "lsn": "hi/lo" (hex), "timestamp": "...",
     "schema": "public", "table": "files",
     "columns": [{"name": ..., "type": ..., "value": ...}, ...],
     "identity": [{"name": ..., "value": ...}, ...]}   (old keys, U/D)
plus transaction-control lines {"action": "B"|"C"} and TRUNCATEs
{"action": "T"} which carry no row and are dropped (not DLQ'd).

Canal envelope (Alibaba Canal "FlatMessage" JSON for MySQL — the only
dialect here whose messages are MULTI-ROW: one binlog event batch per
message, row images in a ``data`` ARRAY):
    {"id": <batch id>, "database": ..., "table": ...,
     "type": "INSERT|UPDATE|DELETE" (DDL kinds when isDdl),
     "isDdl": false, "es": <source epoch-ms>, "ts": <process epoch-ms>,
     "data": [{...row...}, ...], "old": [{...changed cols...}, ...]}

AWS DMS envelope (Kinesis/Kafka target, one JSON object per record):
    {"data": {...row...},
     "metadata": {"record-type": "data"|"control",
                  "operation": "load|insert|update|delete",
                  "timestamp": "...Z", "schema-name": ..., "table-name": ...,
                  "transaction-id": ..., "transaction-record-id": ...}}
full-load rows order at seq 0 (written once, before CDC); control
records are dropped (not DLQ'd).

Debezium MongoDB envelope (the schemaless dialect — row images are
extended-JSON document STRINGS, not structured records, because a Mongo
collection has no fixed schema for the connector to emit):
    {"op": "c|u|d|r", "ts_ms": 123,
     "before": "<json doc>" | null, "after": "<json doc>" | null,
     "source": {"rs": ..., "collection": ..., "ts_ms": <sec*1000>,
                "ord": <per-second counter>}}
requires full-document capture (capture.mode=
change_streams_update_full_with_pre_image): deletes carry the full
pre-image in ``before``; an updateDescription-only update or a
pre-image-less delete has no row image and goes to the DLQ.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# The row images are parsed as map<string,string>: CDC row payloads are
# schema-evolving by nature (that is the point of this engine), so the
# envelope layer must not bake a row schema in. Typed casting happens
# in normalize_events against the declared schema_ver.
_DEBEZIUM_SCHEMA = StructType(
    [
        StructField("op", StringType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("before", MapType(StringType(), StringType()), True),
        StructField("after", MapType(StringType(), StringType()), True),
        StructField("source", MapType(StringType(), StringType()), True),
    ]
)

_MAXWELL_SCHEMA = StructType(
    [
        StructField("type", StringType(), True),
        StructField("ts", LongType(), True),
        StructField("position", StringType(), True),
        StructField("table", StringType(), True),
        StructField("data", MapType(StringType(), StringType()), True),
        # UPDATE old-image: only the CHANGED columns' previous values
        # (Maxwell contract) — the partial shape split_key_changes
        # coalesces component-wise
        StructField("old", MapType(StringType(), StringType()), True),
    ]
)

#: Debezium op codes -> engine ops ('r' = snapshot read = upsert)
_DEBEZIUM_OPS = {"c": "I", "u": "U", "d": "D", "r": "I"}
#: Maxwell's bootstrap (initial table sync) interleaves with the binlog
#: stream: bootstrap-insert rows are snapshot upserts (seq 0, the same
#: before-any-CDC contract as a DMS full-load row); bootstrap-start /
#: bootstrap-complete are progress markers with an empty ``data`` and
#: are dropped before projection (docs: maxwells-daemon.io/bootstrapping)
_MAXWELL_OPS = {"insert": "I", "update": "U", "delete": "D", "bootstrap-insert": "I"}
_MAXWELL_NON_ROW_TYPES = ("bootstrap-start", "bootstrap-complete")
#: wal2json v2 actions are already I/U/D; B(egin)/C(ommit)/T(runcate)
#: carry no row image and are dropped before projection
_WAL2JSON_OPS = {"I": "I", "U": "U", "D": "D"}
_WAL2JSON_NON_ROW_ACTIONS = ("B", "C", "T", "M")  # M = logical message

_NAME_VALUE = ArrayType(
    StructType(
        [
            StructField("name", StringType(), True),
            StructField("value", StringType(), True),
        ]
    )
)

_WAL2JSON_SCHEMA = StructType(
    [
        StructField("action", StringType(), True),
        StructField("xid", LongType(), True),  # include-xids=true
        StructField("lsn", StringType(), True),
        StructField("timestamp", StringType(), True),
        StructField("schema", StringType(), True),
        StructField("table", StringType(), True),
        StructField("columns", _NAME_VALUE, True),
        StructField("identity", _NAME_VALUE, True),
    ]
)

_CANAL_OPS = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}

#: AWS DMS operations ('load' = full-load snapshot row = upsert)
_DMS_OPS = {"load": "I", "insert": "I", "update": "U", "delete": "D"}

_DMS_SCHEMA = StructType(
    [
        StructField("data", MapType(StringType(), StringType()), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

# Debezium MongoDB: before/after are extended-JSON STRINGS (shredded by
# a second from_json into map<string,string>), never structured records.
_MONGO_SCHEMA = StructType(
    [
        StructField("op", StringType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("before", StringType(), True),
        StructField("after", StringType(), True),
        StructField("source", MapType(StringType(), StringType()), True),
    ]
)

_CANAL_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("database", StringType(), True),
        StructField("table", StringType(), True),
        StructField("type", StringType(), True),
        StructField("isDdl", StringType(), True),  # tolerate true/"true"
        StructField("es", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("data", ArrayType(MapType(StringType(), StringType())), True),
        StructField("old", ArrayType(MapType(StringType(), StringType())), True),
    ]
)

#: Oracle GoldenGate (Big Data Kafka handler, JSON "op" format) op
#: types. 'T' (truncate) carries no row image and is DROPPED before
#: projection, like wal2json's B/C/T control lines. Primary-key updates
#: surface as 'U' with the complete new image in ``after``.
_GOLDENGATE_OPS = {"I": "I", "U": "U", "D": "D"}

_GOLDENGATE_SCHEMA = StructType(
    [
        StructField("table", StringType(), True),
        StructField("op_type", StringType(), True),
        StructField("op_ts", StringType(), True),
        StructField("current_ts", StringType(), True),
        StructField("pos", StringType(), True),
        StructField("primary_keys", ArrayType(StringType()), True),
        StructField("before", MapType(StringType(), StringType()), True),
        StructField("after", MapType(StringType(), StringType()), True),
    ]
)


def _op_expr(col, mapping: dict[str, str]):
    expr = F.lit(None).cast("string")
    for wire, op in reversed(mapping.items()):
        expr = F.when(col == wire, F.lit(op)).otherwise(expr)
    return expr


#: seq packing for MySQL binlog coordinates: seq = file_ordinal * 2^40 + offset.
#: Binlog offsets RESET on log rotation, so the offset alone is
#: non-monotonic across files and LWW would silently resolve to stale
#: rows. 2^40 bytes (~1.1 TB) exceeds any real max_binlog_size (MySQL
#: caps it at 1 GB), so offsets never overflow into the file bits, and
#: file ordinals keep 23 high bits (~8M rotations) before sign trouble.
BINLOG_PACK_SHIFT = 40


def _packed_binlog_seq(file_col, offset_col):
    """(binlog file name/ordinal, offset) -> one totally-ordered long.

    ``file_col`` may be a full binlog file name ('mysql-bin.000123') —
    the trailing digit run is the ordinal. Null/absent file packs as
    ordinal 0 (single-file / non-rotating sources keep their raw
    offset). Null offset stays null: an unordered event cannot be
    LWW-resolved and must go to the DLQ.
    """
    # try_cast everywhere: a malformed coordinate is a DLQ row (null
    # seq), never an ANSI cast error that kills the micro-batch
    ordinal = F.coalesce(
        F.regexp_extract(file_col.cast("string"), r"(\d+)\s*$", 1).try_cast("long"),
        F.lit(0),
    )
    offset = offset_col.try_cast("long")
    return F.when(
        offset.isNotNull(),
        F.shiftleft(ordinal, BINLOG_PACK_SHIFT) + offset,
    )


def _row_field(img, name: str):
    return F.element_at(img, name)


def _old_key_extra(old_img, is_u):
    """The ``with_old_keys`` projection, stated once for every dialect:
    the update old-image's key components land as ``old_repo``/
    ``old_path`` (null on non-U rows and absent components — partial
    images coalesce inside ``keychange.split_key_changes``)."""
    return [
        F.when(is_u, _row_field(old_img, "repo")).alias("old_repo"),
        F.when(is_u, _row_field(old_img, "path")).alias("old_path"),
    ]


def _event_projection(op, seq, ts, img, extra=()) -> tuple:
    """Common projection from a parsed envelope to EVENT_SCHEMA order,
    as a tuple of Column expressions (no DataFrame bound)."""
    return (
        seq.try_cast("long").alias("seq"),
        ts.alias("ts"),
        op.alias("op"),
        _row_field(img, "repo").alias("repo"),
        _row_field(img, "path").alias("path"),
        _row_field(img, "commit").alias("commit"),
        _row_field(img, "lang").alias("lang"),
        _row_field(img, "language").alias("language"),
        _row_field(img, "branch").alias("branch"),
        _row_field(img, "content").alias("content"),
        F.coalesce(_row_field(img, "schema_ver").cast("int"), F.lit(1)).alias("schema_ver"),
        *extra,
    )


def _project_event(parsed: DataFrame, op, seq, ts, img, extra=()) -> DataFrame:
    """Common projection from a parsed envelope to EVENT_SCHEMA order."""
    return parsed.select(*_event_projection(op, seq, ts, img, extra))


# Per-process parser-plan cache. A parser's expression tree depends
# ONLY on (value_col, option flags) — never on the input DataFrame —
# yet it was re-built Column by Column on every call: ~150-250 py4j
# round trips per dialect, ~0.1-0.2 s per query build and per
# streaming micro-batch re-plan (measured). Each dialect's plan
# (envelope from_json column, row filters, final projection) is built
# once per process and the SAME unresolved Column objects are reused —
# pure expression metadata, no data, no results, no session state
# (same per-process contract as the parquet schema cache in
# __spark_entry__._pq). Columns hold py4j refs into the driver JVM, so
# the cache assumes one JVM gateway per process (true for every entry
# point in this repo: bench, tests, streaming drivers).


def _apply_plan(raw: DataFrame, plan) -> DataFrame:
    env_col, filters, explode, proj = plan
    parsed = raw.withColumn("_env", env_col)
    for flt in filters:
        parsed = parsed.where(flt)
    if explode is not None:
        parsed = parsed.select("*", explode)
    return parsed.select(*proj)


def parse_debezium(
    raw: DataFrame,
    value_col: str = "value",
    keep_raw: bool = False,
    with_old_keys: bool = False,
) -> DataFrame:
    """Debezium JSON envelope column -> EVENT_SCHEMA rows.

    ``seq`` is taken from ``source.lsn`` (Postgres: already monotonic).
    MySQL sources carry ``source.file`` + ``source.pos`` instead — the
    offset resets on binlog rotation, so the fallback packs
    ``file_ordinal * 2^40 + pos`` (see ``_packed_binlog_seq``) to keep
    the total order the LWW resolution keys on. Delete events carry
    their row image in ``before``; everything else in ``after``.
    ``keep_raw`` appends the original payload as ``_raw`` (for the DLQ
    split).

    ``with_old_keys=True`` appends ``old_repo``/``old_path`` from the
    update ``before`` image (present under REPLICA IDENTITY FULL /
    MySQL binlog_row_image=FULL). Defensive parity only: Debezium
    normally splits PK-changing updates into DELETE+INSERT at the
    source, so this matters for producers configured otherwise.
    """
    return _apply_plan(raw, _debezium_plan(value_col, bool(keep_raw), bool(with_old_keys)))


@lru_cache(maxsize=None)
def _debezium_plan(value_col: str, keep_raw: bool, with_old_keys: bool):
    env = F.col("_env")
    op = _op_expr(env["op"], _DEBEZIUM_OPS)
    img = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    seq = F.coalesce(
        F.element_at(env["source"], "lsn").try_cast("long"),
        _packed_binlog_seq(
            F.element_at(env["source"], "file"),
            F.element_at(env["source"], "pos"),
        ),
    )
    ts = F.timestamp_millis(env["ts_ms"])
    extra = [F.element_at(env["source"], "table").alias("src_table")]
    if with_old_keys:
        extra.extend(_old_key_extra(env["before"], env["op"] == "u"))
    if keep_raw:
        extra.append(F.col(value_col).alias("_raw"))
    return (
        F.from_json(F.col(value_col), _DEBEZIUM_SCHEMA),
        (),
        None,
        _event_projection(op, seq, ts, img, extra),
    )


def parse_maxwell(
    raw: DataFrame,
    value_col: str = "value",
    keep_raw: bool = False,
    with_old_keys: bool = False,
) -> DataFrame:
    """Maxwell JSON envelope column -> EVENT_SCHEMA rows.

    ``position`` is a binlog coordinate string like
    ``'mysql-bin.000123:4521'``; ``seq`` packs the file ordinal and the
    offset (``ordinal * 2^40 + offset``) because offsets reset on log
    rotation — see ``_packed_binlog_seq``. A bare-offset position (no
    file part) packs as ordinal 0, i.e. the raw offset.

    Bootstrap rows (see ``_MAXWELL_OPS``): ``bootstrap-insert`` is a
    snapshot upsert at ``seq 0`` (its ``position`` is null — the row
    comes from a table scan, not the binlog — and Maxwell writes each
    key's snapshot once, before/alongside the CDC tail, so any binlog
    change must beat it: the DMS full-load contract); ``bootstrap-start``
    / ``bootstrap-complete`` markers carry no row and are dropped.

    ``with_old_keys=True`` appends ``old_repo``/``old_path`` from the
    update ``old`` object. Maxwell's ``old`` carries only the CHANGED
    columns' previous values, so an unchanged key component surfaces as
    null — exactly the partial old image ``keychange.split_key_changes``
    coalesces component-wise.
    """
    return _apply_plan(raw, _maxwell_plan(value_col, bool(keep_raw), bool(with_old_keys)))


@lru_cache(maxsize=None)
def _maxwell_plan(value_col: str, keep_raw: bool, with_old_keys: bool):
    env = F.col("_env")
    row_filter = env["type"].isNull() | ~env["type"].isin(*_MAXWELL_NON_ROW_TYPES)
    op = _op_expr(env["type"], _MAXWELL_OPS)
    img = env["data"]
    seq = F.when(
        env["type"] == "bootstrap-insert", F.lit(0).cast("long")
    ).otherwise(
        _packed_binlog_seq(
            F.regexp_extract(env["position"], r"^(.*?):\d+$", 1),
            F.nullif(F.regexp_extract(env["position"], r"(\d+)$", 1), F.lit("")),
        )
    )
    ts = F.timestamp_seconds(env["ts"])
    extra = [env["table"].alias("src_table")]
    if with_old_keys:
        extra.extend(_old_key_extra(env["old"], env["type"] == "update"))
    if keep_raw:
        extra.append(F.col(value_col).alias("_raw"))
    return (
        F.from_json(F.col(value_col), _MAXWELL_SCHEMA),
        (row_filter,),
        None,
        _event_projection(op, seq, ts, img, extra),
    )


def parse_wal2json(
    raw: DataFrame,
    value_col: str = "value",
    keep_raw: bool = False,
    with_txn: bool = False,
    with_old_keys: bool = False,
) -> DataFrame:
    """wal2json (Postgres, format-version 2) JSON lines -> EVENT_SCHEMA.

    ``seq`` is the 64-bit LSN reassembled from the textual ``hi/lo``
    hex form (``hi * 2^32 + lo``) — Postgres LSNs are globally
    monotonic, so no rotation packing is needed (the WAL segment name
    is derived FROM the LSN, unlike MySQL binlog files). Row images
    arrive as ``columns``/``identity`` name-value arrays, not objects —
    ``map_from_entries`` rebuilds the map JVM-side, no Python. Deletes
    (and the U old-image) carry keys in ``identity``; I/U rows in
    ``columns``. Transaction-control lines (``B``/``C``), TRUNCATE and
    logical messages carry no row: they are DROPPED here (a normal
    stream is full of them), while undecodable JSON or a missing
    lsn/key still surfaces as a null-op/seq row for the DLQ split.

    ``with_txn=True`` appends the producer transaction id as
    ``txn_id`` (wal2json ``include-xids=true``; null when the producer
    does not emit xids) — the column the transaction-atomic gate
    (``cdc.txn.TxnGate``) keys on.

    ``with_old_keys=True`` appends ``old_repo``/``old_path`` from the
    UPDATE old-image (``identity`` — under REPLICA IDENTITY DEFAULT
    wal2json puts exactly the old primary key there), null on non-U
    rows. This is the feed for ``keychange.split_key_changes``: a
    key-changing update (a git file rename) otherwise merges as a new
    row and leaves the old key dangling.
    """
    return _apply_plan(
        raw,
        _wal2json_plan(
            value_col, bool(keep_raw), bool(with_txn), bool(with_old_keys)
        ),
    )


@lru_cache(maxsize=None)
def _wal2json_plan(value_col: str, keep_raw: bool, with_txn: bool, with_old_keys: bool):
    env = F.col("_env")
    row_filter = env["action"].isNull() | ~env["action"].isin(
        *_WAL2JSON_NON_ROW_ACTIONS
    )
    op = _op_expr(env["action"], _WAL2JSON_OPS)
    to_map = lambda arr: F.map_from_entries(  # noqa: E731
        F.transform(arr, lambda c: F.struct(c["name"], c["value"]))
    )
    img = F.when(env["action"] == "D", to_map(env["identity"])).otherwise(
        to_map(env["columns"])
    )
    lsn_hi = F.conv(F.split(env["lsn"], "/")[0], 16, 10).try_cast("long")
    lsn_lo = F.conv(F.split(env["lsn"], "/")[1], 16, 10).try_cast("long")
    seq = F.when(
        lsn_hi.isNotNull() & lsn_lo.isNotNull(),
        F.shiftleft(lsn_hi, 32) + lsn_lo,
    )
    ts = env["timestamp"].try_cast("timestamp")
    extra = [env["table"].alias("src_table")]
    if with_txn:
        extra.append(env["xid"].alias("txn_id"))
    if with_old_keys:
        extra.extend(_old_key_extra(to_map(env["identity"]), env["action"] == "U"))
    if keep_raw:
        extra.append(F.col(value_col).alias("_raw"))
    return (
        F.from_json(F.col(value_col), _WAL2JSON_SCHEMA),
        (row_filter,),
        None,
        _event_projection(op, seq, ts, img, extra),
    )


def wal2json_commits(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """The C(ommit) lines of a wal2json batch -> distinct ``txn_id``
    rows (one column, long). Logical decoding emits a transaction's
    change lines strictly BEFORE its commit line, so within any log
    prefix the set of committed xids exactly identifies which already-
    seen changes belong to complete transactions — the completeness
    test ``cdc.txn.TxnGate`` applies at every micro-batch boundary.
    Commit lines without an xid (producer without include-xids) yield
    nothing: the gate then treats every event as unframed pass-through.
    """
    parsed = raw.withColumn("_env", F.from_json(F.col(value_col), _WAL2JSON_SCHEMA))
    env = F.col("_env")
    return (
        parsed.where(env["action"] == "C")
        .where(env["xid"].isNotNull())
        .select(env["xid"].alias("txn_id"))
        .distinct()
    )


#: seq packing for Canal FlatMessages: seq = batch_id * 2^20 + row_pos.
#: Canal assigns each message a monotonically increasing batch ``id``;
#: WITHIN a message the ``data`` array is binlog-ordered, and the same
#: primary key can legally appear several times (insert then update in
#: one batch), so LWW must order on (id, position). 2^20 rows per
#: message far exceeds any real canal.instance batchSize, and ids keep
#: 43 high bits before sign trouble.
CANAL_PACK_SHIFT = 20


def parse_canal(
    raw: DataFrame,
    value_col: str = "value",
    keep_raw: bool = False,
    with_old_keys: bool = False,
) -> DataFrame:
    """Canal FlatMessage JSON envelopes -> EVENT_SCHEMA rows.

    The one multi-row dialect: each message carries a ``data`` ARRAY of
    row images (strings — Canal stringifies MySQL values), exploded
    JVM-side with ``posexplode_outer`` so one scan yields one event row
    per array element with its in-batch position. ``seq`` packs
    ``batch_id * 2^20 + position`` (see ``CANAL_PACK_SHIFT``): batch
    ids are monotonic across messages and positions are binlog-ordered
    within one, which is exactly the total order LWW needs when a key
    appears twice in one batch. DELETE messages carry the full old row
    in ``data`` (``old`` only holds changed columns on UPDATE, so it is
    never the image source). DDL messages (``isDdl`` true) carry no row
    and are DROPPED — a normal stream contains them — while undecodable
    JSON or a missing batch id still surfaces as a null-seq row for the
    DLQ split. ``posexplode_outer`` (not ``posexplode``) keeps
    data-less messages as one null-image row for the same reason.
    """
    return _apply_plan(raw, _canal_plan(value_col, bool(keep_raw), bool(with_old_keys)))


@lru_cache(maxsize=None)
def _canal_plan(value_col: str, keep_raw: bool, with_old_keys: bool):
    env = F.col("_env")
    row_filter = env["isDdl"].isNull() | ~F.lower(env["isDdl"]).isin("true", "1")
    explode = F.posexplode_outer(env["data"]).alias("_pos", "_img")
    op = _op_expr(env["type"], _CANAL_OPS)
    seq = F.when(
        env["id"].isNotNull() & F.col("_pos").isNotNull(),
        F.shiftleft(env["id"], CANAL_PACK_SHIFT) + F.col("_pos"),
    )
    ts = F.timestamp_millis(env["es"])
    extra = [env["table"].alias("src_table")]
    if with_old_keys:
        # ``old`` is an array PARALLEL to ``data`` (same index = same
        # row), carrying only the changed columns' previous values.
        # F.get (0-based, null on any invalid index — ANSI-safe, unlike
        # element_at) picks the exploded row's own old image.
        oldmap = F.get(env["old"], F.col("_pos"))
        extra.extend(_old_key_extra(oldmap, env["type"] == "UPDATE"))
    if keep_raw:
        extra.append(F.col(value_col).alias("_raw"))
    return (
        F.from_json(F.col(value_col), _CANAL_SCHEMA),
        (row_filter,),
        explode,
        _event_projection(op, seq, ts, F.col("_img"), extra),
    )


#: seq packing for DMS CDC records: seq = transaction_id * 2^20 +
#: transaction_record_id. Transaction ids are commit-ordered at the
#: source; the record id orders rows WITHIN one transaction (a key can
#: legally change twice in one txn). 2^20 records per transaction, 43
#: high bits of txn id — the same budget argument as CANAL_PACK_SHIFT.
DMS_PACK_SHIFT = 20


def parse_dms(raw: DataFrame, value_col: str = "value", keep_raw: bool = False) -> DataFrame:
    """AWS DMS (Kinesis/Kafka target) JSON envelope -> EVENT_SCHEMA.

    Envelope shape (one JSON object per record):
        {"data": {...row...},
         "metadata": {"record-type": "data"|"control",
                      "operation": "load|insert|update|delete",
                      "timestamp": "2024-...T...Z" (ISO-8601, µs),
                      "schema-name": ..., "table-name": ...,
                      "transaction-id": ..., "transaction-record-id": ...}}

    Ordering contract: full-load rows (operation ``load``) get
    ``seq = 0`` — DMS writes each key's snapshot exactly once, BEFORE
    the CDC phase, so any CDC change must beat it regardless of the
    two phases' incomparable native coordinates. CDC rows order by
    ``transaction_id * 2^20 + transaction_record_id`` when the task has
    IncludeTransactionDetails (see ``DMS_PACK_SHIFT``), else by the
    commit timestamp in microseconds. The two CDC modes are a
    task-level setting and never mix within one stream; a record with
    neither coordinate is a null-seq DLQ row. ``control`` records
    (task lifecycle / DDL) carry no row image and are DROPPED, not
    dead-lettered — mirroring wal2json's B/C/T handling.
    """
    return _apply_plan(raw, _dms_plan(value_col, bool(keep_raw)))


@lru_cache(maxsize=None)
def _dms_plan(value_col: str, keep_raw: bool):
    env = F.col("_env")
    meta = env["metadata"]
    rt = F.element_at(meta, "record-type")
    row_filter = ~F.coalesce(rt == F.lit("control"), F.lit(False))
    opname = F.element_at(meta, "operation")
    op = _op_expr(opname, _DMS_OPS)
    txn = F.element_at(meta, "transaction-id").try_cast("long")
    rec = F.coalesce(
        F.element_at(meta, "transaction-record-id").try_cast("long"), F.lit(0)
    )
    ts = F.try_to_timestamp(F.element_at(meta, "timestamp"))
    seq = F.when(opname == "load", F.lit(0).cast("long")).otherwise(
        F.coalesce(F.shiftleft(txn, DMS_PACK_SHIFT) + rec, F.unix_micros(ts))
    )
    extra = [F.element_at(meta, "table-name").alias("src_table")]
    if keep_raw:
        extra.append(F.col(value_col).alias("_raw"))
    return (
        F.from_json(F.col(value_col), _DMS_SCHEMA),
        (row_filter,),
        None,
        _event_projection(op, seq, ts, env["data"], extra),
    )


#: seq packing for MongoDB change-stream positions: seq =
#: oplog_seconds * 2^20 + ord. The BSON Timestamp that orders a Mongo
#: oplog is (seconds, per-second counter); Debezium surfaces it as
#: source.ts_ms (= seconds*1000, millis carry no extra information) and
#: source.ord. 2^20 ops/sec headroom per replica set; epoch seconds use
#: 31 bits, leaving 12 spare before sign trouble — same budget argument
#: as CANAL_PACK_SHIFT/DMS_PACK_SHIFT.
MONGO_PACK_SHIFT = 20


def parse_mongo(raw: DataFrame, value_col: str = "value", keep_raw: bool = False) -> DataFrame:
    """Debezium MongoDB connector envelope -> EVENT_SCHEMA rows.

    The schemaless dialect: row images arrive as extended-JSON document
    STRINGS (``after``/``before``), not structured records — a Mongo
    collection has no fixed schema for the connector to emit — so the
    parse is TWO JVM-side ``from_json`` passes: envelope, then document
    string -> map<string,string>. Still zero Python, one scan.

    Contract: the connector runs with full-document capture
    (``capture.mode=change_streams_update_full_with_pre_image``), so
    c/u/r rows carry the full post-image in ``after`` and deletes the
    full pre-image in ``before``. An updateDescription-only update or a
    pre-image-less delete has NO row image -> null repo -> DLQ
    (replayable once the connector is reconfigured), never a silent
    drop. ``seq`` packs the oplog position ``(source.ts_ms/1000) * 2^20
    + source.ord`` (see ``MONGO_PACK_SHIFT``); ``ord`` defaults to 0
    when absent (snapshot reads), a missing oplog timestamp is a
    null-seq DLQ row.
    """
    return _apply_plan(raw, _mongo_plan(value_col, bool(keep_raw)))


@lru_cache(maxsize=None)
def _mongo_plan(value_col: str, keep_raw: bool):
    env = F.col("_env")
    op = _op_expr(env["op"], _DEBEZIUM_OPS)
    doc = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    img = F.from_json(doc, MapType(StringType(), StringType()))
    sec = F.floor(
        F.element_at(env["source"], "ts_ms").try_cast("long") / F.lit(1000)
    ).cast("long")
    ord_ = F.coalesce(
        F.element_at(env["source"], "ord").try_cast("long"), F.lit(0)
    )
    seq = F.when(sec.isNotNull(), F.shiftleft(sec, MONGO_PACK_SHIFT) + ord_)
    ts = F.timestamp_millis(env["ts_ms"])
    extra = [F.element_at(env["source"], "collection").alias("src_table")]
    if keep_raw:
        extra.append(F.col(value_col).alias("_raw"))
    return (
        F.from_json(F.col(value_col), _MONGO_SCHEMA),
        (),
        None,
        _event_projection(op, seq, ts, img, extra),
    )


#: seq packing for GoldenGate trail positions: seq = trail_seqno * 2^32
#: + rba. The JSON "op" format's ``pos`` is a fixed-width 20-digit
#: decimal string — the first 10 digits are the trail file sequence
#: number, the last 10 the RBA (byte offset within that trail file).
#: The RBA resets on every trail rotation, so the raw 20-digit value
#: only orders because the seqno occupies the high digits — but 20
#: decimal digits overflow int64, so the packed form splits the string
#: and recombines in binary. RBA < 2^32 (trail files cap at 2 GB),
#: leaving 31 bits ≈ 2.1G trail rotations — same budget argument as
#: CANAL_PACK_SHIFT/DMS_PACK_SHIFT.
GOLDENGATE_PACK_SHIFT = 32


def parse_goldengate(
    raw: DataFrame,
    value_col: str = "value",
    keep_raw: bool = False,
    with_old_keys: bool = False,
) -> DataFrame:
    """Oracle GoldenGate (Big Data Kafka handler, JSON op format) ->
    EVENT_SCHEMA rows.

    Envelope shape (one JSON object per operation):
        {"table": "PDB.SCHEMA.TABLE", "op_type": "I|U|D|T",
         "op_ts": "2024-03-01 00:00:00.000000" (source commit ts),
         "current_ts": "..." (handler processing ts, ignored),
         "pos": "00000000080000001234" (trail seqno + RBA, 20 digits),
         "primary_keys": ["repo", "path"],
         "before": {...} | absent, "after": {...} | absent}

    Ordering contract: ``pos`` must be the exact 20-digit trail
    coordinate — the packed seq splits it into (seqno, rba) and
    recombines as ``seqno * 2^32 + rba`` (see GOLDENGATE_PACK_SHIFT) so
    ordering survives trail-file rotation without overflowing int64. A
    ``pos`` of any other width is an unorderable event -> null seq ->
    DLQ (never a silent mis-sort). Deletes carry their row image in
    ``before`` (the handler's default includes the full before image
    for deletes); I/U carry ``after``. ``op_type`` 'T' (truncate) has
    no row image and is dropped, not dead-lettered.
    """
    return _apply_plan(
        raw, _goldengate_plan(value_col, bool(keep_raw), bool(with_old_keys))
    )


@lru_cache(maxsize=None)
def _goldengate_plan(value_col: str, keep_raw: bool, with_old_keys: bool):
    env = F.col("_env")
    row_filter = ~F.coalesce(env["op_type"] == F.lit("T"), F.lit(False))
    op = _op_expr(env["op_type"], _GOLDENGATE_OPS)
    img = F.when(env["op_type"] == "D", env["before"]).otherwise(env["after"])
    pos = env["pos"]
    seqno = F.substring(pos, 1, 10).try_cast("long")
    rba = F.substring(pos, 11, 10).try_cast("long")
    seq = F.when(
        (F.length(pos) == 20) & seqno.isNotNull() & rba.isNotNull(),
        F.shiftleft(seqno, GOLDENGATE_PACK_SHIFT) + rba,
    )
    ts = F.try_to_timestamp(env["op_ts"])
    extra = [env["table"].alias("src_table")]
    if with_old_keys:
        # U rows carry the FULL before image when the handler includes
        # it — the old key for keychange.split_key_changes
        extra.extend(_old_key_extra(env["before"], env["op_type"] == "U"))
    if keep_raw:
        extra.append(F.col(value_col).alias("_raw"))
    return (
        F.from_json(F.col(value_col), _GOLDENGATE_SCHEMA),
        (row_filter,),
        None,
        _event_projection(op, seq, ts, img, extra),
    )


def dms_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic DMS-envelope fixture (parquet, one
    ``value`` JSON string column) once and return its path. 74 records
    over 25 (repo,path) keys exercising the full-load→CDC cutover: 23
    ``load`` snapshot rows (seq 0 by contract; keys 20-22 never see
    CDC and must survive at snapshot content), 3 timestamp-mode CDC
    records on dedicated keys 30/31 (no transaction details — the
    commit-timestamp-microsecond fallback order), txn 101 updates keys
    0-19, txn 102 updates them again (must win on the txn bits), txn
    103 touches key 3 TWICE (record-ids 5 then 17 — the within-txn
    order decides), txn 104 deletes keys 2/7/11, plus one ``control``
    record (dropped, not DLQ'd), one malformed JSON line and one
    data record with no operation (both DLQ). pyarrow-written so
    oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/dms_v1.parquet"
    if os.path.exists(path):
        return path

    def rec(op, key, txn=None, recid=None, ts="2024-03-01T00:00:00.000000Z", content_tag="snap"):
        data = {
            "repo": f"repo-{key % 5}",
            "path": f"svc/d{key}.py",
            "commit": f"{content_tag}-{key}",
            "lang": "python",
            "content": f"def d{key}(): return '{content_tag}'\n" * (1 + key % 3),
        }
        if op == "delete":
            data = {k: data[k] for k in ("repo", "path")}
        meta = {
            "record-type": "data",
            "operation": op,
            "partition-key-type": "schema-table",
            "schema-name": "public",
            "table-name": "files",
            "timestamp": ts,
        }
        if txn is not None:
            meta["transaction-id"] = txn
            meta["transaction-record-id"] = recid
        return json.dumps({"data": data, "metadata": meta}, sort_keys=True)

    values = []
    for k in range(23):  # full-load snapshot (no transaction details);
        # keys 20-22 are never touched by CDC — they must survive at
        # seq 0 with their snapshot content
        values.append(rec("load", k, ts="2024-03-01T00:00:00.000000Z"))
    # timestamp-mode CDC (task without IncludeTransactionDetails) on
    # DEDICATED keys 30/31 — commit-timestamp microseconds are the
    # order; never mixed with txn-packed keys (task-level setting)
    values.append(rec("insert", 30, ts="2024-03-01T05:00:00.000000Z", content_tag="t1"))
    values.append(rec("update", 30, ts="2024-03-01T05:00:01.500000Z", content_tag="t2"))
    values.append(rec("insert", 31, ts="2024-03-01T05:00:02.250000Z", content_tag="t1"))
    for i, k in enumerate(range(20)):  # txn 101: first CDC update wave
        values.append(rec("update", k, txn=101, recid=i, ts="2024-03-01T01:00:00.000000Z", content_tag="v1"))
    for i, k in enumerate(range(20)):  # txn 102: second wave — wins LWW
        values.append(rec("update", k, txn=102, recid=i, ts="2024-03-01T02:00:00.000000Z", content_tag="v2"))
    # txn 103: same key twice — record-id 17 must beat record-id 5
    values.append(rec("update", 3, txn=103, recid=5, ts="2024-03-01T03:00:00.000000Z", content_tag="v3a"))
    values.append(rec("update", 3, txn=103, recid=17, ts="2024-03-01T03:00:00.000000Z", content_tag="v3b"))
    for i, k in enumerate((2, 7, 11)):  # txn 104: tombstones
        values.append(rec("delete", k, txn=104, recid=i, ts="2024-03-01T04:00:00.000000Z"))
    values.append(
        json.dumps(
            {
                "control": {},
                "metadata": {
                    "record-type": "control",
                    "operation": "create-table",
                    "schema-name": "public",
                    "table-name": "files",
                },
            },
            sort_keys=True,
        )
    )
    values.append("dms but broken {{{")
    values.append(json.dumps({"data": {"repo": "x", "path": "y"}, "metadata": {"record-type": "data"}}))

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def canal_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic Canal-FlatMessage fixture (parquet, one
    ``value`` JSON string column) once and return its path. 8 messages
    / 58 row images over 24 (repo,path) keys exercising the multi-row
    shape: two 12-row INSERT batches, one 24-row UPDATE batch, one
    batch where the SAME key appears three times (in-batch position
    must decide LWW — ordering on batch id alone ties), a 4-key DELETE
    batch, one DDL message (dropped, not dead-lettered), plus 2
    malformed payloads (bad JSON / missing batch id) that the DLQ
    split must divert. pyarrow-written so oracle_sql() needs no
    SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/canal_v1.parquet"
    if os.path.exists(path):
        return path

    def row(key, tag):
        return {
            "repo": f"repo-{key % 4}",
            "path": f"svc/c{key}.java",
            "commit": f"b{tag}",
            "lang": "java",
            "content": f"class C{key} {{ int v() {{ return {tag}; }} }}\n" * (1 + key % 3),
        }

    def msg(mid, mtype, rows, es, is_ddl=False):
        return json.dumps(
            {
                "id": mid,
                "database": "repos",
                "table": "files",
                "type": mtype,
                "isDdl": is_ddl,
                "es": es,
                "ts": es + 250,
                "data": rows,
                "old": None,
            },
            sort_keys=True,
        )

    values = []
    es = 1700100000000
    values.append(msg(100, "INSERT", [row(k, 100) for k in range(12)], es))
    values.append(msg(101, "INSERT", [row(k, 101) for k in range(12, 24)], es + 1000))
    values.append(msg(102, "UPDATE", [row(k, 102) for k in range(24)], es + 2000))
    # key 3 three times in ONE batch: positions 0, 2, 5 — the pos-5
    # image must win LWW; batch id alone cannot order these
    values.append(
        msg(
            103,
            "UPDATE",
            [row(3, 1030), row(8, 1031), row(3, 1032), row(15, 1033), row(21, 1034), row(3, 1035)],
            es + 3000,
        )
    )
    values.append(
        msg(104, "DELETE", [row(k, 104) for k in (2, 8, 14, 20)], es + 4000)
    )
    values.append(
        msg(105, "ALTER", None, es + 5000, is_ddl=True)
    )  # DDL: dropped, not dead-lettered
    values.append("canal but broken [[[")
    values.append(  # no batch id -> unorderable -> DLQ
        json.dumps({"type": "UPDATE", "es": 1, "data": [{"repo": "x", "path": "y"}]})
    )

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def wal2json_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic wal2json-v2 fixture (parquet, one
    ``value`` JSON string column) once and return its path. 86 lines
    over 20 (repo,path) keys crossing a WAL *segment* boundary (LSN hi
    part increments — the total order must follow the reassembled
    64-bit LSN, not the lo part, which resets): per transaction a
    B(egin) line, its I/U/D changes, and a C(ommit) line — control
    lines must be dropped, NOT dead-lettered; 20 inserts + 20 updates
    in segment 0, 20 updates at smaller lo-offsets in segment 1 (these
    must win LWW), 4 deletes via ``identity`` old-keys, one TRUNCATE
    line (dropped), plus 2 genuinely malformed payloads (bad JSON /
    missing lsn) that the DLQ split must divert. pyarrow-written so
    oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/wal2json_v1.parquet"
    if os.path.exists(path):
        return path

    def cols(key, hi, lo):
        row = {
            "repo": f"repo-{key % 5}",
            "path": f"pg/w{key}.sql",
            "commit": f"l{hi}-{lo:07x}",
            "lang": "sql",
            "content": f"select {key}, {lo};\n" * (1 + key % 3),
        }
        return [{"name": k, "type": "text", "value": v} for k, v in row.items()]

    def change(action, hi, lo, key, n):
        body = {
            "action": action,
            "lsn": f"{hi:X}/{lo:X}",
            "timestamp": f"2023-11-14 15:{n // 60:02d}:{n % 60:02d}.{n:06d}+00:00",
            "schema": "public",
            "table": "files",
        }
        if action == "D":
            body["identity"] = [
                {"name": "repo", "value": f"repo-{key % 5}"},
                {"name": "path", "value": f"pg/w{key}.sql"},
            ]
        else:
            body["columns"] = cols(key, hi, lo)
        return json.dumps(body, sort_keys=True)

    values = []
    n = 0

    def txn(changes):
        nonlocal n
        values.append(json.dumps({"action": "B"}))
        values.extend(changes)
        values.append(json.dumps({"action": "C"}))

    lo = 0x1000
    batch = []
    for k in range(20):  # inserts, segment 0
        lo += 0x40
        n += 1
        batch.append(change("I", 0, lo, k, n))
    txn(batch)
    batch = []
    for k in range(20):  # updates, segment 0
        lo += 0x40
        n += 1
        batch.append(change("U", 0, lo, k, n))
    txn(batch)
    lo = 0x200  # SEGMENT boundary: hi increments, lo resets BELOW segment-0 offsets
    batch = []
    for k in range(20):  # updates, segment 1 — must win LWW on the 64-bit LSN
        lo += 0x28
        n += 1
        batch.append(change("U", 1, lo, k, n))
    txn(batch)
    batch = []
    for k in (2, 7, 11, 16):  # deletes via identity old-keys
        lo += 0x28
        n += 1
        batch.append(change("D", 1, lo, k, n))
    txn(batch)
    values.append(json.dumps({"action": "T", "schema": "public", "table": "files"}))
    values.append("wal2json but broken }}}")
    values.append(
        json.dumps({"action": "U", "columns": [{"name": "repo", "value": "x"}]})
    )  # no lsn -> unorderable -> DLQ

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def debezium_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic Debezium-envelope fixture (parquet, one
    ``value`` JSON string column) once and return its path. 82 events
    over 30 (repo,path) keys: 30 creates, 2 snapshot reads, 30 updates,
    10 deletes re-creating half, plus 2 malformed payloads (bad JSON /
    missing offset) that the DLQ split must divert. pyarrow-written so
    oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/debezium_v1.parquet"
    if os.path.exists(path):
        return path

    def env(op, lsn, key, ver, ts_ms):
        row = {
            "repo": f"repo-{key % 5}",
            "path": f"src/f{key}.py",
            "commit": f"c{lsn:05d}",
            "lang": "python",
            "content": f"def f{key}(): return {lsn}\n" * (1 + key % 4),
            "schema_ver": str(ver),
        }
        body = {
            "op": op,
            "ts_ms": ts_ms,
            "before": row if op == "d" else None,
            "after": None if op == "d" else row,
            "source": {"lsn": str(lsn), "db": "repos"},
        }
        return json.dumps(body, sort_keys=True)

    values = []
    lsn = 0
    for k in range(30):  # initial creates
        lsn += 1
        values.append(env("c", lsn, k, 1, 1700000000000 + lsn * 1000))
    for k in (3, 7):  # snapshot reads (op 'r' == upsert)
        lsn += 1
        values.append(env("r", lsn, k, 1, 1700000000000 + lsn * 1000))
    for k in range(30):  # updates touch every key
        lsn += 1
        values.append(env("u", lsn, k, 1, 1700000000000 + lsn * 1000))
    for k in range(0, 20, 2):  # deletes
        lsn += 1
        values.append(env("d", lsn, k, 1, 1700000000000 + lsn * 1000))
    for k in range(0, 20, 4):  # half the deleted keys come back
        lsn += 1
        values.append(env("c", lsn, k, 1, 1700000000000 + lsn * 1000))
    # malformed: undecodable payload + an envelope with no offset
    values.append("{not json at all")
    values.append(json.dumps({"op": "u", "ts_ms": 1, "after": {"repo": "x"}, "source": {}}))

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def maxwell_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic Maxwell-envelope fixture (parquet, one
    ``value`` JSON string column) once and return its path. 78 events
    over 24 (repo,path) keys spanning a binlog ROTATION
    (mysql-bin.000007 -> mysql-bin.000008, offsets resetting) so the
    packed-seq total order is what the oracle must reproduce: 24
    inserts, 24 updates in file 7, rotation, 24 more updates at SMALLER
    raw offsets in file 8 (these must still win LWW), 4 deletes, plus 2
    malformed payloads for the DLQ split. pyarrow-written so
    oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/maxwell_v1.parquet"
    if os.path.exists(path):
        return path

    def env(op, file_num, offset, key, ts):
        data = {
            "repo": f"repo-{key % 4}",
            "path": f"lib/m{key}.go",
            "commit": f"x{file_num}-{offset:06d}",
            "lang": "go",
            "content": f"func M{key}() int {{ return {offset} }}\n" * (1 + key % 3),
        }
        if op == "delete":
            data = {k: data[k] for k in ("repo", "path")}
        return json.dumps(
            {
                "type": op,
                "ts": ts,
                "position": f"mysql-bin.{file_num:06d}:{offset}",
                "table": "files",
                "data": data,
            },
            sort_keys=True,
        )

    values = []
    ts = 1700000000
    off = 10000
    for k in range(24):  # inserts, file 7
        off += 97
        ts += 1
        values.append(env("insert", 7, off, k, ts))
    for k in range(24):  # updates, file 7
        off += 97
        ts += 1
        values.append(env("update", 7, off, k, ts))
    off = 400  # ROTATION: offsets reset below every file-7 offset
    for k in range(24):  # updates, file 8 — must win LWW despite smaller raw offset
        off += 53
        ts += 1
        values.append(env("update", 8, off, k, ts))
    for k in (1, 5, 9, 13):  # deletes, file 8
        off += 53
        ts += 1
        values.append(env("delete", 8, off, k, ts))
    values.append("maxwell but broken {{{")
    values.append(json.dumps({"type": "update", "ts": 1, "data": {"repo": "x"}}))  # no position

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def mongo_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic Debezium-MongoDB fixture (parquet, one
    ``value`` JSON string column) once and return its path. 50 records
    over 21 (repo,path) keys: 20 ``r`` snapshot reads at oplog second
    s0, two full-document update waves (the second must win LWW on the
    packed oplog position), one key updated TWICE within the SAME oplog
    second (only ``ord`` resolves the order), one ``c`` insert, two
    pre-image deletes (tombstones drop), plus the three DLQ shapes the
    dialect contract promises: a pre-image-less delete, an
    updateDescription-only update (null ``after``), and a malformed
    JSON line. pyarrow-written so oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/mongo_v1.parquet"
    if os.path.exists(path):
        return path

    def doc(key, tag):
        return json.dumps(
            {
                "_id": f"mrepo-{key % 4}::svc/m{key}.py",
                "repo": f"mrepo-{key % 4}",
                "path": f"svc/m{key}.py",
                "commit": f"{tag}-{key}",
                "lang": "python",
                "content": f"def m{key}(): return '{tag}'\n" * (1 + key % 3),
            },
            sort_keys=True,
        )

    def rec(op, key, sec, ord_, tag="snap", after=True, before=False, src_extra=None):
        source = {"rs": "rs0", "collection": "files", "ts_ms": sec * 1000, "ord": ord_}
        if src_extra is not None:
            source = src_extra
        return json.dumps(
            {
                "op": op,
                "ts_ms": sec * 1000,
                "before": doc(key, tag) if before else None,
                "after": doc(key, tag) if after else None,
                "source": source,
            },
            sort_keys=True,
        )

    s0, s1, s2, s3, s4 = (
        1709251200,  # 2024-03-01T00:00:00Z: snapshot reads
        1709254800,  # +1h: update wave v1
        1709258400,  # +2h: update wave v2 (wins)
        1709262000,  # +3h: same-second double update + insert
        1709265600,  # +4h: deletes + the DLQ shapes
    )
    values = []
    for k in range(20):  # snapshot; keys 12-19 never updated -> survive at snap
        values.append(rec("r", k, s0, k + 1, tag="snap"))
    for i, k in enumerate(range(12)):
        values.append(rec("u", k, s1, i + 1, tag="v1"))
    for i, k in enumerate(range(12)):
        values.append(rec("u", k, s2, i + 1, tag="v2"))
    # same oplog second: ord 9 must beat ord 3
    values.append(rec("u", 5, s3, 3, tag="v3a"))
    values.append(rec("u", 5, s3, 9, tag="v3b"))
    values.append(rec("c", 40, s3, 1, tag="new"))
    # pre-image deletes: keys 1 and 6 drop
    values.append(rec("d", 1, s4, 1, tag="v2", after=False, before=True))
    values.append(rec("d", 6, s4, 2, tag="v2", after=False, before=True))
    # DLQ shapes (contract): pre-image-less delete, updateDescription-only
    # update, malformed JSON, missing oplog timestamp
    values.append(rec("d", 2, s4, 3, after=False, before=False))
    values.append(rec("u", 3, s4, 4, after=False, before=False))
    values.append("mongo but broken {{{")
    values.append(rec("u", 4, s4, 5, tag="vX", src_extra={"rs": "rs0", "collection": "files"}))

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def wal2json_txn_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic wal2json transaction-framing fixture
    (parquet, columns ``line_no`` + ``value``) once and return its
    path. 12 lines, include-xids on: txn 700 (B, 2 inserts, C) fully
    inside the first 6 lines; txn 701's B + first update land before
    the line-6 cut but its second update and C line after it — the
    shape a micro-batch boundary cuts; one xid-less change (a mixed
    producer; must pass through ungated); txn 702 (B, insert, C)
    entirely after the cut. Backs ``txn_gate_release`` and the TxnGate
    tests: at the cut, txn 701's first update must NOT be visible.
    pyarrow-written so oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/wal2json_txn_v1.parquet"
    if os.path.exists(path):
        return path

    def cols(key, tag):
        row = {
            "repo": f"tx-repo-{key % 2}",
            "path": f"pg/t{key}.sql",
            "commit": f"{tag}-{key}",
            "lang": "sql",
            "content": f"select {key}; -- {tag}\n" * (1 + key % 2),
        }
        return [{"name": k, "type": "text", "value": v} for k, v in row.items()]

    lo = 0x1000

    def line(action, xid, key=None, tag=None):
        nonlocal lo
        lo += 0x10
        body = {"action": action, "lsn": f"5/{lo:X}",
                "timestamp": "2023-11-14 16:00:00.000000+00:00"}
        if xid is not None:
            body["xid"] = xid
        if action in ("I", "U", "D"):
            body["schema"] = "public"
            body["table"] = "files"
            body["columns"] = cols(key, tag)
        return json.dumps(body, sort_keys=True)

    values = [
        line("B", 700),            # 0
        line("I", 700, 0, "t700"),  # 1
        line("I", 700, 1, "t700"),  # 2
        line("C", 700),            # 3
        line("B", 701),            # 4
        line("U", 701, 0, "t701"),  # 5
        # ---- the micro-batch cut: line_no < 6 is batch 0 ----
        line("U", 701, 1, "t701"),  # 6
        line("C", 701),            # 7
        line("I", None, 3, "solo"),  # 8: xid-less producer, pass-through
        line("B", 702),            # 9
        line("I", 702, 2, "t702"),  # 10
        line("C", 702),            # 11
    ]
    table = pa.table(
        {
            "line_no": pa.array(range(len(values)), pa.int64()),
            "value": pa.array(values, pa.string()),
        }
    )
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def goldengate_fixture_path(base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic GoldenGate-envelope fixture (parquet, one
    ``value`` JSON string column) once and return its path. 60 records
    over 23 (repo,path) keys exercising trail-file rotation: 22 ``I``
    snapshot rows in trail seqno 8 (keys 14-21 never see CDC and must
    survive at snapshot content), update wave v1 late in trail 8
    (RBA ~500k), update wave v2 early in trail 9 at SMALLER RBAs — the
    raw offset goes backwards across the rotation, so v2 wins only via
    the seqno bits of the packed position — one key updated TWICE
    within trail 9 (RBA alone resolves), one fresh insert, two
    before-image deletes (tombstones), one ``T`` truncate (dropped, not
    DLQ'd), plus the four DLQ shapes: malformed JSON, an after-less
    update, a delete with no before image, and a non-20-digit ``pos``.
    pyarrow-written so oracle_sql() needs no SparkSession."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/goldengate_v1.parquet"
    if os.path.exists(path):
        return path

    def row(key, tag):
        return {
            "repo": f"gg-repo-{key % 4}",
            "path": f"svc/g{key}.py",
            "commit": f"{tag}-{key}",
            "lang": "python",
            "content": f"def g{key}(): return '{tag}'\n" * (1 + key % 3),
        }

    def rec(op, key, seqno, rba, tag="snap", ts="2024-03-01 00:00:00.000000",
            pos=None, before=None, after=None):
        body = {
            "table": "ORCL.SRC.FILES",
            "op_type": op,
            "op_ts": ts,
            "current_ts": ts.replace(" ", "T"),
            "pos": pos if pos is not None else f"{seqno:010d}{rba:010d}",
            "primary_keys": ["repo", "path"],
        }
        if before is not None:
            body["before"] = before
        if after is not None:
            body["after"] = after
        return json.dumps(body, sort_keys=True)

    values = []
    for k in range(22):  # trail 8 snapshot inserts; keys 14-21 never
        # touched by CDC — must survive at snapshot content
        values.append(rec("I", k, 8, 1000 + k * 16, after=row(k, "snap")))
    for i, k in enumerate(range(14)):  # update wave v1, late in trail 8
        values.append(rec("U", k, 8, 500000 + i * 16,
                          ts="2024-03-01 01:00:00.000000", after=row(k, "v1")))
    for i, k in enumerate(range(14)):  # trail ROTATION: v2 lands in
        # trail 9 at RBAs far below v1's — wins only on the seqno bits
        values.append(rec("U", k, 9, 100 + i * 16,
                          ts="2024-03-01 02:00:00.000000", after=row(k, "v2")))
    # same trail file, same key twice: RBA 7016 must beat 7000
    values.append(rec("U", 5, 9, 7000, ts="2024-03-01 03:00:00.000000", after=row(5, "v3a")))
    values.append(rec("U", 5, 9, 7016, ts="2024-03-01 03:00:00.000000", after=row(5, "v3b")))
    values.append(rec("I", 40, 9, 8000, ts="2024-03-01 03:30:00.000000", after=row(40, "new")))
    # before-image deletes: keys 2 and 9 tombstone
    values.append(rec("D", 2, 9, 9000, ts="2024-03-01 04:00:00.000000", before=row(2, "v2")))
    values.append(rec("D", 9, 9, 9016, ts="2024-03-01 04:00:00.000000", before=row(9, "v2")))
    # truncate: no row image, dropped (not DLQ'd)
    values.append(rec("T", 0, 9, 9500, ts="2024-03-01 04:30:00.000000"))
    # DLQ shapes: malformed JSON, after-less update, before-less delete,
    # non-20-digit pos (unorderable)
    values.append("goldengate but broken {{{")
    values.append(rec("U", 3, 9, 9600, ts="2024-03-01 05:00:00.000000"))
    values.append(rec("D", 4, 9, 9616, ts="2024-03-01 05:00:00.000000"))
    values.append(rec("U", 6, 9, 0, pos="123",
                      ts="2024-03-01 05:00:00.000000", after=row(6, "vX")))

    table = pa.table({"value": pa.array(values, pa.string())})
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


#: the one wire-dialect registry: IngestStream, replay_dlq and tests all
#: dispatch through this, so a new dialect registers exactly once.
WIRE_PARSERS = {
    "debezium": parse_debezium,
    "maxwell": parse_maxwell,
    "wal2json": parse_wal2json,
    "canal": parse_canal,
    "dms": parse_dms,
    "mongo": parse_mongo,
    "goldengate": parse_goldengate,
}


def split_malformed(raw: DataFrame, parser=parse_debezium, value_col: str = "value"):
    """(clean, dlq) split in one scan: rows whose envelope failed to
    parse (null op or null seq — key/offset-less events cannot be
    ordered or applied) go to the dead-letter side with their original
    payload, ready for replay after a producer fix.

    Null payloads are DROPPED before parsing, not dead-lettered: a
    Kafka transport delivers a null-value tombstone record after every
    delete when the connector runs with tombstones enabled (Debezium's
    default, for log-compaction of the topic) — it carries no event,
    only a compaction hint, and the delete itself already arrived as
    its own envelope."""
    raw = raw.where(F.col(value_col).isNotNull())
    parsed = parser(raw, value_col=value_col, keep_raw=True)
    bad_mask = (
        F.col("op").isNull()
        | F.col("seq").isNull()
        | F.col("repo").isNull()
        | F.col("path").isNull()
    )
    clean = parsed.where(~bad_mask).drop("_raw")
    dlq = parsed.where(bad_mask).select(F.col("_raw").alias(value_col))
    return clean, dlq
