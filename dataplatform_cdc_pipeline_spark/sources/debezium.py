"""Debezium envelope adapter: nested change-event JSON → the engine's
flat bronze shape.

The reference's bronze rows carry a FLAT payload with ``__op`` /
``__ts_ns`` / ``__source_pos`` inlined (merge.sql:310-326) — the shape
the landing process produces after unwrapping. Real CDC topics, though,
arrive in Debezium's NESTED envelope::

    {"before": {...}|null, "after": {...}|null, "op": "c|u|d|r",
     "ts_ms": 1718000000123, "source": {"db": .., "table": .., "pos": ..}}

This module is the unwrap step (the counterpart of Debezium's
ExtractNewRecordState SMT), done engine-side as pure Columns so a raw
topic dump can feed the merge pipeline with no external transform:

- row image = ``after``, falling back to ``before`` for deletes (op 'd'
  has ``after: null``);
- op 'r' (snapshot read) maps to 'c' — a snapshot row is an insert as
  far as MERGE semantics go;
- ``__ts_ns`` = ``ts_ms`` · 1e6 — Debezium timestamps are MILLIS, so the
  engine's microsecond event-time order truncates to ms here and
  sub-ms ties fall to the ``pos`` tiebreak (same rule as the reference's
  nanos→micros truncation, merge.sql:319);
- envelope keys are injected via ``map_concat`` over the parsed payload
  map — a payload that already carries a ``__op``-style key fails loudly
  (ANSI duplicate-map-key) rather than being silently clobbered.

Everything is a native Column (one ``from_json`` per row for the payload
+ three ``get_json_object`` probes for the envelope scalars) — scan-speed
at 100 TB, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Debezium op → engine op ('r' = snapshot read ⇒ insert).
_OP_MAP = {"c": "c", "r": "c", "u": "u", "d": "d"}


def _engine_op(op: Column) -> Column:
    out = F.when(op == "r", F.lit("c"))
    for k, v in _OP_MAP.items():
        if k != "r":
            out = out.when(op == k, F.lit(v))
    return out  # unknown ops → NULL → dropped by the plan's op-not-null gate (F1)


def normalize_debezium(
    raw: DataFrame,
    value_col: str = "value",
    load_ts_col: str | None = None,
    source_name: str = "debezium",
) -> DataFrame:
    """Debezium change events → bronze CDC frame
    ``(data, load_ts, publish_time, message_id, source_db_table,
    subscription_name)`` — directly consumable by
    :func:`plans.merge_plan.window_scan` and the merge engine.

    ``load_ts`` defaults to the envelope's ``ts_ms`` (arrival == source
    commit time); pass a column name to use the transport's arrival time
    instead (e.g. a Kafka-dump ``kafka_timestamp``).
    """
    # ONE from_json parse per envelope (r13, guide §1.2/§2.3): previously
    # six scalar get_json_object probes plus a second from_json of the
    # extracted row-image text — seven full parses per row. The nested
    # before/after parse directly as maps (JSON null/absent → NULL map,
    # exactly like get_json_object's null), so ``coalesce`` picks the
    # same image and the re-serialized bronze payload is byte-identical —
    # pinned by tests/test_opt_r13.py.
    e = F.from_json(
        F.col(value_col),
        "before map<string,string>, after map<string,string>, op string, "
        "ts_ms long, source struct<db:string,table:string,pos:string>",
    )
    op = _engine_op(e["op"])
    ts_ms = e["ts_ms"]
    pos = e["source"]["pos"]
    payload = F.coalesce(e["after"], e["before"])
    envelope = F.create_map(
        F.lit("__op"), op,
        F.lit("__ts_ns"), (ts_ms * F.lit(1_000_000)).cast("string"),
        F.lit("__source_pos"), pos,
    )
    data = F.to_json(F.map_concat(payload, envelope))
    load_ts = (
        F.col(load_ts_col) if load_ts_col is not None else F.timestamp_millis(ts_ms)
    )
    return raw.select(
        data.alias("data"),
        load_ts.alias("load_ts"),
        load_ts.alias("publish_time"),
        F.concat(F.lit("dbz-"), pos).alias("message_id"),
        F.concat(
            e["source"]["db"], F.lit("."), e["source"]["table"]
        ).alias("source_db_table"),
        F.lit(source_name).alias("subscription_name"),
    )


def synthesize_debezium_from_events(events: DataFrame) -> DataFrame:
    """events table → Debezium-envelope JSON strings (test/bench feed).

    Mirrors :func:`sources.cdc.synthesize_cdc_from_events`' op mapping
    ('error'→d, 'signup'→snapshot-'r', else 'u') but in the NESTED wire
    shape: deletes carry the row image in ``before`` with ``after: null``,
    snapshot reads arrive as op 'r'. Null struct fields are omitted from
    the JSON (Spark's default), as Debezium omits nothing but serializes
    null — ``get_json_object`` returns NULL for both, so the adapter
    can't tell the difference (and needn't).
    """
    from dataplatform_cdc_pipeline_spark.sources.cdc import op_expr
    from dataplatform_cdc_pipeline_spark.sources.tables import normalize_ntz

    events = normalize_ntz(events)
    op = op_expr()
    dbz_op = F.when(op == "c", F.lit("r")).otherwise(op)
    image = F.struct(
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    null_image = F.lit(None).cast(
        "struct<user_id:long,event_type:string,value:double,k:int>"
    )
    return events.select(
        F.to_json(
            F.struct(
                F.when(op == "d", image).otherwise(null_image).alias("before"),
                F.when(op != "d", image).otherwise(null_image).alias("after"),
                dbz_op.alias("op"),
                F.unix_millis("ts").alias("ts_ms"),
                F.struct(
                    F.lit("demo").alias("db"),
                    F.lit("events").alias("table"),
                    F.col("event_id").alias("pos"),
                ).alias("source"),
            )
        ).alias("value")
    )
