"""Regression pins for the r13 optimization round.

1. The wire-format adapters (Debezium/Maxwell/Canal) were rewritten from
   N scalar ``get_json_object`` probes + a second ``from_json`` of the
   extracted row-image text to ONE ``from_json`` of the whole envelope
   (guide §1.2 — six/seven full JSON parses per row → one). These tests
   pin exact output equality against the OLD formulation, rebuilt
   verbatim, over fixtures that exercise every divergence candidate:
   markers with absent fields, deletes (null after), JSON-null images,
   unicode and numeric literal values, absent isDdl.

2. ``spread_scan`` (the scan-parallelism floor) must be a no-op on a
   frame already at/above the session's parallelism and must respread a
   narrow scan without changing content.
"""

import pandas as pd
from pyspark.sql import functions as F


def _assert_frames_equal(a_df, b_df, sort_cols):
    a = a_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    b = b_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# Maxwell
# ---------------------------------------------------------------------------

_MAXWELL_WIRE = [
    '{"database":"demo","table":"t","type":"insert","ts":1700000001,"xid":11,'
    '"data":{"user_id":1,"event_type":"sign\\u00fcp","value":12.5,"k":3}}',
    '{"database":"demo","table":"t","type":"update","ts":1700000002,"xid":12,'
    '"data":{"user_id":1,"event_type":null,"value":-0.25,"k":null}}',
    '{"database":"demo","table":"t","type":"delete","ts":1700000003,"xid":13,'
    '"data":{"user_id":2,"event_type":"x","value":0,"k":7}}',
    '{"database":"demo","table":"t","type":"bootstrap-insert","ts":1700000004,'
    '"xid":14,"data":{"user_id":3,"event_type":"s","value":1e3,"k":0}}',
    # markers: no data, ts/xid zero — must drop at the op gate
    '{"database":"demo","table":"t","type":"bootstrap-start","ts":0,"xid":0}',
    '{"database":"demo","table":"t","type":"bootstrap-complete","ts":0,"xid":0}',
]


def _old_normalize_maxwell(raw):
    from dataplatform_cdc_pipeline_spark.sources.maxwell import _engine_op

    v = F.col("value")
    op = _engine_op(F.get_json_object(v, "$.type"))
    ts_s = F.get_json_object(v, "$.ts").cast("long")
    pos = F.get_json_object(v, "$.xid").cast("string")
    payload = F.from_json(F.get_json_object(v, "$.data"), "map<string,string>")
    envelope = F.create_map(
        F.lit("__op"), op,
        F.lit("__ts_ns"), (ts_s * F.lit(1_000_000_000)).cast("string"),
        F.lit("__source_pos"), pos,
    )
    data = F.to_json(F.map_concat(payload, envelope))
    load_ts = F.timestamp_seconds(ts_s)
    return raw.filter(op.isNotNull()).select(
        data.alias("data"),
        load_ts.alias("load_ts"),
        load_ts.alias("publish_time"),
        F.concat(F.lit("mxw-"), pos).alias("message_id"),
        F.concat(
            F.get_json_object(v, "$.database"),
            F.lit("."),
            F.get_json_object(v, "$.table"),
        ).alias("source_db_table"),
        F.lit("maxwell").alias("subscription_name"),
    )


def test_normalize_maxwell_single_parse_identical(spark):
    from dataplatform_cdc_pipeline_spark.sources.maxwell import normalize_maxwell

    raw = spark.createDataFrame([(s,) for s in _MAXWELL_WIRE], "value string")
    _assert_frames_equal(
        normalize_maxwell(raw), _old_normalize_maxwell(raw), ["message_id"]
    )


# ---------------------------------------------------------------------------
# Debezium
# ---------------------------------------------------------------------------

_DBZ_WIRE = [
    '{"before":null,"after":{"user_id":1,"event_type":"a","value":2.5,"k":1},'
    '"op":"c","ts_ms":1700000001001,"source":{"db":"demo","table":"t","pos":21}}',
    '{"before":{"user_id":1,"event_type":"a","value":2.5,"k":1},"after":null,'
    '"op":"d","ts_ms":1700000002002,"source":{"db":"demo","table":"t","pos":22}}',
    '{"before":{"user_id":2,"event_type":"b","value":1,"k":2},'
    '"after":{"user_id":2,"event_type":"b2","value":3,"k":2},'
    '"op":"u","ts_ms":1700000003003,"source":{"db":"demo","table":"t","pos":23}}',
    '{"before":null,"after":{"user_id":3,"event_type":"c","value":4,"k":3},'
    '"op":"r","ts_ms":1700000004004,"source":{"db":"demo","table":"t","pos":24}}',
    # unknown op → NULL op row rides through (window_scan's F1 gate drops it)
    '{"before":null,"after":{"user_id":4},"op":"x","ts_ms":1700000005005,'
    '"source":{"db":"demo","table":"t","pos":25}}',
]


def _old_normalize_debezium(raw):
    from dataplatform_cdc_pipeline_spark.sources.debezium import _engine_op

    v = F.col("value")
    op = _engine_op(F.get_json_object(v, "$.op"))
    ts_ms = F.get_json_object(v, "$.ts_ms").cast("long")
    pos = F.get_json_object(v, "$.source.pos").cast("string")
    row_image = F.coalesce(
        F.get_json_object(v, "$.after"), F.get_json_object(v, "$.before")
    )
    payload = F.from_json(row_image, "map<string,string>")
    envelope = F.create_map(
        F.lit("__op"), op,
        F.lit("__ts_ns"), (ts_ms * F.lit(1_000_000)).cast("string"),
        F.lit("__source_pos"), pos,
    )
    data = F.to_json(F.map_concat(payload, envelope))
    load_ts = F.timestamp_millis(ts_ms)
    return raw.select(
        data.alias("data"),
        load_ts.alias("load_ts"),
        load_ts.alias("publish_time"),
        F.concat(F.lit("dbz-"), pos).alias("message_id"),
        F.concat(
            F.get_json_object(v, "$.source.db"),
            F.lit("."),
            F.get_json_object(v, "$.source.table"),
        ).alias("source_db_table"),
        F.lit("debezium").alias("subscription_name"),
    )


def test_normalize_debezium_single_parse_identical(spark):
    from dataplatform_cdc_pipeline_spark.sources.debezium import normalize_debezium

    raw = spark.createDataFrame([(s,) for s in _DBZ_WIRE], "value string")
    _assert_frames_equal(
        normalize_debezium(raw), _old_normalize_debezium(raw), ["message_id"]
    )


# ---------------------------------------------------------------------------
# Canal
# ---------------------------------------------------------------------------

_CANAL_WIRE = [
    '{"database":"demo","table":"t","type":"INSERT","isDdl":false,'
    '"es":1700000001001,"ts":1700000001500,"id":5,"pkNames":["user_id"],'
    '"data":[{"user_id":1,"value":1.5},{"user_id":2,"value":null}]}',
    '{"database":"demo","table":"t","type":"DELETE","isDdl":false,'
    '"es":1700000002002,"ts":1700000002500,"id":6,"pkNames":["user_id"],'
    '"data":[{"user_id":1,"value":1.5}]}',
    # DDL marker (no data), TRUNCATE with null data, absent isDdl
    '{"database":"demo","table":"t","type":"ALTER","isDdl":true,'
    '"es":0,"ts":0,"id":0,"sql":"ALTER TABLE t ADD COLUMN x INT"}',
    '{"database":"demo","table":"t","type":"TRUNCATE","isDdl":false,'
    '"es":0,"ts":0,"id":0,"data":null}',
    '{"database":"demo","table":"t","type":"UPDATE",'
    '"es":1700000003003,"ts":1700000003500,"id":7,"pkNames":["user_id"],'
    '"data":[{"user_id":3,"value":9}]}',
]


def _old_normalize_canal(raw):
    from dataplatform_cdc_pipeline_spark.sources.canal import (
        _BATCH_POS_WIDTH,
        _engine_op,
    )

    v = F.col("value")
    is_ddl = F.get_json_object(v, "$.isDdl") == "true"
    op = _engine_op(F.get_json_object(v, "$.type"), is_ddl)
    es_ms = F.get_json_object(v, "$.es").cast("long")
    env_id = F.get_json_object(v, "$.id").cast("long")
    rows = F.from_json(F.get_json_object(v, "$.data"), "array<map<string,string>>")
    gated = raw.filter(op.isNotNull() & rows.isNotNull()).select(
        op.alias("__cnl_op"),
        es_ms.alias("__cnl_es_ms"),
        env_id.alias("__cnl_id"),
        F.get_json_object(v, "$.database").alias("__cnl_db"),
        F.get_json_object(v, "$.table").alias("__cnl_tbl"),
        F.posexplode(rows).alias("__cnl_idx", "__cnl_row"),
    )
    guarded_idx = F.when(
        F.col("__cnl_idx") < _BATCH_POS_WIDTH, F.col("__cnl_idx")
    ).otherwise(F.raise_error(F.lit("canal batch exceeds 1000 rows")))
    pos = F.col("__cnl_id") * _BATCH_POS_WIDTH + guarded_idx
    envelope = F.create_map(
        F.lit("__op"), F.col("__cnl_op"),
        F.lit("__ts_ns"), (F.col("__cnl_es_ms") * F.lit(1_000_000)).cast("string"),
        F.lit("__source_pos"), pos.cast("string"),
    )
    load_ts = F.timestamp_millis(F.col("__cnl_es_ms"))
    return gated.select(
        F.to_json(F.map_concat(F.col("__cnl_row"), envelope)).alias("data"),
        load_ts.alias("load_ts"),
        load_ts.alias("publish_time"),
        F.concat(
            F.lit("cnl-"), F.col("__cnl_id"), F.lit("-"), F.col("__cnl_idx")
        ).alias("message_id"),
        F.concat(F.col("__cnl_db"), F.lit("."), F.col("__cnl_tbl")).alias(
            "source_db_table"
        ),
        F.lit("canal").alias("subscription_name"),
    )


def test_normalize_canal_single_parse_identical(spark):
    from dataplatform_cdc_pipeline_spark.sources.canal import normalize_canal

    raw = spark.createDataFrame([(s,) for s in _CANAL_WIRE], "value string")
    _assert_frames_equal(
        normalize_canal(raw), _old_normalize_canal(raw), ["message_id"]
    )


# ---------------------------------------------------------------------------
# spread_scan
# ---------------------------------------------------------------------------


def test_spread_scan_respreads_narrow_and_noops_wide(spark):
    from dataplatform_cdc_pipeline_spark.sources.tables import spread_scan

    n = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 1).select(F.col("id"))
    wide = spark.range(0, 1000, 1, n).select(F.col("id"))

    s = spread_scan(narrow)
    assert s.rdd.getNumPartitions() == n
    assert sorted(r["id"] for r in s.collect()) == list(range(1000))

    # already at the floor: the SAME plan comes back (no added exchange)
    assert spread_scan(wide) is wide
