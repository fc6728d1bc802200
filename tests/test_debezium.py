"""Debezium envelope adapter (sources/debezium.py): unwrap semantics the
oracle can't isolate — before-image deletes, snapshot ops, unknown ops,
envelope-key collisions, ms-granularity tie resolution."""

import json

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.plans.merge_plan import window_scan
from dataplatform_cdc_pipeline_spark.sources.cdc import user_state_config
from dataplatform_cdc_pipeline_spark.sources.debezium import normalize_debezium


def _wire(spark, rows):
    return spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")


def _env(op, ts_ms, pos, before=None, after=None):
    return {
        "before": before,
        "after": after,
        "op": op,
        "ts_ms": ts_ms,
        "source": {"db": "demo", "table": "t", "pos": pos},
    }


def test_delete_reads_before_image_and_r_maps_to_c(spark):
    raw = normalize_debezium(
        _wire(
            spark,
            [
                _env("r", 1000, 1, after={"user_id": 1, "event_type": "snap"}),
                _env("d", 2000, 2, before={"user_id": 2, "event_type": "gone"}),
            ],
        )
    )
    rows = {
        r["op"]: r
        for r in raw.select(
            F.get_json_object("data", "$.__op").alias("op"),
            F.get_json_object("data", "$.event_type").alias("event_type"),
            F.get_json_object("data", "$.__ts_ns").alias("ts_ns"),
            "message_id",
            "source_db_table",
        ).collect()
    }
    assert rows["c"]["event_type"] == "snap"  # r -> c
    assert rows["d"]["event_type"] == "gone"  # delete unwraps before
    assert rows["c"]["ts_ns"] == "1000000000"  # ms * 1e6
    assert rows["d"]["message_id"] == "dbz-2"
    assert rows["c"]["source_db_table"] == "demo.t"


def test_unknown_op_dropped_by_f1_gate(spark):
    raw = normalize_debezium(
        _wire(
            spark,
            [
                _env("u", 1000, 1, after={"user_id": 1}),
                _env("x", 1000, 2, after={"user_id": 2}),  # not a CDC op
            ],
        )
    )
    w = window_scan(raw, user_state_config(), None, None)
    assert [r["__pos"] for r in w.collect()] == [1]


def test_envelope_key_collision_fails_loudly(spark):
    raw = normalize_debezium(
        _wire(spark, [_env("u", 1000, 1, after={"user_id": 1, "__op": "evil"})])
    )
    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY|duplicate"):
        raw.collect()


def test_ms_truncation_falls_to_pos_tiebreak(spark):
    """Two versions of one key 400µs apart collapse to the same ms — the
    higher source pos must win (merge.sql:319 truncation rule), even
    though their original micro-order says otherwise."""
    from dataplatform_cdc_pipeline_spark.operators.dedup import latest_per_key

    raw = normalize_debezium(
        _wire(
            spark,
            [
                _env("u", 5000, 11, after={"user_id": 7, "event_type": "late-pos"}),
                _env("u", 5000, 10, after={"user_id": 7, "event_type": "early-pos"}),
            ],
        )
    )
    w = window_scan(raw, user_state_config(), None, None)
    keyed = w.select(
        "__op",
        F.col("__pk_raw_0").cast("long").alias("user_id"),
        F.get_json_object("data", "$.event_type").alias("event_type"),
        F.col("__event_ts").alias("source_ts_ns_order"),
        F.col("__pos").alias("pos"),
    )
    out = latest_per_key(keyed, ["user_id"]).collect()
    assert len(out) == 1 and out[0]["event_type"] == "late-pos"


def test_maxwell_markers_dropped_and_delete_image_from_data(spark):
    """Maxwell adapter (sources/maxwell.py): bootstrap-start/-complete
    markers vanish at the op gate; deletes read their image from `data`;
    second-granular ts quantizes __event_ts to whole seconds so the
    xid tiebreak decides sub-second order."""
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import window_scan
    from dataplatform_cdc_pipeline_spark.sources.cdc import user_state_config
    from dataplatform_cdc_pipeline_spark.sources.maxwell import normalize_maxwell

    wire = spark.createDataFrame(
        [
            ('{"database":"demo","table":"t","type":"bootstrap-start","ts":0,"xid":0}',),
            ('{"database":"demo","table":"t","type":"insert","ts":100,'
             '"xid":1,"data":{"user_id":1,"value":1.5}}',),
            ('{"database":"demo","table":"t","type":"delete","ts":100,'
             '"xid":2,"data":{"user_id":1,"value":1.5}}',),
            ('{"database":"demo","table":"t","type":"bootstrap-complete","ts":0,"xid":0}',),
        ],
        "value string",
    )
    raw = normalize_maxwell(wire)
    assert raw.count() == 2  # markers dropped
    w = window_scan(raw, user_state_config(), None, None).orderBy("__pos")
    rows = w.select("__op", "__pos", "__event_ts", "__pk_raw_0").collect()
    assert [(r["__op"], r["__pos"]) for r in rows] == [("c", 1), ("d", 2)]
    # delete carried its PK from `data` (no before/after split in Maxwell)
    assert rows[1]["__pk_raw_0"] == "1"
    # both quantize to the same whole second; pos breaks the tie
    assert rows[0]["__event_ts"] == rows[1]["__event_ts"]
    assert rows[0]["__event_ts"].second == 40  # 100s → 00:01:40 UTC

def test_canal_batch_explode_markers_and_pos_packing(spark):
    """Canal adapter (sources/canal.py): DDL + TRUNCATE envelopes vanish
    at the op gate; one batch envelope fans out via posexplode with
    positions packed as id·1000 + array index; every row in a batch
    inherits the envelope's ms `es` as its event time, so intra-batch
    order is decided by the packed position alone."""
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import window_scan
    from dataplatform_cdc_pipeline_spark.sources.canal import normalize_canal
    from dataplatform_cdc_pipeline_spark.sources.cdc import user_state_config

    wire = spark.createDataFrame(
        [
            ('{"database":"demo","table":"t","type":"ALTER","isDdl":true,'
             '"es":0,"ts":0,"id":0,"sql":"ALTER TABLE t ADD c INT"}',),
            ('{"database":"demo","table":"t","type":"TRUNCATE","isDdl":false,'
             '"es":0,"ts":0,"id":0,"data":null}',),
            ('{"database":"demo","table":"t","type":"INSERT","isDdl":false,'
             '"es":5000,"ts":5001,"id":7,"pkNames":["user_id"],'
             '"data":[{"user_id":1,"value":1.5},{"user_id":2,"value":2.5}]}',),
            ('{"database":"demo","table":"t","type":"DELETE","isDdl":false,'
             '"es":5000,"ts":5002,"id":8,"pkNames":["user_id"],'
             '"data":[{"user_id":1,"value":1.5}]}',),
        ],
        "value string",
    )
    raw = normalize_canal(wire)
    assert raw.count() == 3  # 2 markers dropped, batch of 2 exploded
    w = window_scan(raw, user_state_config(), None, None).orderBy("__pos")
    rows = w.select("__op", "__pos", "__event_ts", "__pk_raw_0").collect()
    assert [(r["__op"], r["__pos"]) for r in rows] == [
        ("c", 7000),
        ("c", 7001),
        ("d", 8000),
    ]
    assert [r["__pk_raw_0"] for r in rows] == ["1", "2", "1"]
    # all three share the envelope-level ms commit instant
    assert len({r["__event_ts"] for r in rows}) == 1


def test_canal_batch_survivorship_falls_to_packed_pos(spark):
    """Two envelopes at the same `es`: the later envelope id (and within
    one envelope, the later array slot) wins the W1 dedup — Canal's
    statement granularity means position, not time, orders a burst."""
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import (
        latest_per_key,
        window_scan,
    )
    from dataplatform_cdc_pipeline_spark.sources.canal import normalize_canal
    from dataplatform_cdc_pipeline_spark.sources.cdc import user_state_config

    wire = spark.createDataFrame(
        [
            ('{"database":"demo","table":"t","type":"UPDATE","isDdl":false,'
             '"es":9000,"ts":9000,"id":3,"pkNames":["user_id"],'
             '"data":[{"user_id":1,"event_type":"first"},'
             '{"user_id":1,"event_type":"second"}]}',),
            ('{"database":"demo","table":"t","type":"UPDATE","isDdl":false,'
             '"es":9000,"ts":9000,"id":2,"pkNames":["user_id"],'
             '"data":[{"user_id":1,"event_type":"stale"}]}',),
        ],
        "value string",
    )
    w = window_scan(normalize_canal(wire), user_state_config(), None, None)
    keyed = w.select(
        "__op",
        F.col("__pk_raw_0").cast("long").alias("user_id"),
        F.get_json_object("data", "$.event_type").alias("event_type"),
        F.col("__event_ts").alias("source_ts_ns_order"),
        F.col("__pos").alias("pos"),
    )
    out = latest_per_key(keyed, ["user_id"]).collect()
    assert len(out) == 1 and out[0]["event_type"] == "second"  # id 3, idx 1
