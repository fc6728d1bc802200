"""Streaming front-end tests: foreachBatch merge with checkpointed source."""

import datetime
import json
import tempfile

from dataplatform_cdc_pipeline_spark.streaming import run_streaming_merge
from tests.helpers import BASE_NS, pipeline, state


def write_bronze(spark, path, rows):
    data = []
    for op, ts_off_us, pos, uid, value in rows:
        payload = json.dumps(
            {"__op": op, "__ts_ns": str(BASE_NS + ts_off_us * 1000), "__source_pos": str(pos),
             "user_id": uid, "event_type": "t", "value": value, "k": 1}
        )
        data.append(
            (payload, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=pos),
             datetime.datetime(2024, 1, 1), f"m-{pos}", "demo.t", "sub")
        )
    spark.createDataFrame(
        data,
        "data string, load_ts timestamp, publish_time timestamp, "
        "message_id string, source_db_table string, subscription_name string",
    ).coalesce(1).write.mode("append").parquet(path)


def test_streaming_merge_incremental(spark):
    tmp = tempfile.mkdtemp(prefix="cdc_stream_")
    src, ckpt = f"{tmp}/bronze", f"{tmp}/ckpt"
    cfg, target, audit = pipeline(spark, tmpdir=tmp)

    # batch 1
    write_bronze(spark, src, [("c", 1, 1, 1, 1.0), ("c", 2, 2, 2, 2.0)])
    run_streaming_merge(spark, cfg, target, audit, src, ckpt, deterministic_audit=True)
    assert state(target) == [(1, 1.0), (2, 2.0)]

    # batch 2: update + delete land later; checkpoint resumes past batch 1
    write_bronze(spark, src, [("u", 3, 3, 1, 9.0), ("d", 4, 4, 2, 0.0)])
    run_streaming_merge(spark, cfg, target, audit, src, ckpt, deterministic_audit=True)
    assert state(target) == [(1, 9.0)]

    # audit rows appended per micro-batch
    assert audit.history().count() >= 2

    # replaying with the same checkpoint is a no-op (exactly-once)
    run_streaming_merge(spark, cfg, target, audit, src, ckpt, deterministic_audit=True)
    assert state(target) == [(1, 9.0)]
