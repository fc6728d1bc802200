"""Shared fixture builders for CDC scenario tests (FIXTURES.md F5)."""

from __future__ import annotations

import datetime
import json
import tempfile
import uuid

from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

# base event time: 2024-01-01 in epoch nanos, microsecond-aligned
BASE_NS = 1_704_067_200_000_000_000


def bronze(spark, rows):
    """rows: (op, ts_off_us, pos, user_id, value) → bronze CDC frame.

    ts_off_us is microseconds after BASE; load_ts tracks pos for windowing.
    """
    data = []
    for op, ts_off_us, pos, uid, value in rows:
        payload = json.dumps(
            {
                "__op": op,
                "__ts_ns": str(BASE_NS + ts_off_us * 1000),
                "__source_pos": str(pos),
                "user_id": uid,
                "event_type": "t",
                "value": value,
                "k": 1,
            }
        )
        data.append((payload, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=pos)))
    return spark.createDataFrame(data, "data string, load_ts timestamp")


def pipeline(spark, tmpdir=None, **cfg_kwargs):
    cfg = user_state_config(**cfg_kwargs)
    d = tmpdir or tempfile.mkdtemp(prefix="cdc_test_")
    d = f"{d}/{uuid.uuid4().hex[:6]}"
    target = ParquetMergeTarget(spark, f"{d}/t", cfg, USER_STATE_SCHEMA)
    audit = WatermarkStore(spark, f"{d}/a")
    return cfg, target, audit


def state(target):
    """target → sorted [(user_id, value), ...]"""
    return sorted(
        (r["user_id"], r["value"]) for r in target.read().select("user_id", "value").collect()
    )
