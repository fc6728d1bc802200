"""Payload schema drift lifecycle (operators/schema_drift.py): a CDC
payload presenting a NEW business key mid-stream, under all three policies.
The reference re-reads INFORMATION_SCHEMA per run (merge.sql:289-294);
here the behavior is explicit config."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.engine import run_merge
from dataplatform_cdc_pipeline_spark.operators.schema_drift import (
    SchemaDriftError,
    detect_payload_drift,
)
from dataplatform_cdc_pipeline_spark.plans.merge_plan import window_scan
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA
from tests.helpers import BASE_NS, pipeline

BASE = datetime.datetime(2024, 1, 1)


def bronze_drift(spark, rows):
    """rows: (op, ts_off_us, pos, user_id, value, extra_or_None) — the
    'extra' key appears in the payload only when not None (the mid-stream
    new-column event)."""
    data = []
    for op, ts_off_us, pos, uid, value, extra in rows:
        payload = {
            "__op": op,
            "__ts_ns": str(BASE_NS + ts_off_us * 1000),
            "__source_pos": str(pos),
            "user_id": uid,
            "event_type": "t",
            "value": value,
            "k": 1,
        }
        if extra is not None:
            payload["extra"] = extra
        data.append((json.dumps(payload), BASE + datetime.timedelta(seconds=pos)))
    return spark.createDataFrame(data, "data string, load_ts timestamp")


def test_detection_respects_overrides_and_envelope(spark):
    cfg, target, audit = pipeline(spark, json_key_overrides={"event_type": "etype"})
    raw = bronze_drift(spark, [("c", 0, 1, 1, 1.0, "x")]).selectExpr(
        "replace(data, '\"event_type\"', '\"etype\"') AS data", "load_ts"
    )
    w = window_scan(raw, cfg, None, None)
    # 'etype' is known via the override; envelope keys never flagged;
    # only the genuinely new 'extra' surfaces
    assert detect_payload_drift(w, target.schema, cfg) == ["extra"]


def test_drift_ignore_drops_key(spark):
    cfg, target, audit = pipeline(spark)  # default policy: ignore
    run_merge(spark, cfg, target, audit,
              raw=bronze_drift(spark, [("c", 0, 1, 1, 1.0, "x")]),
              window=(None, None), deterministic_audit=True)
    assert "extra" not in [f.name for f in target.schema.fields]
    assert target.read().count() == 1


def test_drift_fail_writes_failed_audit(spark):
    cfg, target, audit = pipeline(spark, schema_drift_policy="fail")
    with pytest.raises(SchemaDriftError, match="extra"):
        run_merge(spark, cfg, target, audit,
                  raw=bronze_drift(spark, [("c", 0, 1, 1, 1.0, "x")]),
                  window=(None, None), deterministic_audit=True)
    assert not target.exists()  # no DML happened
    rows = audit.history().collect()
    assert [r["run_status"] for r in rows] == ["FAILED"]
    assert "extra" in rows[0]["error_msg"]


def test_drift_evolve_two_phase_lifecycle(spark):
    """Phase 1 has no 'extra' key; phase 2 presents it. Under 'evolve' the
    column is added before the phase-2 merge: phase-2-written keys carry
    values, keys last written in phase 1 read NULL (their bucket files
    predate the column)."""
    cfg, target, audit = pipeline(spark, schema_drift_policy="evolve")
    split = BASE + datetime.timedelta(seconds=50)
    raw = bronze_drift(spark, [
        ("c", 0, 1, 1, 1.0, None),
        ("c", 0, 2, 2, 2.0, None),
        ("u", 100, 100, 2, 9.0, "e2"),   # post-split: new key appears
        ("c", 100, 101, 3, 3.0, "e3"),
    ])
    run_merge(spark, cfg, target, audit, raw=raw, window=(None, split),
              deterministic_audit=True)
    assert "extra" not in [f.name for f in target.schema.fields]
    run_merge(spark, cfg, target, audit, raw=raw, window=(split, None),
              deterministic_audit=True)
    got = {
        (r["user_id"], r["value"], r["extra"])
        for r in target.read().select("user_id", "value", "extra").collect()
    }
    assert got == {(1, 1.0, None), (2, 9.0, "e2"), (3, 3.0, "e3")}
    # evolved column is a nullable string (JSON landing type, P15)
    field = [f for f in target.schema.fields if f.name == "extra"][0]
    assert field.dataType.simpleString() == "string" and field.nullable


def test_drift_evolve_is_idempotent_across_runs(spark):
    """A replay of the drifted window against the already-evolved target
    must not try to re-add the column."""
    cfg, target, audit = pipeline(spark, schema_drift_policy="evolve")
    raw = bronze_drift(spark, [("c", 0, 1, 1, 1.0, "x")])
    run_merge(spark, cfg, target, audit, raw=raw, window=(None, None),
              deterministic_audit=True)
    run_merge(spark, cfg, target, audit, raw=raw, window=(None, None),
              deterministic_audit=True)
    assert [r["extra"] for r in target.read().collect()] == ["x"]
