"""F5.11 multi-PK tests (step-7 parity: step-7:206-276) + string-PK fidelity."""

import datetime
import json
import tempfile
import uuid

from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.config import MergeConfig
from dataplatform_cdc_pipeline_spark.engine import run_merge
from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore

MULTI_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("tenant_id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)

BASE_NS = 1_704_067_200_000_000_000


def bronze2(spark, rows):
    """rows: (op, ts_off_us, pos, id, tenant_id, v)"""
    data = []
    for op, off, pos, id_, tid, v in rows:
        payload = json.dumps(
            {"__op": op, "__ts_ns": str(BASE_NS + off * 1000), "__source_pos": str(pos),
             "id": id_, "tenant_id": tid, "v": v}
        )
        data.append((payload, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=pos)))
    return spark.createDataFrame(data, "data string, load_ts timestamp")


def multi_pipeline(spark, **cfg_kwargs):
    cfg = MergeConfig.from_dict(
        {"cdc_table": "x", "target_table": "multi", "pk": "id,tenant_id", "ts_ns_encoding": "nanos",
         **cfg_kwargs}
    )
    d = f"{tempfile.mkdtemp(prefix='cdc_mpk_')}/{uuid.uuid4().hex[:6]}"
    return (
        cfg,
        ParquetMergeTarget(spark, f"{d}/t", cfg, MULTI_SCHEMA),
        WatermarkStore(spark, f"{d}/a"),
    )


def mstate(target):
    return sorted((r["id"], r["tenant_id"], r["v"]) for r in target.read().collect())


def test_same_id_different_tenant_no_collision(spark):
    cfg, target, audit = multi_pipeline(spark)
    rows = [
        ("c", 1, 1, 1, 10, "a"),
        ("c", 2, 2, 1, 20, "b"),  # same id, different tenant
        ("u", 3, 3, 1, 10, "a2"),
        ("d", 4, 4, 1, 20, ""),  # delete only tenant 20
    ]
    run_merge(spark, cfg, target, audit, raw=bronze2(spark, rows), window=(None, None),
              deterministic_audit=True)
    assert mstate(target) == [(1, 10, "a2")]


def test_multi_pk_two_stream(spark):
    cfg, target, audit = multi_pipeline(spark, two_stream_fidelity=True)
    rows = [
        ("c", 1, 1, 1, 10, "a"),
        ("c", 1, 2, 2, 10, "b"),
        ("d", 5, 3, 2, 10, ""),
        ("c", 9, 4, 2, 10, "b2"),  # reinsert newer than delete
    ]
    run_merge(spark, cfg, target, audit, raw=bronze2(spark, rows), window=(None, None),
              deterministic_audit=True)
    assert mstate(target) == [(1, 10, "a"), (2, 10, "b2")]


def test_string_pk_dedup_fidelity(spark):
    """Reference hazard (SURVEY.md §4): '01' and '1' dedup separately on the
    string form but merge-join equal. Default engine casts PKs first."""
    import datetime as dt

    rows = []
    for i, (op, off, pos, raw_id, v) in enumerate(
        [("c", 1, 1, "01", "old"), ("u", 2, 2, "1", "new")]
    ):
        payload = json.dumps(
            {"__op": op, "__ts_ns": str(BASE_NS + off * 1000), "__source_pos": str(pos),
             "id": raw_id, "tenant_id": 1, "v": v}
        )
        rows.append((payload, dt.datetime(2024, 1, 1, 0, 0, pos)))
    raw = spark.createDataFrame(rows, "data string, load_ts timestamp")

    # default: cast-before-dedup → one key → newest wins
    cfg, target, audit = multi_pipeline(spark)
    run_merge(spark, cfg, target, audit, raw=raw, window=(None, None), deterministic_audit=True)
    assert mstate(target) == [(1, 1, "new")]
