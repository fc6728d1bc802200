"""Per-rule tests for the cast engine (SURVEY.md §2.2, P1-P20)."""

import datetime
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.config import MergeConfig
from dataplatform_cdc_pipeline_spark.functions.envelope import parse_payload
from dataplatform_cdc_pipeline_spark.plans.cast_rules import SYS_END_TIME, cast_expr


def one(spark, payload: dict, field: T.StructField, **cfg_kwargs):
    cfg = MergeConfig.from_dict({"cdc_table": "x", "target_table": "t", "pk": "id", **cfg_kwargs})
    df = spark.createDataFrame([(json.dumps(payload),)], "data string")
    return df.select(cast_expr(field, cfg, parse_payload("data"))).first()[0]


def test_p1_sysendtime_sentinel(spark):
    v = one(spark, {"SysEndTime": "whatever"}, T.StructField("SysEndTime", T.TimestampType()))
    assert v == SYS_END_TIME


def test_p2_rowkey_binary_bigendian(spark):
    import base64, struct

    n = 1_234_567_890_123
    b64 = base64.b64encode(struct.pack(">q", n)).decode()
    v = one(spark, {"rk": b64}, T.StructField("Rowkeynum", T.LongType()), row_key_binary="rk")
    assert v == n


def test_p2_rowkey_binary_negative_wraps(spark):
    import base64, struct

    # high bit set → reference's << arithmetic yields a negative INT64
    raw = struct.pack(">Q", 0x8000000000000001)
    b64 = base64.b64encode(raw).decode()
    v = one(spark, {"rk": b64}, T.StructField("Rowkeynum", T.LongType()), row_key_binary="rk")
    assert v == struct.unpack(">q", raw)[0] == -9223372036854775807


def test_p3_rowkey_timestamp(spark):
    v = one(
        spark,
        {"rk_ts": "2025-09-07 12:07:01"},
        T.StructField("Rowkeynum", T.LongType()),
        row_key_timestamp="rk_ts",
    )
    assert v == int(datetime.datetime(2025, 9, 7, 12, 7, 1, tzinfo=datetime.timezone.utc).timestamp())


def test_p4_epoch_nanos(spark):
    ns = 1_718_000_000_123_456_789
    v = one(spark, {"c": str(ns)}, T.StructField("c", T.TimestampType()), epoc_nano_cols="c")
    assert v == datetime.datetime.fromtimestamp(ns // 1000 / 1e6, datetime.timezone.utc).replace(tzinfo=None)
    assert v.microsecond == 123456  # integer-div truncation, no float error


def test_p5_epoch_days(spark):
    v = one(spark, {"d": "19000"}, T.StructField("d", T.DateType()), epoc_day_cols="d")
    assert v == datetime.date(1970, 1, 1) + datetime.timedelta(days=19000)


def test_p6_epoch_seconds(spark):
    v = one(spark, {"s": "1718000000"}, T.StructField("s", T.TimestampType()), epoc_cols="s")
    assert v == datetime.datetime(2024, 6, 10, 6, 13, 20)


@pytest.mark.parametrize("raw,expected", [("true", 1), ("false", 0), ("TRUE", None), ("x", None)])
def test_p7_bit_to_int(spark, raw, expected):
    # exact-case match only, like the reference's CASE WHEN 'true' (merge.sql:253-255)
    v = one(spark, {"b": raw}, T.StructField("b", T.IntegerType()), bit_to_int_col="b")
    assert v == expected


def test_p8_iso_datetime_strips_tz(spark):
    v = one(
        spark,
        {"t": "2021-02-11T17:02:30Z"},
        T.StructField("t", T.TimestampType()),
        non_epoch_datetime_col="t",
    )
    assert v == datetime.datetime(2021, 2, 11, 17, 2, 30)


def test_p9_datetime_to_int(spark):
    v = one(
        spark,
        {"t": "2025-09-07T12:07:01Z"},
        T.StructField("t", T.LongType()),
        datetime_to_int_val_col="t",
    )
    assert v == 20250907120701


def test_p10_ist_clock_column(spark):
    before = datetime.datetime.utcnow() + datetime.timedelta(hours=5, minutes=30)
    v = one(
        spark,
        {"i": "ignored"},
        T.StructField("i", T.TimestampType()),
        col_value_as_current_time_ist="i",
    )
    after = datetime.datetime.utcnow() + datetime.timedelta(hours=5, minutes=30)
    assert before - datetime.timedelta(minutes=1) <= v <= after + datetime.timedelta(minutes=1)


@pytest.mark.parametrize(
    "raw,expected",
    [("true", True), ("1", True), ("FALSE", False), ("0", False), ("yes", None)],
)
def test_p11_bool(spark, raw, expected):
    # case-insensitive, unlike P7 (merge.sql:265-269 LOWERs the value)
    v = one(spark, {"b": raw}, T.StructField("b", T.BooleanType()))
    assert v is expected


def test_p12_timestamp_iso(spark):
    v = one(spark, {"t": "2021-02-11T17:02:30Z"}, T.StructField("t", T.TimestampType()))
    assert v == datetime.datetime(2021, 2, 11, 17, 2, 30)


def test_p15_default_casts(spark):
    assert one(spark, {"n": "42"}, T.StructField("n", T.LongType())) == 42
    assert one(spark, {"n": "4.25"}, T.StructField("n", T.DoubleType())) == 4.25
    assert one(spark, {"n": "hello"}, T.StructField("n", T.StringType())) == "hello"
    from decimal import Decimal

    assert one(spark, {"n": "12.3456"}, T.StructField("n", T.DecimalType(18, 4))) == Decimal(
        "12.3456"
    )


def test_p16_null_string(spark):
    for dt in (T.LongType(), T.StringType(), T.TimestampType()):
        assert one(spark, {"n": "null"}, T.StructField("n", dt)) is None


def test_p19_json_key_override(spark):
    v = one(
        spark,
        {"place": "mumbai"},
        T.StructField("PLACE", T.StringType()),
        json_key_overrides={"PLACE": "place"},
    )
    assert v == "mumbai"


def test_p20_config_normalization():
    cfg = MergeConfig.from_dict(
        {
            "cdc_table": "x",
            "target_table": "t",
            "pk": " id , tenant_id ",
            "epoc_cols": "",
            "row_key_binary": "",
            "epoc_day_cols": "a, b ,c",
        }
    )
    assert cfg.pk == ("id", "tenant_id")
    assert cfg.epoc_cols == ()
    assert cfg.row_key_binary is None
    assert cfg.epoc_day_cols == ("a", "b", "c")


def test_missing_key_is_null(spark):
    assert one(spark, {"other": 1}, T.StructField("n", T.LongType())) is None


def test_p13_datetime_millis(spark):
    v = one(
        spark,
        {"m": "1718000000123"},
        T.StructField("m", T.TimestampType()),
        datetime_millis_cols="m",
    )
    assert v == datetime.datetime(2024, 6, 10, 6, 13, 20, 123000)
    # NUMERIC hop tolerates decimal text (merge.sql:276 CAST(... AS NUMERIC))
    v2 = one(
        spark,
        {"m": "1718000000123.0"},
        T.StructField("m", T.TimestampType()),
        datetime_millis_cols="m",
    )
    assert v2 == v
