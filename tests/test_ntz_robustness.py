"""Regression tests for TIMESTAMP_NTZ landing data (the round-2 killer).

The driver's ``events.parquet`` stores ``ts`` as parquet ``timestamp[us]``
WITHOUT the adjusted-to-UTC flag; Spark 4's default reader infers
``TIMESTAMP_NTZ`` and every ``unix_micros`` call site analysis-fails
(DATATYPE_MISMATCH). The engine must be robust to whatever the landing
zone wrote — mirroring the reference bronze scan (merge.sql:307-326),
which does no type ceremony.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.sources.cdc import synthesize_cdc_from_events
from dataplatform_cdc_pipeline_spark.sources.tables import load_table, normalize_ntz


@pytest.fixture(scope="module")
def ntz_dir(tmp_path_factory):
    """A testdata-shaped dir whose events.parquet is deliberately NTZ."""
    d = tmp_path_factory.mktemp("ntz_sf")
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            # timestamp('us') with no tz → isAdjustedToUTC=false in parquet
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 12, 0, 0, 123456 * 0 + i) for i in range(3)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([10, 20, 10], pa.int64()),
            "event_type": pa.array(["signup", "click", "error"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', None], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_load_table_normalizes_ntz_to_tz(spark, ntz_dir):
    df = load_table(spark, ntz_dir, "events")
    ts_type = dict((f.name, f.dataType) for f in df.schema.fields)["ts"]
    assert isinstance(ts_type, T.TimestampType), ts_type
    # epoch arithmetic must resolve and be UTC-wall-clock-preserving
    row = df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).first()
    expect = int(datetime.datetime(2024, 1, 1, 12, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert row["us"] == expect


def test_synthesize_cdc_accepts_ntz_frame(spark, ntz_dir):
    # bypass load_table's normalization: read with NTZ inference forced on
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(f"{ntz_dir}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if not isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
        pytest.skip("reader did not produce NTZ in this environment")
    out = synthesize_cdc_from_events(raw).collect()
    assert len(out) == 3
    assert all(r["data"] is not None for r in out)


def test_normalize_ntz_is_noop_on_tz(spark):
    df = spark.range(2).select(F.current_timestamp().alias("t"), "id")
    out = normalize_ntz(df)
    assert out.schema == df.schema


def test_normalize_ntz_casts_ntz_columns(spark):
    df = spark.range(2).select(
        F.current_timestamp().cast("timestamp_ntz").alias("t_ntz"),
        F.current_timestamp().alias("t_tz"),
        "id",
    )
    out = normalize_ntz(df)
    types = {f.name: f.dataType for f in out.schema.fields}
    assert isinstance(types["t_ntz"], T.TimestampType)
    assert isinstance(types["t_tz"], T.TimestampType)


def test_schema_contract_flags_drift(spark, tmp_path):
    # an events table whose ts drifted to string must fail loudly by name
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(["2024-01-01"], pa.string()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    with pytest.raises(TypeError, match="events.ts"):
        load_table(spark, str(tmp_path), "events")


def _write_events(path, ts_array):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "events.parquet"))


@pytest.mark.parametrize(
    "unit,scale",
    [("ns", 1_000_000_000), ("us", 1_000_000), ("ms", 1_000), ("s", 1)],
)
def test_load_table_absorbs_epoch_integer_timestamps(spark, tmp_path, unit, scale):
    """Drift guard: an events.ts shipped as a plain epoch int (any unit)
    converts by magnitude — the driver has already changed this column's
    physical type twice across rounds."""
    d = tmp_path / unit
    d.mkdir()
    epoch_s = int(
        datetime.datetime(2024, 3, 1, 6, 30, tzinfo=datetime.timezone.utc).timestamp()
    )
    _write_events(d, pa.array([epoch_s * scale, (epoch_s + 60) * scale], pa.int64()))
    df = load_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = [r["us"] for r in df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).collect()]
    assert got == [epoch_s * 1_000_000, (epoch_s + 60) * 1_000_000]


def test_load_table_rejects_non_epoch_long_ts(spark, tmp_path):
    """A long ts column that is NOT an epoch (e.g. a counter) must fail the
    schema contract, not silently convert to a wrong-era timestamp."""
    _write_events(tmp_path, pa.array([42, 43], pa.int64()))
    with pytest.raises(TypeError, match="implausible range"):
        load_table(spark, str(tmp_path), "events")


def test_load_table_widens_date_to_timestamp(spark, tmp_path):
    tbl = pa.table(
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([1], pa.int64()),
            "o_orderstatus": pa.array(["O"], pa.string()),
            "o_totalprice": pa.array([10.0], pa.float64()),
            "o_orderdate": pa.array([datetime.date(1995, 6, 1)], pa.date32()),
            "o_orderpriority": pa.array(["1-URGENT"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    df = load_table(spark, str(tmp_path), "orders")
    assert isinstance(df.schema["o_orderdate"].dataType, T.TimestampType)
    row = df.select(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("d")).first()
    assert row["d"] == "1995-06-01 00:00:00"
