"""Canonical loader for the driver's synthetic tables (TESTDATA.md).

Handles one environment quirk: ``events.parquet`` stores ``ts`` as parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects by default.
``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) reads it as
epoch-nanos LongType; the loader converts to TimestampType at microsecond
precision (floor), matching DuckDB's ``ts::TIMESTAMP`` truncation so
oracles line up exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver's verify harness supplies ITS OWN SparkSession — pin the
    # session timezone at runtime so ISO-timestamp parsing and epoch
    # conversions match the UTC-naive DuckDB oracle regardless of the
    # caller's JVM default timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # engine tuning that is safe to apply to a caller-supplied session:
    # AQE coalesces the (possibly default-200) shuffle partitions to the
    # data size; Arrow accelerates the pandas-UDF operators
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # normalize any nanos-as-long timestamp columns back to TimestampType
    for f_ in df.schema.fields:
        if name == "events" and f_.name == "ts" and isinstance(f_.dataType, T.LongType):
            # integer `div` — float division corrupts the last µs digit at ns scale
            df = df.withColumn(
                "ts", F.timestamp_micros(F.call_function("div", F.col("ts"), F.lit(1000)))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for SQL-side operators."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
