"""SparkSession bootstrap tuned for the CDC engine.

Local testing runs ``local[N]`` in one JVM; the same configuration choices
(AQE on, shuffle partitions sized to parallelism, UTC session timezone,
dynamic partition overwrite for the bucketed merge targets) are the ones a
multi-executor cluster deployment would want.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dataplatform-cdc-pipeline-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    - ``spark.sql.session.timeZone=UTC``: the reference's DATETIME semantics
      are zone-less (merge.sql:271-273 strips UTC); pinning UTC makes Spark
      TimestampType behave identically and keeps DuckDB-oracle comparisons
      exact.
    - ``partitionOverwriteMode=dynamic``: the emulated MERGE rewrites only
      the hash-bucket partitions that contain matched keys.
    - AQE on: runtime coalescing + skew-join handling at scale.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # landing parquet may lack the adjusted-to-UTC flag; read those
        # timestamps as TIMESTAMP (epoch-UTC), never TIMESTAMP_NTZ — NTZ
        # breaks unix_micros/epoch arithmetic across the engine
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        # local[N] runs executors inside the driver JVM: an undersized heap
        # turns long multi-query sessions into GC-pause roulette (observed
        # 1.5 s queries spiking to 30 s). Size for the machine; a cluster
        # deployment sizes spark.executor.memory instead.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        # long-lived sessions: cap listener/plan retention and let the
        # ContextCleaner GC broadcast/shuffle remnants between query groups
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
