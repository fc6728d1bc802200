"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` (beyond-reference: the reference has no
cross-batch state at all, SURVEY.md §2.8).

``running_user_totals`` maintains (count, total) per user across
micro-batches in the state store — the canonical shape for any custom
stateful CDC enrichment (session carts, rate counters, feature snapshots).
State is bounded by key cardinality; a production deployment adds a
timeout (``GroupStateTimeout.ProcessingTimeTimeout``) to expire idle keys.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]})


def running_user_totals(
    spark: SparkSession,
    source_path: str,
    schema: str = "event_id long, ts timestamp, user_id long, value double",
    checkpoint_path: str | None = None,
    output_path: str | None = None,
) -> DataFrame:
    """Drain the source with availableNow, maintaining per-user running
    totals in the state store; returns the latest emitted row per user.

    Sink = ``foreachBatch`` → parquet appends (memory sink cannot recover
    a checkpoint); re-invoking with the same checkpoint resumes BOTH the
    source offsets and the state store — totals keep accumulating across
    restarts, which is the whole point of the state store.
    """
    name = f"rut_{uuid.uuid4().hex[:8]}"
    checkpoint_path = checkpoint_path or f"/tmp/{name}_ckpt"
    output_path = output_path or f"{checkpoint_path}_out"
    stream = spark.readStream.schema(schema).parquet(source_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_path)

    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = spark.read.schema(OUTPUT_SCHEMA).parquet(output_path)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
