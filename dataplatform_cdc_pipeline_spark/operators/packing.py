"""Sequence packing for training-data pipelines: global order + cumulative
token counts WITHOUT a single-partition window.

A naive ``Window.orderBy(key)`` (no partitionBy) collapses the whole table
into ONE task — the classic global-cumsum scale trap. The standard fix is
the two-pass distributed prefix sum:

 1. range-partition by the order key (keeps global order across partitions)
 2. pass 1: per-partition totals → collected to the driver (N integers)
 3. pass 2: within-partition cumsum + broadcast partition offsets

Result is identical to the global window for ANY partitioning (offsets are
computed from the actual partitions), and every stage is parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value: Column,
    out_col: str = "running_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = sum of ``value`` over all rows strictly before this
    row in ``order_col`` order (exclusive prefix sum), computed with the
    two-pass distributed algorithm above."""
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.withColumn("__val", value).localCheckpoint(eager=False)

    # pass 1: per-partition totals (tiny: one row per partition)
    totals = {
        r["__pid"]: r["t"]
        for r in part.groupBy("__pid").agg(F.sum("__val").alias("t")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    # broadcast-join the (pid, offset) map instead of building a chained
    # CASE per partition id: a thousands-deep `when` expression blows up
    # Catalyst analysis/codegen at cluster partition counts, while the
    # broadcast hash join keeps the plan flat.
    # Small P: explode of literal structs — a pure-JVM plan (createDataFrame
    # would spin a Python worker on every downstream action, ~5 s at
    # local[32]). Large P: a local relation, whose plan size is CONSTANT in
    # P (literals would grow the plan linearly); the one-off Python-worker
    # cost is noise at that scale.
    if offsets and len(offsets) <= 256:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(int(pid)).cast("int").alias("__pid"),
                    F.lit(int(off)).cast("long").alias("__offset"),
                )
                for pid, off in offsets.items()
            ]
        )
        off_df = (
            df.sparkSession.range(1)
            .select(F.explode(pairs).alias("__po"))
            .select(F.col("__po.__pid").alias("__pid"), F.col("__po.__offset").alias("__offset"))
        )
    else:
        off_df = df.sparkSession.createDataFrame(
            [(int(pid), int(off)) for pid, off in offsets.items()],
            "__pid int, __offset long",
        )
    part = part.join(F.broadcast(off_df), "__pid", "left")

    # pass 2: within-partition exclusive cumsum + partition offset
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        part.withColumn(
            out_col,
            F.coalesce("__offset", F.lit(0)) + F.coalesce(F.sum("__val").over(w), F.lit(0)),
        )
        .drop("__pid", "__val", "__offset")
    )


def concat_and_chunk(
    df: DataFrame,
    token_count: Column,
    order_col: str = "doc_id",
    chunk_tokens: int = 512,
) -> DataFrame:
    """Concat-and-chunk packing layout (the standard pretraining shape):
    documents concatenated in ``order_col`` order and cut into
    ``chunk_tokens``-sized chunks; each doc gets its chunk id + offset."""
    out = global_running_sum(
        df.withColumn("n_tokens", token_count), order_col, F.col("n_tokens"), "tokens_before"
    )
    return out.withColumn(
        "chunk_id", (F.col("tokens_before") / F.lit(chunk_tokens)).cast("long")
    ).withColumn("chunk_offset", F.col("tokens_before") % F.lit(chunk_tokens))
