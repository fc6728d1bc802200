"""DV-sink deep-delete economics: read-side cost of an accumulating
tombstone mask (r6 verdict task 7).

The write-side win is already measured (SCALE.md: 0.99 s DV vs 2.37 s
CoW per sparse delete batch at 2M rows). This script measures the READ
tax that accumulating masks charge: a 2M-row target takes delete-only
batches growing the mask through {1k, 10k, 50k, 200k, 500k} tombstones;
after each step the full masked scan (count + sum aggregate — nothing
collected) is timed 3× and the median recorded, plus whether the mask
still lands as a broadcast anti-join. At the end, one compact() times
the fold cost the auto-fold policy amortizes against.

Usage: PYTHONPATH=/root/repo python3 scripts/dv_read_bench.py
Prints a markdown table ready for SCALE.md.
"""

from __future__ import annotations

import datetime
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dataplatform_cdc_pipeline_spark.operators.dv_target import DvMergeTarget  # noqa: E402
from dataplatform_cdc_pipeline_spark.session import get_spark  # noqa: E402
from dataplatform_cdc_pipeline_spark.sources.cdc import (  # noqa: E402
    USER_STATE_SCHEMA,
    user_state_config,
)

N_ROWS = 2_000_000
MASK_STEPS = [1_000, 10_000, 50_000, 200_000, 500_000]
BASE = datetime.datetime(2024, 1, 1)


def changes_frame(spark, ids, op):
    return (
        spark.range(0, N_ROWS)
        .filter(F.col("id").isin(ids) if isinstance(ids, list) else ids)
        .select(
            F.col("id").alias("user_id"),
            F.lit("t").alias("event_type"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.lit(1).alias("k"),
            (F.lit(BASE) + F.make_interval(secs=F.col("id") % 86400)).alias(
                "source_ts_ns_order"
            ),
            F.col("id").alias("pos"),
            F.lit(op).alias("__op"),
            F.lit(BASE).alias("__load_ts"),
        )
    )


def timed_scan(t):
    took = []
    for _ in range(3):
        t0 = time.time()
        t.read().agg(F.count(F.lit(1)), F.sum("value")).collect()
        took.append(time.time() - t0)
    return round(statistics.median(took), 3)


def main() -> None:
    spark = get_spark("dv-read-bench")
    tmp = tempfile.mkdtemp(prefix="dv_read_bench_")
    t = DvMergeTarget(spark, f"{tmp}/t", user_state_config(), USER_STATE_SCHEMA)
    t.merge(changes_frame(spark, F.lit(True), "c"))
    rows = []
    base_scan = timed_scan(t)
    rows.append((0, base_scan, "—"))
    prev = 0
    for step in MASK_STEPS:
        # delete ids in [prev, step): the mask accumulates across batches
        t.merge(
            changes_frame(
                spark, (F.col("id") >= prev) & (F.col("id") < step), "d"
            )
        )
        prev = step
        plan = t.read()._jdf.queryExecution().executedPlan().toString()
        join = "broadcast" if "BroadcastHashJoin" in plan else (
            "SMJ" if "SortMergeJoin" in plan else "other"
        )
        rows.append((t.mask_size(), timed_scan(t), join))
        print(f"# mask={rows[-1][0]} scan={rows[-1][1]}s join={join}",
              file=sys.stderr)
    t0 = time.time()
    t.compact()
    fold_sec = round(time.time() - t0, 3)
    post_fold = timed_scan(t)

    print(f"2M-row target, masked full-scan (count+sum), medians of 3, "
          f"local[32]; fold (compact) cost {fold_sec} s, post-fold scan "
          f"{post_fold} s:\n")
    print("| tombstones in mask | masked scan | mask join |")
    print("|---|---|---|")
    for n, sec, join in rows:
        print(f"| {n:,} | {sec} s | {join} |")


if __name__ == "__main__":
    main()
