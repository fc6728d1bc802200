"""Measured skew proof for the W1 dedup strategies (SCALE.md evidence).

Synthesizes a hot-key CDC batch — ONE key owns 50% of 1M change rows, the
rest spread over 100k keys — and times the three physical dedup strategies
with per-strategy shuffle-write bytes pulled from the Spark UI REST API:

- window          latest_per_key (ranked window, exact reference semantics)
- salted          latest_per_key(salt_buckets=32) (two-phase window dedup)
- agg             latest_per_key_agg (map-side combine)

Run: python3 scripts/skew_bench.py [n_rows] [hot_share]
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.dedup import (
    latest_per_key,
    latest_per_key_agg,
)
from dataplatform_cdc_pipeline_spark.session import get_spark

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
HOT_SHARE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
N_COLD_KEYS = 100_000
SALT = 32


def ui(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}", timeout=10) as r:
        return json.load(r)


def stage_metrics() -> dict[int, dict]:
    app = ui("/applications")[0]["id"]
    out = {}
    for s in ui(f"/applications/{app}/stages?status=complete"):
        out[s["stageId"]] = {
            "shuffle_write_bytes": s["shuffleWriteBytes"],
            "shuffle_write_records": s["shuffleWriteRecords"],
            "task_time_ms": s["executorRunTime"],
        }
    return out


def hot_batch(spark):
    """1M-row deduped-shape change frame: ~50% of rows on user_id=0."""
    i = F.col("id")
    hot_rows = int(N_ROWS * HOT_SHARE)
    user = F.when(i < hot_rows, F.lit(0)).otherwise((i % N_COLD_KEYS) + 1)
    return spark.range(0, N_ROWS, 1, 32).select(
        user.cast("long").alias("user_id"),
        F.timestamp_micros((F.lit(1_704_067_200_000_000) + i * 7).cast("long")).alias(
            "source_ts_ns_order"
        ),
        i.alias("pos"),
        (i % 1000).cast("double").alias("value"),
        F.concat(F.lit("payload-"), (i % 97).cast("string")).alias("event_type"),
    )


def run(label, make_df):
    t0 = time.time()
    before = set(stage_metrics())
    out = make_df()
    row = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("s")
    ).first()
    wall = time.time() - t0
    after = stage_metrics()
    new = [m for sid, m in after.items() if sid not in before]
    return {
        "strategy": label,
        "wall_s": round(wall, 2),
        "rows_out": row["n"],
        "pos_checksum": row["s"],
        "shuffle_write_mb": round(sum(m["shuffle_write_bytes"] for m in new) / 1e6, 1),
        "shuffle_write_records": sum(m["shuffle_write_records"] for m in new),
        "task_time_s": round(sum(m["task_time_ms"] for m in new) / 1e3, 1),
        "max_stage_task_time_s": round(
            max((m["task_time_ms"] for m in new), default=0) / 1e3, 1
        ),
    }


def main():
    spark = get_spark(
        "skew-bench",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    df = hot_batch(spark)
    # materialize the input once so every strategy reads identical bytes
    # (eager localCheckpoint, NOT persist — invariant 11)
    df = df.localCheckpoint(eager=True)

    results = [
        run("window", lambda: latest_per_key(df, ["user_id"])),
        run("salted32", lambda: latest_per_key(df, ["user_id"], salt_buckets=SALT)),
        run(
            "agg",
            lambda: latest_per_key_agg(
                df, ["user_id"], "source_ts_ns_order", "pos", ["value", "event_type"]
            ),
        ),
    ]
    # warm second pass — codegen/JIT settled, the steady-state comparison
    results += [
        run("window#warm", lambda: latest_per_key(df, ["user_id"])),
        run("salted32#warm", lambda: latest_per_key(df, ["user_id"], salt_buckets=SALT)),
        run(
            "agg#warm",
            lambda: latest_per_key_agg(
                df, ["user_id"], "source_ts_ns_order", "pos", ["value", "event_type"]
            ),
        ),
    ]
    checks = {r["rows_out"] for r in results}
    print(json.dumps({"n_rows": N_ROWS, "hot_share": HOT_SHARE, "salt": SALT,
                      "distinct_keys_out": sorted(checks), "results": results}))


if __name__ == "__main__":
    main()
