"""Per-phase timing of the CDC merge lifecycle at $SPARK_GRAFT_SF_DIR.

Times each phase of cdc_merge_full / cdc_merge_incremental the way the
driver runs them (fresh temp target per run):

  feed        events → synthetic bronze JSON (harness, not engine)
  changes     window scan + dedup + cast + stats agg (one cached job)
  resolve_write  full-outer resolve join + staging parquet write
  swap        bucket directory swaps (filesystem)
  audit       watermark/job-log appends

Prints one JSON line for BENCH notes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime

from dataplatform_cdc_pipeline_spark.engine import run_merge
from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
from dataplatform_cdc_pipeline_spark.queries import cdc_feed
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed_merges(spark, windows, label):
    cfg = user_state_config()
    tmp = tempfile.mkdtemp(prefix="merge_bench_")
    target = ParquetMergeTarget(spark, f"{tmp}/t", cfg, USER_STATE_SCHEMA)
    audit = WatermarkStore(spark, f"{tmp}/a")
    raw = cdc_feed(spark, SF)
    out = []
    for i, win in enumerate(windows):
        t0 = time.time()
        run_merge(spark, cfg, target, audit, raw=raw, window=win, deterministic_audit=True)
        total = round(time.time() - t0, 3)
        phases = dict(target.phase_times)
        phases["audit_and_rest"] = round(total - sum(phases.values()), 3)
        phases["total"] = total
        out.append({f"{label}[{i}]": phases})
    return out


def main():
    spark = get_spark("merge-phase-bench")
    t0 = time.time()
    cdc_feed(spark, SF).count()  # materialize the shared feed cache
    feed_s = round(time.time() - t0, 3)
    split = datetime.datetime(2024, 1, 15)
    results = {"feed_synthesis": feed_s}
    for entry in timed_merges(spark, [(None, None)], "full"):
        results.update(entry)
    for entry in timed_merges(spark, [(None, split), (split, None)], "incr"):
        results.update(entry)
    print(json.dumps({"sf_dir": SF, "phases": results}))


if __name__ == "__main__":
    main()
