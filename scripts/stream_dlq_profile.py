"""A/B profile of the stream_dlq_merge drain (r8 verdict task 5): does
each micro-batch's pair of merge legs re-evaluate the shared in-batch
envelope (window_scan parse + quarantine split) the way the batch twin
did before the r8 cache-once fix?

Runs q_stream_dlq_merge N times in THIS process under the bench session
and prints per-run phase spans (setup / drain / final_query). Run once
on the pre-fix tree and once on the post-fix tree; compare drain medians.

    PYTHONPATH=/root/repo python3 scripts/stream_dlq_profile.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dataplatform_cdc_pipeline_spark import bench_phases
from dataplatform_cdc_pipeline_spark.queries_extra import q_stream_dlq_merge
from dataplatform_cdc_pipeline_spark.session import get_spark


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-dlq-profile")
    # warm the session the way bench.py does, so run 1 is comparable
    from dataplatform_cdc_pipeline_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").count()
    drains = []
    for i in range(runs):
        bench_phases.reset()
        t0 = time.time()
        q_stream_dlq_merge(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        t1 = time.time()
        spans = {k: round(v, 2) for k, v in bench_phases.spans(end=t1).items()}
        print(f"run {i}: total={t1 - t0:.2f}s spans={spans}", flush=True)
        if "drain" in spans:
            drains.append(spans["drain"])
    if drains:
        print(f"drain median over {len(drains)} runs: {statistics.median(drains):.2f}s")


if __name__ == "__main__":
    main()
