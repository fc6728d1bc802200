"""Measure the shared merge path in isolation (guide §1).

Runs the cdc_merge_full shape (two-window lifecycle like the IVM/
reconcile queries) at $SPARK_GRAFT_SF_DIR and prints per-phase wall
times from ParquetMergeTarget.phase_times plus engine-level spans, and
optionally dumps the resolve plan.

Usage: python scripts/merge_probe.py [--plan-out FILE]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.session import get_spark


def main() -> None:
    plan_out = None
    if "--plan-out" in sys.argv:
        plan_out = sys.argv[sys.argv.index("--plan-out") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cdc-engine-mergeprobe")

    from dataplatform_cdc_pipeline_spark.operators.merge_target import (
        ParquetMergeTarget,
        resolve_changes,
        bucket_expr,
    )
    from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import (
        build_changes,
        window_scan,
    )
    from dataplatform_cdc_pipeline_spark.queries import cdc_feed
    from dataplatform_cdc_pipeline_spark.sources.cdc import (
        USER_STATE_SCHEMA,
        user_state_config,
    )
    from dataplatform_cdc_pipeline_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, 4096, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        _noop, "id long"
    ).count()

    raw = cdc_feed(spark, sf_dir)
    cfg = user_state_config()
    tmp = tempfile.mkdtemp(prefix="merge_probe_")
    target = ParquetMergeTarget(spark, f"{tmp}/t", cfg, USER_STATE_SCHEMA)
    audit = WatermarkStore(spark, f"{tmp}/audit")
    split = datetime.datetime(2024, 1, 15)
    out = {"windows": []}
    from dataplatform_cdc_pipeline_spark.engine import run_merge

    for lo, hi in ((None, split), (split, None)):
        t0 = time.time()
        run_merge(
            spark, cfg, target, audit, raw=raw, window=(lo, hi),
            deterministic_audit=True,
        )
        t1 = time.time()
        out["windows"].append(
            {"total": round(t1 - t0, 3), "phases": dict(target.phase_times)}
        )

    # isolated audit append timing
    t0 = time.time()
    audit.append_run("x", "db", "t2", None, None, "SUCCESS")
    out["audit_append"] = round(time.time() - t0, 3)
    t0 = time.time()
    audit.append_job_log(
        "rid", "p", "db", "t2",
        datetime.datetime.utcnow(), datetime.datetime.utcnow(), "SUCCESS",
    )
    out["job_log_append"] = round(time.time() - t0, 3)
    # isolated watermark read
    t0 = time.time()
    audit.read_watermark(cfg.cdc_table, cfg.target_table)
    out["watermark_read"] = round(time.time() - t0, 3)

    if plan_out:
        w = window_scan(raw, cfg, None, split)
        changes = build_changes(w, USER_STATE_SCHEMA, cfg, deterministic_audit=True)
        s = changes.withColumn("__bucket", bucket_expr(list(cfg.pk), cfg.n_buckets))
        merged = resolve_changes(
            target.read(), s, cfg, [f.name for f in target.schema.fields]
        ).withColumn("__bucket", bucket_expr(list(cfg.pk), cfg.n_buckets))
        txt = merged._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(plan_out, "w") as f:
            f.write(txt)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
