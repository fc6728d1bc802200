"""A/B the merge resolve join strategy: SortMergeJoin (current) vs
shuffled-hash (hint on the change-set side), over the real sf data.

Builds the exact resolve_changes shape (full_outer, null-safe PK equality)
against a staged target, with the change set deduped two ways.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("join-ab")
    from dataplatform_cdc_pipeline_spark.engine import run_merge
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

    raw = cdc_feed(spark, sf_dir)
    cfg = user_state_config()
    tmp = tempfile.mkdtemp(prefix="join_ab_")
    target = ParquetMergeTarget(spark, f"{tmp}/t", cfg, USER_STATE_SCHEMA)
    audit = WatermarkStore(spark, f"{tmp}/audit")
    split = datetime.datetime(2024, 1, 15)
    # stage the target with window 1
    run_merge(spark, cfg, target, audit, raw=raw, window=(None, split),
              deterministic_audit=True)

    # window-2 change set, materialized so the join is isolated
    w = window_scan(raw, cfg, split, None)
    changes = build_changes(w, USER_STATE_SCHEMA, cfg, deterministic_audit=True)
    s = changes.withColumn(
        "__bucket", bucket_expr(list(cfg.pk), cfg.n_buckets)
    ).localCheckpoint(eager=True)
    data_cols = [f.name for f in target.schema.fields]
    t_rows = target.read().localCheckpoint(eager=True)

    results = {}
    for name, s_side in [("smj", s), ("shj_hint", s.hint("shuffle_hash"))]:
        merged = resolve_changes(t_rows, s_side, cfg, data_cols)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        joins = [
            ln.strip()[:60]
            for ln in plan.splitlines()
            if "Join" in ln and "josh" not in ln
        ]
        times = []
        for _ in range(3):
            t0 = time.time()
            merged.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        results[name] = {"times": times, "joins": joins, "rows": merged.count()}
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
