"""A/B the W1 dedup physical shapes on the real CDC feed (guide §1).

Variants over the same keyed frame build_changes produces:
  agg     - groupBy(pk).max(struct(ts,pos,carry...))   [current default]
  window  - row_number over (pk order by ts desc, pos desc), rn=1
  max_by  - groupBy(pk).agg(max_by(struct(all), struct(ts,pos)))

Prints per-variant noop-sink times (2 passes; min) and the physical
operator names involved (HashAggregate vs SortAggregate vs Window).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dedup-ab")
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import window_scan
    from dataplatform_cdc_pipeline_spark.queries import cdc_feed
    from dataplatform_cdc_pipeline_spark.sources.cdc import user_state_config

    raw = cdc_feed(spark, sf_dir)
    cfg = user_state_config()
    w = window_scan(raw, cfg, None, None)
    keyed = w.select(
        F.col("__op"),
        F.col("data"),
        F.col(cfg.load_ts_col),
        F.col("__event_ts"),
        F.col("__pos"),
        F.col("__pk_raw_0").cast("long").alias("__pk_0"),
    )
    keyed = keyed.localCheckpoint(eager=True)  # isolate dedup cost from scan

    carry = ["data", cfg.load_ts_col, "__op"]

    def v_agg(df):
        packed = F.max(
            F.struct(
                F.col("__event_ts").alias("__ts"),
                F.col("__pos").alias("__pos"),
                *[F.col(c).alias(c) for c in carry],
            )
        ).alias("__best")
        out = df.groupBy("__pk_0").agg(packed)
        return out.select(
            "__pk_0",
            F.col("__best.__ts").alias("__event_ts"),
            F.col("__best.__pos").alias("__pos"),
            *[F.col(f"__best.{c}").alias(c) for c in carry],
        )

    def v_window(df):
        win = Window.partitionBy("__pk_0").orderBy(
            F.col("__event_ts").desc_nulls_last(), F.col("__pos").desc_nulls_last()
        )
        return df.withColumn("rn", F.row_number().over(win)).filter(
            F.col("rn") == 1
        ).drop("rn")

    def v_max_by(df):
        best = F.max_by(
            F.struct(
                F.col("__event_ts").alias("__ts"),
                F.col("__pos").alias("__pos"),
                *[F.col(c).alias(c) for c in carry],
            ),
            F.struct(F.col("__event_ts"), F.col("__pos")),
        ).alias("__best")
        out = df.groupBy("__pk_0").agg(best)
        return out.select(
            "__pk_0",
            F.col("__best.__ts").alias("__event_ts"),
            F.col("__best.__pos").alias("__pos"),
            *[F.col(f"__best.{c}").alias(c) for c in carry],
        )

    results = {}
    for name, fn in [("agg", v_agg), ("window", v_window), ("max_by", v_max_by)]:
        df = fn(keyed)
        plan = df._jdf.queryExecution().executedPlan().toString()
        ops = sorted(
            {
                ln.strip("+- *() ").split(" ")[0]
                for ln in plan.splitlines()
                if any(
                    k in ln
                    for k in (
                        "Aggregate",
                        "Sort",
                        "Window",
                        "Exchange",
                    )
                )
            }
        )
        times = []
        for _ in range(2):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        results[name] = {"times": times, "ops": ops}
        # row-count sanity: all variants must agree
        results[name]["rows"] = df.count()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
