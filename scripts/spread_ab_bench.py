"""A/B probe for the scan-parallelism floor (optimization round r13).

The driver's landing tables are single-file, single-row-group parquet,
so every scan plans ONE task: all map-side work (JSON synthesis/parse,
shingling, MD5 probes, casts) serializes on one core out of
local[$SPARK_GRAFT_CPUS]. This script isolates that effect: it times a
representative map-heavy pipeline through the noop sink twice in one
session — once straight off the scan, once with a round-robin
repartition to defaultParallelism — interleaved A/B/A/B so box drift
cancels.

Usage: python scripts/spread_ab_bench.py [pipeline ...]
Pipelines: cdc_parse | maxwell | bloom_probe | quality | minhash
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def build(spark, name: str, spread: bool):
    sc = spark.sparkContext

    def maybe(df):
        return df.repartition(sc.defaultParallelism) if spread else df

    if name == "cdc_parse":
        # the shared CDC path: synthesize bronze JSON + window_scan parse
        from dataplatform_cdc_pipeline_spark.plans.merge_plan import window_scan
        from dataplatform_cdc_pipeline_spark.sources.cdc import (
            synthesize_cdc_from_events,
            user_state_config,
        )

        raw = synthesize_cdc_from_events(maybe(load_table(spark, SF_DIR, "events")))
        return window_scan(raw, user_state_config(), None, None).select(
            "__op", "__event_ts", "__pos", "__pk_raw_0"
        )
    if name == "maxwell":
        from dataplatform_cdc_pipeline_spark.sources.maxwell import (
            normalize_maxwell,
            synthesize_maxwell_from_events,
        )

        wire = synthesize_maxwell_from_events(maybe(load_table(spark, SF_DIR, "events")))
        return normalize_maxwell(wire)
    if name == "bloom_probe":
        from dataplatform_cdc_pipeline_spark.operators.bloom import (
            DEFAULT_K,
            DEFAULT_M_BITS,
            bloom_build,
            bloom_might_contain,
        )

        orders = load_table(spark, SF_DIR, "orders")
        dim = (
            orders.filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_totalprice") > 150000.0)
            )
            .select(F.col("o_orderkey").alias("key"))
            .distinct()
        )
        words, _ = bloom_build(dim, "key", DEFAULT_M_BITS, DEFAULT_K)
        li = maybe(
            load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
        )
        return li.select(
            F.count(
                F.when(
                    bloom_might_contain("l_orderkey", words, DEFAULT_M_BITS, DEFAULT_K),
                    1,
                )
            ).alias("n")
        )
    if name == "quality":
        from dataplatform_cdc_pipeline_spark.operators.curation import quality_funnel

        return quality_funnel(maybe(load_table(spark, SF_DIR, "documents")))
    if name == "minhash":
        from dataplatform_cdc_pipeline_spark.operators.text_dedup import (
            minhash_signature_udf,
        )

        docs = maybe(load_table(spark, SF_DIR, "documents"))
        return docs.select("doc_id", minhash_signature_udf()(F.col("text")).alias("sig"))
    raise SystemExit(f"unknown pipeline {name}")


def main() -> None:
    names = sys.argv[1:] or ["cdc_parse", "maxwell", "bloom_probe", "quality", "minhash"]
    spark = get_spark("spread-ab")
    for name in names:
        a, b = [], []
        noop(build(spark, name, False))  # codegen warmup, untimed
        noop(build(spark, name, True))
        for _ in range(3):
            a.append(noop(build(spark, name, False)))
            b.append(noop(build(spark, name, True)))
        print(
            f"{name}: scan-narrow median {statistics.median(a):.3f}s "
            f"(all {[round(x,3) for x in a]}) vs spread "
            f"{statistics.median(b):.3f}s (all {[round(x,3) for x in b]})"
        )


if __name__ == "__main__":
    main()
