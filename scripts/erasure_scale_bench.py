"""Measured 10× step for the staged r13 index-erasure operators:
dedup_index_erasure, ivf_index_erasure (queries_staged_r13.py).

Same protocol as scripts/compact_scale_bench.py: sf0.01 → sf0.1 →
synthetic sf1 (sf0.1 documents/embeddings replicated 10× with shifted
ids so key cardinality grows WITH the data), one warm session, one
timed pass per (query, scale). The erase phase itself is reported
separately via bench_phases so the partition-pruned rewrite's ~flat
step is visible next to the whole-lifecycle time. Prints one JSON line
{query: {sf: {"total": sec, "erase": sec}}}.

Run: python3 scripts/erasure_scale_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark import bench_phases
from dataplatform_cdc_pipeline_spark.queries_staged_r13 import (
    STAGED_R13_QUERIES,
)
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1synth_r13"
REPL = 10


def build_sf1(spark) -> None:
    if os.path.isdir(SF1):
        shutil.rmtree(SF1)
    os.makedirs(SF1)
    for table, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = load_table(spark, SF01, table)
        n = df.agg(F.max(key)).collect()[0][0] + 1
        out = df
        for r in range(1, REPL):
            out = out.unionByName(
                df.withColumn(key, F.col(key) + F.lit(r * n))
            )
        out.write.parquet(f"{SF1}/{table}.parquet")


def main() -> None:
    spark = get_spark("erasure-scale-bench")
    build_sf1(spark)
    results: dict[str, dict[str, dict[str, float]]] = {}
    for name, fn in STAGED_R13_QUERIES.items():
        results[name] = {}
        for label, sf_dir in (("sf0.01", SF001), ("sf0.1", SF01), ("sf1x", SF1)):
            bench_phases.reset()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t1 = time.time()
            spans = bench_phases.spans(end=t1)
            # the maintenance op under test marks either "erase" or
            # "compact"; report whichever the query emitted
            op = "erase" if "erase" in spans else "compact"
            results[name][label] = {
                "total": round(t1 - t0, 2),
                op: round(spans.get(op, 0.0), 2),
            }
    print(json.dumps(results))
    shutil.rmtree(SF1, ignore_errors=True)


if __name__ == "__main__":
    main()
