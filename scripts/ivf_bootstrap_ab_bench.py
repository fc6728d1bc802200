"""A/B the IVF bootstrap artifact build: the pre-r12 two-pass shape
(centroid agg + separate sq8_scales corpus agg) vs the fused one-pass
shape (shared (cell,pos) partials, localCheckpointed, feeding both
artifacts). Alternating warm passes in ONE session so box drift cancels.

Usage: python scripts/ivf_bootstrap_ab_bench.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.clustering import MICRO
from dataplatform_cdc_pipeline_spark.operators.quantization import sq8_scales
from dataplatform_cdc_pipeline_spark.operators.similarity import norm_expr
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.tables import load_table


def micros(vec_col):
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * F.lit(MICRO), 0).cast("long")
    )


def cent_frame(grouped):
    return (
        grouped.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col("cell").cast("long").alias("cell"),
            F.transform("pc", lambda s: s["c"].cast("double")).alias("centroid"),
        )
        .withColumn("c_norm", norm_expr(F.col("centroid")))
    )


def old_shape(emb) -> tuple[float, int]:
    t0 = time.time()
    grouped = (
        emb.select(F.col("label").alias("cell"), F.posexplode(micros("embedding")).alias("pos", "m"))
        .groupBy("cell", "pos")
        .agg(F.floor(F.sum("m") / F.count(F.lit(1))).cast("long").alias("c"))
    )
    cent_frame(grouped).write.mode("overwrite").format("noop").save()
    scales = sq8_scales(emb)
    return time.time() - t0, len(scales)


def new_shape(emb) -> tuple[float, int]:
    t0 = time.time()
    grouped = (
        emb.select(F.col("label").alias("cell"), F.posexplode(micros("embedding")).alias("pos", "m"))
        .groupBy("cell", "pos")
        .agg(
            F.floor(F.sum("m") / F.count(F.lit(1))).cast("long").alias("c"),
            F.max(F.abs(F.col("m"))).alias("mx"),
        )
        .localCheckpoint(eager=True)
    )
    cent_frame(grouped).write.mode("overwrite").format("noop").save()
    rows = grouped.groupBy("pos").agg(F.max("mx").alias("mx")).collect()
    return time.time() - t0, len(rows)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ivf-bootstrap-ab")
    emb = load_table(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), "embeddings"
    )
    emb.count()  # warm listing
    olds, news = [], []
    for i in range(rounds):
        o, _ = old_shape(emb)
        n, _ = new_shape(emb)
        olds.append(round(o, 3))
        news.append(round(n, 3))
        print(f"round {i}: old={o:.3f} new={n:.3f}")
    olds.sort(), news.sort()
    print(f"medians: old={olds[len(olds)//2]} new={news[len(news)//2]}")


if __name__ == "__main__":
    main()
