"""Capture the IVF add-batch ingest plan, new (fused projection) vs the
pre-r12 shape (assign crossJoin+window rank-1 ⋈ sq8_codes), for the plan
evidence in plans/r12/. The OLD shape is reconstructed verbatim from the
pre-r12 code (tests/test_opt_r12.py keeps the same twin for the
equivalence assertion); both are explained over the SAME bootstrapped
index and delta."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.ivf_index import IncrementalIvfIndex
from dataplatform_cdc_pipeline_spark.operators.quantization import (
    sq8_code_expr,
    sq8_codes,
)
from dataplatform_cdc_pipeline_spark.operators.similarity import (
    as_double_vec,
    norm_expr,
)
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.tables import load_table


def explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cdc-engine-ivfplanprobe")
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 != 3)
    delta = emb.filter(F.col("vec_id") % 10 == 3)
    idx = IncrementalIvfIndex(spark, tempfile.mkdtemp(prefix="ivfplan_") + "/ix")
    idx.bootstrap("base", base)

    # NEW: one scan, one projection (current add_batch internals)
    vecs = delta.select(
        F.col("vec_id"), as_double_vec("embedding").alias("vec")
    ).withColumn("v_norm", norm_expr(F.col("vec")))
    new_rows = vecs.select(
        "vec_id",
        idx._assign_expr(F.col("vec"), F.col("v_norm")),
        sq8_code_expr(F.col("vec"), idx.scales()).alias("codes"),
    ).withColumn("batch", F.lit("b1")).repartition("cell")

    # OLD: windowed-rank-1 assignment ⋈ sq8_codes on vec_id (pre-r12)
    from tests.test_opt_r12 import _old_assign

    old_rows = (
        _old_assign(idx, delta)
        .join(sq8_codes(delta, idx.scales()), "vec_id")
        .withColumn("batch", F.lit("b1"))
        .repartition("cell")
    )

    with open(os.path.join(out_dir, "ivf_add_batch_after.txt"), "w") as f:
        f.write(explain(new_rows))
    with open(os.path.join(out_dir, "ivf_add_batch_before.txt"), "w") as f:
        f.write(explain(old_rows))
    for tag, df in (("after", new_rows), ("before", old_rows)):
        txt = explain(df)
        n_ex = txt.count("Exchange")
        n_scan = txt.count("Scan parquet")
        print(f"{tag}: Exchange={n_ex} scans={n_scan} window={'Window' in txt}")


if __name__ == "__main__":
    main()
