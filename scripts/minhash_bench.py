"""MinHash signature formulation shoot-out (task: JVM-vs-Arrow decision).

Three bit-identical formulations of the k-family MD5 MinHash signature:
- expr   pure-Column higher-order transform/aggregate (interpreted)
- arrow  pandas_udf + hashlib over a Python shingle set (current default)
- jvm    explode + codegen'd md5 columns + min-agg (one extra shuffle)

Times each over the sf0.1 documents table and a 10×-replicated synthetic
corpus; asserts all three produce identical signatures first.

Run: python3 scripts/minhash_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.text_dedup import (
    minhash_signature_expr,
    minhash_signature_udf,
    minhash_signatures_jvm,
    shingles_expr,
)
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 8


def variants(docs):
    return {
        "expr": lambda: docs.select(
            "doc_id", minhash_signature_expr(shingles_expr("text"), K).alias("minhash_sig")
        ),
        "arrow": lambda: docs.select(
            "doc_id", minhash_signature_udf(K)(F.col("text")).alias("minhash_sig")
        ),
        "jvm": lambda: minhash_signatures_jvm(docs, k=K),
    }


def bench(docs, label, runs=3):
    out = {}
    for name, make in variants(docs).items():
        times = []
        for _ in range(runs):
            t0 = time.time()
            make().write.mode("overwrite").format("noop").save()
            times.append(time.time() - t0)
        out[name] = {"best_s": round(min(times), 3), "all_s": [round(t, 3) for t in times]}
    return {label: out}


def main():
    spark = get_spark("minhash-bench")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint(eager=True)

    # equivalence gate: all three formulations, same signatures
    sigs = {name: make().collect() for name, make in variants(docs).items()}
    canon = {
        name: sorted((r["doc_id"], tuple(r["minhash_sig"])) for r in rows)
        for name, rows in sigs.items()
    }
    assert canon["expr"] == canon["arrow"] == canon["jvm"], "formulations disagree"
    n_docs = len(canon["expr"])

    results = {"sf_dir": SF_DIR, "n_docs": n_docs, "k": K, "equivalent": True}
    results.update(bench(docs, f"sf0.1({n_docs} docs)"))

    # 10× synthetic: replicate with distinct ids (documents are sf0.1-sized;
    # this approximates the next scale factor for the signature stage)
    big = (
        docs.crossJoin(spark.range(10).select(F.col("id").alias("__rep")))
        .select((F.col("doc_id") * 10 + F.col("__rep")).alias("doc_id"), "text")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    results.update(bench(big, f"10x({n_docs * 10} docs)"))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
