"""Measured pruning effectiveness: bloom semi-join pass-through at sf0.1
and zone-map bucket skipping on dense vs sparse tables.

Outputs the numbers cited in SCALE.md. Run:
    PYTHONPATH=/root/repo python3 scripts/prune_bench.py 2>/dev/null
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)
from dataplatform_cdc_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bloom_numbers(spark) -> None:
    from dataplatform_cdc_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    n_fact = li.count()
    for cutoff in [150_000.0, 300_000.0, 450_000.0]:
        dim = (
            orders.filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_totalprice") > cutoff)
            )
            .select(F.col("o_orderkey").alias("key"))
            .distinct()
        )
        n_dim = dim.count()
        t0 = time.time()
        words, m_bits = bloom_build(dim, "key", m_bits=None)
        build_s = time.time() - t0
        t0 = time.time()
        n_pass = li.filter(bloom_might_contain("l_orderkey", words, m_bits)).count()
        probe_s = time.time() - t0
        n_match = li.join(F.broadcast(dim), li["l_orderkey"] == dim["key"], "left_semi").count()
        fp = (n_pass - n_match) / max(n_fact - n_match, 1)
        print(
            f"bloom dim={n_dim:>6} m={m_bits:>7} fact={n_fact} pass={n_pass:>7} "
            f"({100.0 * n_pass / n_fact:5.2f}%) exact={n_match:>7} "
            f"fp_rate={fp:.2e} build={build_s:.2f}s probe={probe_s:.2f}s"
        )


def zonemap_numbers(spark) -> None:
    """Dense vs sparse: per-bucket zone maps on a PK-hash layout prune
    sparse tables but degenerate on dense uniform columns (every bucket
    spans the full range) — the honest limit of bucket-level stats."""
    from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
        SnapshotMergeTarget,
    )
    from dataplatform_cdc_pipeline_spark.sources.cdc import (
        USER_STATE_SCHEMA,
        user_state_config,
    )

    for label, n_rows in [("sparse", 200), ("dense", 200_000)]:
        cfg = user_state_config(n_buckets=32, clustering_fields=("value",))
        tmp = tempfile.mkdtemp(prefix=f"zm_{label}_")
        t = SnapshotMergeTarget(spark, f"{tmp}/t", cfg, USER_STATE_SCHEMA)
        rows = spark.range(1, n_rows + 1).select(
            F.col("id").alias("user_id"),
            F.lit("t").alias("event_type"),
            F.col("id").cast("double").alias("value"),
            F.lit(1).cast("int").alias("k"),
            F.timestamp_seconds(F.col("id")).alias("source_ts_ns_order"),
            F.col("id").alias("pos"),
            F.lit("c").alias("__op"),
        )
        t.merge(rows)
        m = t._manifest()
        lo, hi = 1.0, float(n_rows) * 0.02  # bottom 2% of the value range
        kept = [
            b
            for b in m["buckets"]
            if m["stats"].get(b, {}).get("value") is None
            or not (
                m["stats"][b]["value"][1] < lo or m["stats"][b]["value"][0] > hi
            )
        ]
        n = t.read(where=("value", lo, hi)).count()
        print(
            f"zonemap {label:6} rows={n_rows:>7}: {len(kept)}/{len(m['buckets'])} "
            f"buckets survive a bottom-2% range read ({n} rows)"
        )


if __name__ == "__main__":
    spark = get_spark("prune-bench")
    bloom_numbers(spark)
    zonemap_numbers(spark)
