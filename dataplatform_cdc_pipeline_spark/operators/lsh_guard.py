"""Per-bucket size guard for LSH candidate generation.

Every LSH-style candidate stage here (MinHash bands, SimHash bit-slices,
hyperplane buckets) generates pairs with a per-bucket self-join, so its cost
is Σ bucket². The LSH guarantee keeps buckets small for *non-duplicate*
content — but a degenerate key (thousands of empty docs, boilerplate pages,
zero vectors) concentrates into ONE bucket and turns the join quadratic at
corpus scale. The guard drops buckets above a size cap before the self-join
and logs exactly what was dropped, trading recall on pathological keys for
bounded cost — the standard posture of production dedup pipelines.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("dataplatform_cdc_pipeline_spark.lsh_guard")

#: Default cap: a 5000-row bucket already means ~12.5M comparisons for that
#: key — anything larger is near-certainly a degenerate key, not real
#: near-duplicate structure. Pass ``max_bucket_size=None`` to disable.
DEFAULT_MAX_BUCKET = 5000


def cap_buckets(
    exploded: DataFrame, key: str, max_bucket_size: int | None, what: str
) -> DataFrame:
    """Filter ``exploded`` down to rows whose ``key`` bucket holds at most
    ``max_bucket_size`` rows; log a summary of dropped buckets.

    Cost shape: one aggregation job over ``exploded`` computes per-bucket
    sizes (map-side combined; output = #distinct keys, small) and collects
    the over-cap keys. In the common case — NO degenerate buckets — the
    input plan is returned **unchanged**, so the candidate self-join keeps
    exactly its unguarded shape. Only when drops exist does the result gain
    a broadcast anti-join against the (tiny) over-cap key set. Callers
    persist their signature frame upstream so the guard's extra pass reads
    the materialized signatures rather than recomputing the hash work.
    ``None`` disables the guard entirely.
    """
    if max_bucket_size is None:
        return exploded
    sizes = exploded.groupBy(key).agg(F.count(F.lit(1)).alias("__bsz"))
    over = sizes.filter(F.col("__bsz") > max_bucket_size)
    stats = over.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("__bsz").alias("largest"),
        F.sum("__bsz").alias("rows_dropped"),
    ).first()
    if not stats["n_buckets"]:
        return exploded
    logger.warning(
        "%s: dropped %d bucket(s) over cap=%d (largest=%d rows, %d rows dropped) — "
        "degenerate keys would make the bucket self-join quadratic",
        what,
        stats["n_buckets"],
        max_bucket_size,
        stats["largest"],
        stats["rows_dropped"],
    )
    return exploded.join(F.broadcast(over.select(key)), key, "left_anti")
