"""Range-partitioned read-optimized export — the layout that makes zone
maps bite on DENSE data.

SCALE.md's measured limit: per-bucket zone maps on the PK-HASH merge
layout cannot prune dense uniform columns (every bucket spans the full
range). The warehouse answer (Snowflake clustering keys, BigQuery
clustering, Iceberg sort orders) is a READ-OPTIMIZED COPY laid out by
the query column instead of the merge key: range-partition the table on
that column, keep per-partition min/max as an index artifact, and serve
range predicates from the few overlapping partitions. The merge table
stays PK-hash (merges keep pruning); analytics reads the export.

- **bounds**: ``approxQuantile`` boundaries (a driver-side artifact,
  ≤ n_parts−1 doubles — same shape as the z-order bins); range id =
  ``#{bounds ≤ x}`` via the shared fold expression (zorder.bin_expr).
  Quantile bounds, not min/max splits, so skewed columns still balance.
- **write**: one ``partitionBy(__range)`` parquet write with
  ``repartition(n_parts, __range)`` — one task per range, one file per
  range dir, rows range-clustered ACROSS files (not just within).
- **stats**: exact per-range min/max/null-count harvested from the
  written footers into ``_range_stats.json`` (metadata-only, the same
  Iceberg-manifest shape as the snapshot sink's zone maps).
- **read**: consult the stats, list ONLY overlapping range dirs, apply
  the residual filter — result-identical to filtering a full scan
  (unit-pinned), cheaper by every skipped partition: on dense data a
  2% range read touches ~2% of partitions (the case bucket zone maps
  measurably cannot serve).

NULL handling: NULL range-column rows land in range 0 with a recorded
null_count; a range predicate never matches NULL, and reads prune range
0 when its non-null [min, max] misses — stats track min/max over
non-null values only.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.operators.zorder import bin_expr

RANGE_COL = "__range"
STATS_FILE = "_range_stats.json"


def write_range_partitioned(
    df: DataFrame, path: str, col: str, n_parts: int = 16
) -> dict:
    """Export ``df`` range-partitioned on ``col``; returns the stats
    manifest {range_id: {"min": x, "max": y, "nulls": n}} (also written
    to ``<path>/_range_stats.json``)."""
    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = df.stat.approxQuantile(col, probs, 0.001) if probs else []
    rid = F.when(F.col(col).isNull(), F.lit(0)).otherwise(
        bin_expr(col, bounds) if bounds else F.lit(0)
    )
    out = df.withColumn(RANGE_COL, rid.cast("int")).repartition(
        n_parts, F.col(RANGE_COL)
    ).sortWithinPartitions(RANGE_COL, col)
    out.write.mode("errorifexists").partitionBy(RANGE_COL).parquet(path)

    import pyarrow.parquet as pq

    stats: dict[str, dict] = {}
    for d in _glob.glob(os.path.join(path, f"{RANGE_COL}=*")):
        rid_s = d.rsplit("=", 1)[1]
        mn = mx = None
        nulls = 0
        for f in _glob.glob(os.path.join(d, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
            i = idx[col]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None:
                    raise RuntimeError(f"range export wrote stats-less file {f}")
                if st.has_null_count:
                    nulls += st.null_count
                if st.has_min_max:
                    mn = st.min if mn is None or st.min < mn else mn
                    mx = st.max if mx is None or st.max > mx else mx
        stats[rid_s] = {"min": mn, "max": mx, "nulls": nulls}
    with open(os.path.join(path, STATS_FILE), "w") as f:
        json.dump({"col": col, "ranges": stats}, f)
    return stats


def read_range_pruned(
    spark: SparkSession,
    path: str,
    lo,
    hi,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Scan only the range partitions whose recorded [min, max] can hold
    ``col BETWEEN lo AND hi``, then apply the residual filter. Stats
    missing for a partition → conservatively kept."""
    with open(os.path.join(path, STATS_FILE)) as f:
        manifest = json.load(f)
    col = manifest["col"]
    keep = []
    for rid, st in manifest["ranges"].items():
        mn, mx = st.get("min"), st.get("max")
        if mn is None or mx is None:
            continue  # all-NULL partition can never match a range predicate
        if not (mx < lo or mn > hi):
            keep.append(os.path.join(path, f"{RANGE_COL}={rid}"))
    if not keep:
        base = spark.read.schema(schema) if schema else spark.read
        empty = base.option("basePath", path).parquet(path).limit(0)
        return empty.drop(RANGE_COL)
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.option("basePath", path).parquet(*keep)
    return df.filter(F.col(col).between(F.lit(lo), F.lit(hi))).drop(RANGE_COL)
