"""Small-file compaction — the table-maintenance operator every
100 TB deployment runs nightly and the reference (two stored procedures
over managed warehouse tables) never needed: incremental merges and
streaming ingest land many small parquet files, and scan cost at scale
is dominated by file-open/footer overhead long before bytes (the
classic "small files problem"; Iceberg's ``rewrite_data_files`` and
Delta's ``OPTIMIZE`` exist for exactly this).

Two real strategies, both relational end to end:

- **bin-pack** (`plan_compaction` + `compact`): profile physical files
  via the ``_metadata`` hidden column (a count-per-file aggregate — the
  only shuffle is |files| metadata rows), then SEQUENTIAL ROW-BUDGET
  packing in file-name order: a new bin starts once the running row
  count crosses ``target_rows`` (the ordered bin-pack
  ``rewrite_data_files`` performs). Bins that are already one
  full-sized file are CARRIED (hard-linked, zero rewrite I/O) — so
  compaction cost is proportional to the small-file bytes, never the
  table (the property that makes nightly compaction affordable at
  100 TB).
- **sort-compaction** (`sort_pack_bins`): rewrite a bounded delta (an
  LSM-style run of recent micro-batches) ordered by a key, packed into
  ``ceil(n/target)`` equal row-budget bins — the rewrite that restores
  clustering so min/max footer stats prune again (the skipping-read
  economics; see streaming/compaction_stream.py for the maintenance
  loop).

Scale notes: `plan_compaction`'s cumulative window is a single ordered
pass over |files| METADATA rows (millions of rows at 100 TB — one
skinny shuffle, never data). `sort_pack_bins` global-sorts only the
RUN it rewrites (a bounded handful of micro-batches), not the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def file_profile(spark: SparkSession, path: str) -> DataFrame:
    """(file, n_rows) per physical parquet file under ``path`` — the
    ``_metadata.file_path`` hidden column, aggregated; column pruning
    means the scan reads no data columns at all."""
    return (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def plan_compaction(profile: DataFrame, target_rows: int) -> DataFrame:
    """Sequential row-budget packing over the file profile: files in
    name order, ``bin = floor(rows_before / target_rows)`` — a new bin
    starts once the running total crosses the budget. Adds per-bin
    ``n_files``/``bin_rows`` and the ``rewrite`` decision: a bin that is
    exactly one file holding >= target_rows is already compact and is
    carried, not rewritten."""
    w = Window.orderBy("file").rowsBetween(Window.unboundedPreceding, -1)
    binned = profile.select(
        "file",
        "n_rows",
        (F.coalesce(F.sum("n_rows").over(w), F.lit(0)) / F.lit(target_rows))
        .cast("long")
        .alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("bin_rows"),
    )
    return binned.join(per_bin, "bin").select(
        "file",
        "n_rows",
        "bin",
        "n_files",
        "bin_rows",
        (
            (F.col("n_files") > 1) | (F.col("bin_rows") < F.lit(target_rows))
        ).alias("rewrite"),
    )


def compact(
    spark: SparkSession, src_path: str, dst_path: str, target_rows: int
) -> DataFrame:
    """Execute the bin-pack plan: bins needing a rewrite are shuffled
    once on ``bin`` and written one file per bin under
    ``dst_path/bin=<k>``; already-compact bins are hard-linked into
    their bin directory untouched (zero rewrite I/O — the carried
    path). ``dst_path`` must be fresh — production would stage-and-swap
    it atomically (the snapshot target's publish pattern). Returns the
    plan that was executed."""
    plan = plan_compaction(file_profile(spark, src_path), target_rows)
    plan = plan.localCheckpoint(eager=True)  # one profile pass, reused

    # emptiness probes + the carried loop below are metadata-scale
    # driver work (counts and the carried subset only — never a full
    # file list, which would be millions of strings at 100 TB); the
    # rewrite itself stays distributed via the broadcast file->bin map
    if plan.filter("rewrite").limit(1).count():
        data = spark.read.parquet(src_path).withColumn(
            "__file", F.col("_metadata.file_path")
        )
        (
            data.join(
                F.broadcast(
                    plan.filter("rewrite").select(
                        F.col("file").alias("__file"), "bin"
                    )
                ),
                "__file",
            )
            .drop("__file")
            .repartition(F.col("bin"))
            .write.mode("append")
            .partitionBy("bin")
            .parquet(dst_path)
        )
    from urllib.parse import urlparse

    # carried files: coordinator-side metadata work proportional to the
    # CARRIED subset (the same class as Iceberg's manifest rewrite)
    for row in plan.filter(~F.col("rewrite")).collect():
        bin_dir = os.path.join(dst_path, f"bin={row['bin']}")
        os.makedirs(bin_dir, exist_ok=True)
        # _metadata.file_path is a URI (file:/… locally, s3://… etc. on
        # a cluster); the zero-copy carry is a local-fs optimization —
        # object stores would server-side COPY here instead
        src_file = urlparse(row["file"]).path or row["file"]
        link = os.path.join(bin_dir, os.path.basename(src_file))
        if not os.path.exists(link):
            os.link(src_file, link)
    return plan


def sort_pack_bins(df: DataFrame, key: str, target_rows: int) -> DataFrame:
    """Pack ``df`` (a bounded compaction run — NOT a whole table)
    ordered by ``key`` into sequential row-budget bins:
    ``bin = floor(rank0 / target_rows)``. The unpartitioned window is
    deliberate and bounded (a run = a handful of micro-batches); the
    global order is the point — a sort-compaction's output is clustered
    on the key so min/max footer stats prune reads again.

    Every remaining column joins the ordering as a tiebreaker so the
    bin assignment — and therefore the documented byte-identical replay
    of run consolidation — is deterministic even when ``key`` is
    non-unique (r11 ADVICE; rows identical in ALL columns remain
    interchangeable, which cannot change the written bytes)."""
    w = Window.orderBy(key, *[c for c in df.columns if c != key])
    return df.select(
        ((F.row_number().over(w) - 1) / F.lit(target_rows))
        .cast("long")
        .alias("bin"),
        "*",
    )
