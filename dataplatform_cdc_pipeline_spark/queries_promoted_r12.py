"""r12 promotions (registry 245 -> 248; r11 verdict task 3).

Staged + oracle-gated at sf0.001 and sf0.01 through r11
(tests/test_compaction.py + SCALE.md 10× rows), promoted WITH the r12
rotation per the stage-then-promote path the r10/r11 promotions took:
appended to ``_PRIORITY``'s tail, so the trio leads the r13 window as
its never-driver-verified head (tests/test_registry_contract.py pins
the registration and the r13 queue).

1. ``cdc_compact_binpack`` — bin-pack small-file compaction
   (operators/compaction.py): 16 staged small files are profiled via
   the ``_metadata`` hidden column, sequentially packed into row-budget
   bins, and rewritten one file per bin (already-compact bins would be
   hard-linked, zero I/O — the carried path, pytest-pinned). The
   oracle re-derives the plan from the data (the staged file for group
   g holds exactly the rows with event_id % 16 = g) and the post/total
   phases pin content invariance — a lost row, a double-packed file,
   or a mis-assigned bin diverges the hash.

2. ``stream_compact_runs`` — the LSM-style maintenance loop behind
   foreachBatch (streaming/compaction_stream.py): five mtime-ordered
   micro-batches land idempotently, every second batch consolidates
   its bounded delta into a sort-compacted run (one file per bin,
   clustered on event_id), the fifth stays as the uncompacted landing
   tail. The oracle recomputes each run's bins relationally from the
   batch slices; the total row pins that runs + tail = exactly the
   source.

3. ``bm25_index_erasure`` — right-to-be-forgotten ACROSS the derived
   index (operators/bm25_index.py `erase`): deleting a doc from the
   corpus is not enough when a persisted inverted index keeps its
   content searchable. The lifecycle: index two batches, search, erase
   a deterministic id set spanning both batches, search again + df
   audit. The oracle recomputes phase-2 BM25 from scratch over the
   SURVIVOR corpus — a stale posting, an undecremented N, or an
   unadjusted df diverges every score. The GDPR twin of
   `cdc_erasure_txn`, extended to derived artifacts.

Reference parity: the reference runs on managed warehouse tables and
has no file-maintenance or search surface — beyond-reference platform
operators (SURVEY.md §2 flank), the storage-maintenance mirror of the
incremental-index family (`incremental_dedup_batch` /
`incremental_bm25_batch`: delta-cost upkeep of a persisted physical
layout).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark import bench_phases
from dataplatform_cdc_pipeline_spark.sources.tables import load_table, spread_scan

_N_FILES = 16  # staged small files for the bin-pack query
_N_BINS = 5  # target bins: target_rows = ceil(n / _N_BINS)


def _stage_group_files(df: DataFrame, n: int, key: str, dest: str) -> None:
    """One parquet file per key%n group, deterministically named so
    file-name order == group order (g00.parquet … g15.parquet)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    stage_root = tempfile.mkdtemp(prefix="compact_stage_")
    _os.makedirs(dest, exist_ok=True)
    for g in range(n):
        d = f"{stage_root}/stage_{g}"
        df.filter(F.col(key) % n == g).coalesce(1).write.parquet(d)
        part = _glob.glob(f"{d}/part-*.parquet")[0]
        _shutil.move(part, f"{dest}/g{g:02d}.parquet")


def q_cdc_compact_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-pack compaction lifecycle. Output rows
    (phase, id, bin, n_rows, sum_key, rewrite):

    - 'plan': one row per input file (id = its group g) — the bin the
      sequential row-budget packing assigned and the rewrite decision
    - 'post': per-bin row count + event_id sum read back from the
      compacted layout — mis-packed data diverges here
    - 'total': whole-table invariance (count + sum survive compaction)
    """
    from dataplatform_cdc_pipeline_spark.operators.compaction import compact

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="compact_q_")
    src, dst = f"{tmp}/src", f"{tmp}/dst"
    _stage_group_files(events, _N_FILES, "event_id", src)
    n_total = spark.read.parquet(src).count()
    target = -(-n_total // _N_BINS)  # ceil
    bench_phases.mark("setup")

    plan = compact(spark, src, dst, target)
    bench_phases.mark("compact")

    plan_rows = plan.select(
        F.lit("plan").alias("phase"),
        F.regexp_extract("file", r"g(\d+)\.parquet$", 1)
        .cast("long")
        .alias("id"),
        "bin",
        "n_rows",
        F.lit(None).cast("long").alias("sum_key"),
        F.col("rewrite").cast("int").alias("rewrite"),
    )
    compacted = spark.read.parquet(dst)
    post = (
        compacted.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("sum_key"),
        )
        .select(
            F.lit("post").alias("phase"),
            F.lit(None).cast("long").alias("id"),
            "bin", "n_rows", "sum_key",
            F.lit(None).cast("int").alias("rewrite"),
        )
    )
    total = compacted.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_key"),
    ).select(
        F.lit("total").alias("phase"),
        F.lit(None).cast("long").alias("id"),
        F.lit(None).cast("long").alias("bin"),
        "n_rows", "sum_key",
        F.lit(None).cast("int").alias("rewrite"),
    )
    return plan_rows.unionByName(post).unionByName(total)


SQL_CDC_COMPACT_BINPACK = f"""
WITH per_g AS (
  -- sums cast to BIGINT: DuckDB sum(BIGINT) is HUGEINT, which pandas
  -- renders float64 and the driver's value hash would diverge from
  -- Spark's int64 (caught by check_parity before the r12 promotion)
  SELECT event_id % {_N_FILES} AS g, count(*) AS n_rows,
         CAST(sum(event_id) AS BIGINT) AS sum_id
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(ceil(count(*) / {_N_BINS}.0) AS BIGINT) AS target FROM events
),
cum AS (
  SELECT g, n_rows, sum_id,
         COALESCE(SUM(n_rows) OVER (
           ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cb
  FROM per_g
),
plan AS (
  SELECT g, n_rows, sum_id, cb // tot.target AS bin, tot.target AS target
  FROM cum, tot
),
per_bin AS (
  SELECT bin, count(*) AS n_files,
         CAST(sum(n_rows) AS BIGINT) AS bin_rows,
         CAST(sum(sum_id) AS BIGINT) AS bin_sum, max(target) AS target
  FROM plan GROUP BY bin
)
SELECT 'plan' AS phase, p.g AS id, p.bin, p.n_rows,
       NULL::BIGINT AS sum_key,
       CAST(b.n_files > 1 OR b.bin_rows < b.target AS INT) AS rewrite
FROM plan p JOIN per_bin b USING (bin)
UNION ALL
SELECT 'post', NULL, bin, bin_rows, bin_sum, NULL::INT FROM per_bin
UNION ALL
SELECT 'total', NULL, NULL, count(*),
       CAST(sum(event_id) AS BIGINT), NULL::INT
FROM events
"""


_N_BATCHES = 5
_EVERY = 2
_BINS_PER_RUN = 3


def q_stream_compact_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming landing + run consolidation
    (streaming/compaction_stream.py): five micro-batches
    (event_id % 5 = 0..4, mtime order), runs r0/r1 consolidate batch
    pairs, b4 stays as the landing tail. Output = run_stats plus the
    whole-view invariance row (runs + tail == source, count and key
    sum/range exact)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from dataplatform_cdc_pipeline_spark.streaming.compaction_stream import (
        run_stats,
        stream_compact_runs,
    )

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    tmp = tempfile.mkdtemp(prefix="compact_stream_q_")
    src = f"{tmp}/src"
    _os.makedirs(src)
    t0 = 1_000_000_000  # fixed mtimes: arrival order is the contract
    for g in range(_N_BATCHES):
        d = f"{tmp}/stage_{g}"
        events.filter(F.col("event_id") % _N_BATCHES == g).coalesce(1).write.parquet(d)
        part = _glob.glob(f"{d}/part-*.parquet")[0]
        dest = f"{src}/batch_{g}.parquet"
        _shutil.move(part, dest)
        _os.utime(dest, (t0 + g * 100, t0 + g * 100))
    bench_phases.mark("setup")

    work = f"{tmp}/work"
    stream_compact_runs(
        spark, src, "event_id long, value double", work,
        key="event_id", compact_every=_EVERY, bins_per_run=_BINS_PER_RUN,
    )
    bench_phases.mark("drain")

    stats = run_stats(
        spark, work, "event_id", "event_id long, value double",
        n_batches=_N_BATCHES, compact_every=_EVERY,
    )
    live = spark.read.parquet(f"{work}/runs").select("event_id").unionByName(
        spark.read.parquet(f"{work}/landing")
        .filter(F.expr("CAST(substring(batch, 2) AS BIGINT)") >= 4)
        .select("event_id")
    )
    total = live.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_key"),
        F.min("event_id").alias("min_key"),
        F.max("event_id").alias("max_key"),
    ).select(
        F.lit("total").alias("phase"),
        F.lit(None).cast("string").alias("id"),
        F.lit(None).cast("long").alias("bin"),
        "n_rows", "sum_key", "min_key", "max_key",
    )
    return stats.unionByName(total)


def _run_sql(j: int) -> str:
    """Relational re-derivation of run r<j>: the sorted batch-pair
    delta packed into ceil(n/bins) row-budget bins."""
    lo, hi = j * _EVERY, j * _EVERY + _EVERY - 1
    return f"""
SELECT 'run' AS phase, 'r{j}' AS id, bin, count(*) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS sum_key, min(event_id) AS min_key,
       max(event_id) AS max_key
FROM (
  WITH delta AS (
    SELECT event_id FROM events
    WHERE event_id % {_N_BATCHES} BETWEEN {lo} AND {hi}
  ),
  sized AS (SELECT CAST(ceil(count(*) / {_BINS_PER_RUN}.0) AS BIGINT) AS t
            FROM delta)
  SELECT event_id,
         (ROW_NUMBER() OVER (ORDER BY event_id) - 1) // sized.t AS bin
  FROM delta, sized
)
GROUP BY bin"""


SQL_STREAM_COMPACT_RUNS = (
    _run_sql(0)
    + "\nUNION ALL"
    + _run_sql(1)
    + f"""
UNION ALL
SELECT 'tail', 'b4', NULL::BIGINT, count(*),
       CAST(sum(event_id) AS BIGINT), min(event_id), max(event_id)
FROM events WHERE event_id % {_N_BATCHES} = 4
UNION ALL
SELECT 'total', NULL::VARCHAR, NULL::BIGINT, count(*),
       CAST(sum(event_id) AS BIGINT), min(event_id), max(event_id)
FROM events
"""
)


def q_bm25_index_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure from the persisted BM25 index. Output rows
    (phase, kind, doc_id, term, score):

    - phase 1 'search': top-20 over the full two-batch index
    - phase 2 'search': top-20 AFTER erase(doc_id % 7 == 3) — must be
      bit-identical to from-scratch BM25 over the survivor corpus
      (idf/avgdl/N re-derived from the rewritten per-batch aggregates)
    - phase 2 'df': merged per-term document frequency post-erase
    """
    from dataplatform_cdc_pipeline_spark.operators.bm25_index import (
        IncrementalBm25Index,
    )
    from dataplatform_cdc_pipeline_spark.queries_llm import BM25_TERMS

    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    idx = IncrementalBm25Index(
        spark, tempfile.mkdtemp(prefix="bm25_erase_q_") + "/ix"
    )
    idx.add_batch("b0", docs.filter(F.col("doc_id") % 2 == 0))
    idx.add_batch("b1", docs.filter(F.col("doc_id") % 2 == 1))
    bench_phases.mark("setup")

    def rows(phase: int, kind: str, frame: DataFrame) -> DataFrame:
        if kind == "search":
            return frame.select(
                F.lit(phase).alias("phase"), F.lit(kind).alias("kind"),
                F.col("doc_id"), F.lit(None).cast("string").alias("term"),
                F.col("bm25").alias("score"),
            )
        return frame.select(
            F.lit(phase).alias("phase"), F.lit(kind).alias("kind"),
            F.lit(None).cast("long").alias("doc_id"), F.col("term"),
            F.col("df").cast("double").alias("score"),
        )

    p1 = rows(1, "search", idx.search(BM25_TERMS)).localCheckpoint(eager=True)
    bench_phases.mark("search")
    idx.erase(docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"))
    bench_phases.mark("erase")
    p2 = rows(2, "search", idx.search(BM25_TERMS)).localCheckpoint(eager=True)
    audit = rows(2, "df", idx.term_stats(BM25_TERMS))
    return p1.unionByName(p2).unionByName(audit)


def _erasure_oracle_sql() -> str:
    from dataplatform_cdc_pipeline_spark.queries_llm import TOKS
    from dataplatform_cdc_pipeline_spark.queries_promoted_r11 import (
        _TERMS_SQL,
        _bm25_phase_sql,
    )

    return (
        _bm25_phase_sql(1, "TRUE")
        + "\nUNION ALL"
        + _bm25_phase_sql(2, "doc_id % 7 <> 3")
        + f"""
UNION ALL
SELECT 2 AS phase, 'df' AS kind, NULL::BIGINT AS doc_id, term,
       count(DISTINCT doc_id)::DOUBLE AS score
FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents
      WHERE doc_id % 7 <> 3)
WHERE term IN {_TERMS_SQL}
GROUP BY term
"""
    )


SQL_BM25_INDEX_ERASURE = _erasure_oracle_sql()


PROMOTED_R12_QUERIES = {
    "cdc_compact_binpack": q_cdc_compact_binpack,
    "stream_compact_runs": q_stream_compact_runs,
    "bm25_index_erasure": q_bm25_index_erasure,
}

PROMOTED_R12_ORACLES = {
    "cdc_compact_binpack": SQL_CDC_COMPACT_BINPACK,
    "stream_compact_runs": SQL_STREAM_COMPACT_RUNS,
    "bm25_index_erasure": SQL_BM25_INDEX_ERASURE,
}
