"""r11 promotions — the incremental BM25 pair (registry 243 → 245).

Staged + oracle-gated at sf0.001 AND sf0.01 through r10
(tests/test_bm25_index.py), promoted WITH the r11 rotation per the r10
verdict (task 3): appended to ``_PRIORITY``'s tail, so they lead the
r12 window as its never-driver-verified head — the same
stage-then-promote path the r10 promotions took.

1. ``incremental_bm25_batch`` — the persisted inverted index
   (operators/bm25_index.py): batch 1 indexed and searched, batch 2
   added (delta-cost) and searched — every document's score SHIFTS
   because idf/avgdl are recomputed from the per-batch aggregates —
   then a replayed batch-2 add proves idempotence (identical search)
   and the df audit pins the merged per-batch term stats. The oracle
   reproduces each phase's BM25 from scratch over that phase's corpus
   subset, so a stale df table, a lost batch, or a non-idempotent
   replay diverges the hash.

2. ``stream_bm25_index`` — the SAME loop behind foreachBatch
   (streaming/bm25_stream.py): three mtime-ordered micro-batches, each
   add followed by a batches-≤-k-scoped search snapshot published under
   its own partition (the replay contract shared with the dedup
   stream). The oracle recomputes each snapshot's BM25 from scratch
   over that batch prefix of the corpus, so a stale scope, a lost
   batch, or a non-idempotent replay diverges the hash.

Reference parity: the reference has no search surface — beyond-reference
platform operators (SURVEY.md §2 flank), the search mirror of
``incremental_dedup_batch`` / ``stream_dedup_index`` /
``incremental_ivf_batch``.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark import bench_phases
from dataplatform_cdc_pipeline_spark.queries_llm import BM25_TERMS, TOKS
from dataplatform_cdc_pipeline_spark.sources.tables import load_table, spread_scan


def q_incremental_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch lifecycle of the incremental BM25 index + replay + df
    audit. Output rows (phase, kind, doc_id, term, score):

    - phase 1 'search': top-20 with only batch b0 (even doc_ids) indexed
    - phase 2 'search': top-20 after adding b1 (odd doc_ids) — the
      whole ranking may shift (idf/avgdl recomputed from batch stats)
    - phase 3 'search': after REPLAYING b1's add (idempotent partition
      overwrite) — must equal phase 2 exactly
    - phase 3 'df': merged document frequency per query term
    """
    from dataplatform_cdc_pipeline_spark.operators.bm25_index import (
        IncrementalBm25Index,
    )

    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = IncrementalBm25Index(
        spark, tempfile.mkdtemp(prefix="bm25_ix_q_") + "/ix"
    )

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

    idx.add_batch("b0", b0)
    bench_phases.mark("add_b0")
    p1 = rows(1, "search", idx.search(BM25_TERMS)).localCheckpoint(eager=True)
    bench_phases.mark("search")
    idx.add_batch("b1", b1)
    bench_phases.mark("add_b1")
    p2 = rows(2, "search", idx.search(BM25_TERMS)).localCheckpoint(eager=True)
    bench_phases.mark("search")
    idx.add_batch("b1", b1)  # replay: rewrites exactly its own partitions
    bench_phases.mark("replay_b1")
    p3 = rows(3, "search", idx.search(BM25_TERMS)).localCheckpoint(eager=True)
    audit = rows(3, "df", idx.term_stats(BM25_TERMS))
    return p1.unionByName(p2).unionByName(p3).unionByName(audit)


_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in BM25_TERMS) + ")"


def _bm25_phase_sql(phase: int, corpus_pred: str) -> str:
    """From-scratch BM25 over the corpus subset ``corpus_pred`` — the
    same scoring as queries_llm.SQL_BM25_SEARCH, parameterized so each
    lifecycle phase re-derives the stats its index state implies."""
    return f"""
SELECT {phase} AS phase, 'search' AS kind, doc_id, NULL::VARCHAR AS term,
       bm25 AS score
FROM (
  WITH base AS (SELECT doc_id, {TOKS} AS toks FROM documents WHERE {corpus_pred}),
  dl AS (SELECT doc_id, len(toks) AS dl, toks FROM base),
  stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
  qt AS (SELECT doc_id, dl, unnest(toks) AS term FROM dl),
  qf AS (SELECT * FROM qt WHERE term IN {_TERMS_SQL}),
  tf AS (SELECT doc_id, term, dl, count(*) AS tf FROM qf GROUP BY doc_id, term, dl),
  df AS (SELECT term, count(DISTINCT doc_id) AS df FROM qf GROUP BY term),
  scored AS (
    SELECT tf.doc_id,
           sum(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))) AS raw
    FROM tf JOIN df USING (term), stats
    GROUP BY tf.doc_id)
  SELECT doc_id, floor(raw * 1000000.0) / 1000000.0 AS bm25
  FROM scored
  ORDER BY bm25 DESC, doc_id
  LIMIT 20
)"""


SQL_INCREMENTAL_BM25_BATCH = (
    _bm25_phase_sql(1, "doc_id % 2 = 0")
    + "\nUNION ALL"
    + _bm25_phase_sql(2, "TRUE")
    + "\nUNION ALL"
    + _bm25_phase_sql(3, "TRUE")
    + f"""
UNION ALL
SELECT 3 AS phase, 'df' AS kind, NULL::BIGINT AS doc_id, term,
       count(DISTINCT doc_id)::DOUBLE AS score
FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
WHERE term IN {_TERMS_SQL}
GROUP BY term
"""
)


def q_stream_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming BM25 index maintenance (streaming/bm25_stream.py): the
    documents arrive as THREE mtime-ordered micro-batches (doc_id%3 =
    0,1,2); each batch is indexed at delta cost and a top-20 search
    snapshot scoped to batches ≤ k is published — the snapshot sequence
    IS the ranking's drift as the corpus grew, which the oracle
    recomputes from scratch per batch prefix."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from dataplatform_cdc_pipeline_spark.streaming.bm25_stream import (
        stream_bm25_index,
    )

    docs = spread_scan(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    tmp = _tempfile.mkdtemp(prefix="bm25_stream_q_")
    src = f"{tmp}/src"
    _os.makedirs(src)
    t0 = 1_000_000_000  # fixed mtimes: arrival order is the contract
    for g in range(3):
        d = f"{tmp}/stage_{g}"
        docs.filter(F.col("doc_id") % 3 == g).coalesce(1).write.parquet(d)
        part = _glob.glob(f"{d}/part-*.parquet")[0]
        dest = f"{src}/batch_{g}.parquet"
        _shutil.move(part, dest)
        _os.utime(dest, (t0 + g * 100, t0 + g * 100))
    bench_phases.mark("setup")  # 3 staged micro-batches end here
    out = stream_bm25_index(
        spark, src, "doc_id long, text string", f"{tmp}/work", BM25_TERMS
    )
    bench_phases.mark("drain")  # per-batch add -> scoped search snapshots
    return out


def _stream_phase_sql(k: int) -> str:
    """From-scratch BM25 over the batch prefix doc_id%3 ≤ k, labelled
    with the micro-batch id that published that snapshot."""
    inner = _bm25_phase_sql(k, f"doc_id % 3 <= {k}")
    # reshape (phase, kind, doc_id, term, score) -> (batch, doc_id, bm25)
    return f"""
SELECT 'b{k}' AS batch, doc_id, score AS bm25
FROM ({inner})"""


SQL_STREAM_BM25_INDEX = (
    _stream_phase_sql(0)
    + "\nUNION ALL"
    + _stream_phase_sql(1)
    + "\nUNION ALL"
    + _stream_phase_sql(2)
)


PROMOTED_R11_QUERIES = {
    "incremental_bm25_batch": q_incremental_bm25_batch,
    "stream_bm25_index": q_stream_bm25_index,
}

PROMOTED_R11_ORACLES = {
    "incremental_bm25_batch": SQL_INCREMENTAL_BM25_BATCH,
    "stream_bm25_index": SQL_STREAM_BM25_INDEX,
}
