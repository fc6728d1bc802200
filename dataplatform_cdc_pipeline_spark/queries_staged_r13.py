"""r13 promotion candidates — STAGED, NOT REGISTERED.

The r12 registry is settled (248 entries; the r13 driver window is
pinned by test_r13_window_is_queued), so new queries follow the same
stage-then-promote path the r10–r12 promotions took: implemented and
oracle-gated NOW, registered only WITH the r13 rotation (append to
``_PRIORITY``'s tail → leads the r14 window as never-verified; update
the registry-count and window contract tests). ``STAGED_R13_QUERIES``
is NOT merged into ``__spark_entry__.queries()``
(tests/test_index_erasure.py pins the non-registration).

The erasure pair completes the right-to-be-forgotten story across ALL
THREE persisted derived indexes (`bm25_index_erasure` covered the
inverted index in r12): at 100 TB a GDPR delete that only touches the
primary tables leaves the subject retrievable through every derived
artifact — near-dup screening keeps matching its band rows, ANN probes
keep returning its code rows. The third query extends the maintenance
family the r12 compaction pair started to the index's own physical
layout.

1. ``dedup_index_erasure`` — erasure across the persisted MinHash-LSH
   band index (operators/dedup_index.py `erase`): index two batches,
   screen a probe batch (pairs hit the soon-erased docs), erase an id
   set spanning both batches, screen again — the second screening must
   be bit-identical to an index that NEVER held the erased docs (band
   rows are the index's only per-doc state). The oracle recomputes
   MinHash/banding/Jaccard relationally and filters the erased side
   out of phase 2; per-batch survivor counts + the erased count audit
   the partition rewrites.

2. ``ivf_index_erasure`` — erasure across the persisted IVF,SQ8 ANN
   index (operators/ivf_index.py `erase`): bootstrap + two delta
   batches, probe, erase ids spanning batches and cells, probe again —
   phase 2 must bit-equal from-scratch IVF,SQ8 over the SURVIVORS fed
   the same frozen artifacts (centroids/scales deliberately do NOT
   refit: what must be gone is the retrievable code row; statistical
   unlearning is the existing refit lifecycle). The oracle re-derives
   both phases from the frozen-artifact CTE chain with the erased ids
   masked out of phase 2's candidates.

3. ``bm25_compact_segments`` — the Lucene/LSM segment merge for the
   persisted BM25 index (operators/bm25_index.py `compact_segments`):
   per-batch partitioning makes adds delta-cost, but a long-lived
   index accrues partitions with ingest history; the merge folds them
   into ONE segment — score-bit-identical by construction (search only
   SUMS the per-batch aggregates; df/docstats recompute from the
   merged doclens/postings) and crash-safe by key-deduplicated union.
   The query's phase-2 search pins bit-equality, and the partition/
   docstats audit rows pin that consolidation actually happened (a
   no-op "compaction" diverges the batches=1 audit).

Reference parity: the reference has no index surface — these extend
the beyond-reference maintenance/erasure family (`cdc_erasure_txn`,
`bm25_index_erasure`, the compaction pair) to the remaining derived
artifacts.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark import bench_phases
from dataplatform_cdc_pipeline_spark.sources.tables import load_table


def q_dedup_index_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure from the persisted LSH band index. Output rows
    (phase, kind, id_a, id_b, metric):

    - phase 1 'cross'/'intra': near-dup pairs (jaccard ≥ 0.5) of the
      probe batch against the full two-batch index
    - phase 2 'cross'/'intra': the same screening AFTER
      erase(base ∧ doc_id % 7 == 2) — must be bit-identical to an
      index that never held the erased docs
    - phase 2 'docs:<batch>': distinct docs remaining per batch
      partition (every doc contributes band rows, so this audits the
      rewrite); 'erased': the erase() audit count
    """
    from dataplatform_cdc_pipeline_spark.operators.dedup_index import (
        IncrementalLshIndex,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 3)
    probe = docs.filter(F.col("doc_id") % 10 == 3)
    idx = IncrementalLshIndex(
        spark, tempfile.mkdtemp(prefix="lsh_erase_q_") + "/ix"
    )
    idx.add_batch("b0", base.filter(F.col("doc_id") % 2 == 0))
    idx.add_batch("b1", base.filter(F.col("doc_id") % 2 == 1))
    bench_phases.mark("setup")

    def pair_rows(phase: int, frame: DataFrame) -> DataFrame:
        return frame.select(
            F.lit(phase).alias("phase"),
            F.col("kind"),
            F.col("new_id").alias("id_a"),
            F.col("other_id").alias("id_b"),
            F.col("jaccard").alias("metric"),
        )

    p1 = pair_rows(1, idx.dedup_batch(probe, docs, 0.5)).localCheckpoint(
        eager=True
    )
    bench_phases.mark("screen")
    res = idx.erase(base.filter(F.col("doc_id") % 7 == 2).select("doc_id"))
    bench_phases.mark("erase")
    p2 = pair_rows(2, idx.dedup_batch(probe, docs, 0.5))
    audit = (
        idx.index_bands()
        .groupBy("batch")
        .agg(F.count_distinct("doc_id").alias("n"))
        .select(
            F.lit(2).alias("phase"),
            F.concat(F.lit("docs:"), F.col("batch")).alias("kind"),
            F.lit(None).cast("long").alias("id_a"),
            F.lit(None).cast("long").alias("id_b"),
            F.col("n").cast("double").alias("metric"),
        )
    )
    erased_row = spark.createDataFrame(
        [(2, "erased", None, None, float(res["docs_erased"]))],
        "phase int, kind string, id_a long, id_b long, metric double",
    )
    return p1.unionByName(p2).unionByName(audit).unionByName(erased_row)


def _sql_dedup_index_erasure() -> str:
    from dataplatform_cdc_pipeline_spark.queries_llm import (
        _MINHASH_FAMILY,
        SHINGLES,
        TOKS,
    )

    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {SHINGLES} AS sh FROM t),
sig AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END AS grp,
         CASE WHEN doc_id % 10 <> 3 AND doc_id % 7 = 2 THEN 1 ELSE 0 END AS er,
         list_distinct(sh) AS shset,
         list_transform(range(0, 8), f ->
           list_min(list_transform(sh, g -> {_MINHASH_FAMILY}))) AS mh
  FROM s),
bands AS (
  SELECT doc_id, grp, er,
         unnest(list_transform(range(0, 4), b ->
           b::VARCHAR || '_' || mh[2*b + 1]::VARCHAR || '_' || mh[2*b + 2]::VARCHAR))
           AS band_key
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.grp AS ga, a.er AS ea,
                  b.doc_id AS id_b, b.grp AS gb, b.er AS eb
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
  WHERE a.grp = 1 OR b.grp = 1),
pairs AS (
  SELECT CASE WHEN ga = 1 THEN id_a ELSE id_b END AS new_id,
         CASE WHEN ga = 1 THEN id_b ELSE id_a END AS other_id,
         CASE WHEN ga = 1 AND gb = 1 THEN 'intra' ELSE 'cross' END AS kind,
         ea, eb,
         floor(len(list_intersect(sa.shset, sb.shset)) * 1.0 /
               len(list_distinct(list_concat(sa.shset, sb.shset)))
               * 1000000.0) / 1000000.0 AS jaccard
  FROM cand JOIN sig sa ON cand.id_a = sa.doc_id
            JOIN sig sb ON cand.id_b = sb.doc_id),
hits AS (SELECT * FROM pairs WHERE jaccard >= 0.5)
SELECT 1 AS phase, kind, new_id AS id_a, other_id AS id_b,
       jaccard AS metric
FROM hits
UNION ALL
SELECT 2, kind, new_id, other_id, jaccard
FROM hits WHERE ea = 0 AND eb = 0
UNION ALL
SELECT 2, 'docs:b' || (doc_id % 2)::VARCHAR, NULL, NULL,
       count(*)::DOUBLE
FROM documents
WHERE doc_id % 10 <> 3 AND doc_id % 7 <> 2
GROUP BY doc_id % 2
UNION ALL
SELECT 2, 'erased', NULL, NULL, count(*)::DOUBLE
FROM documents WHERE doc_id % 10 <> 3 AND doc_id % 7 = 2
"""


SQL_DEDUP_INDEX_ERASURE = _sql_dedup_index_erasure()


def q_ivf_index_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure from the persisted IVF,SQ8 index. Output rows
    (phase, kind, query_id, rk, nbr_id, nbr_batch, score):

    - phase 1 'probe': top-5 over the full base+b1+b2 index
    - phase 2 'probe': top-5 AFTER erase(vec_id % 5 == 1) — must be
      bit-identical to from-scratch IVF,SQ8 over the survivors fed the
      same frozen centroids/scales (which deliberately do NOT refit)
    - phase 2 'rows:<batch>': surviving code rows per batch partition;
      'erased': the erase() audit count
    """
    from dataplatform_cdc_pipeline_spark.operators.ivf_index import (
        IncrementalIvfIndex,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter((F.col("vec_id") % 10 != 3) & (F.col("vec_id") % 10 != 7))
    b1 = emb.filter(F.col("vec_id") % 10 == 3)
    b2 = emb.filter(F.col("vec_id") % 10 == 7)
    queries = emb.filter(F.col("vec_id") < 5)
    idx = IncrementalIvfIndex(
        spark, tempfile.mkdtemp(prefix="ivf_erase_q_") + "/ix"
    )
    idx.bootstrap("base", base)
    idx.add_batch("b1", b1)
    idx.add_batch("b2", b2)
    bench_phases.mark("setup")

    def probe_rows(phase: int) -> DataFrame:
        return idx.probe(queries, k=5, nprobe=2).select(
            F.lit(phase).alias("phase"), F.lit("probe").alias("kind"),
            "query_id", "rk", "nbr_id", "nbr_batch", "score",
        )

    p1 = probe_rows(1).localCheckpoint(eager=True)
    bench_phases.mark("probe")
    res = idx.erase(emb.filter(F.col("vec_id") % 5 == 1).select("vec_id"))
    bench_phases.mark("erase")
    p2 = probe_rows(2).localCheckpoint(eager=True)
    audit = (
        idx.index_rows()
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(2).alias("phase"),
            F.concat(F.lit("rows:"), F.col("batch")).alias("kind"),
            F.lit(None).cast("long").alias("query_id"),
            F.lit(None).cast("int").alias("rk"),
            F.lit(None).cast("long").alias("nbr_id"),
            F.lit(None).cast("string").alias("nbr_batch"),
            F.col("n").alias("score"),
        )
    )
    erased_row = spark.createDataFrame(
        [(2, "erased", None, None, None, None, int(res["vecs_erased"]))],
        "phase int, kind string, query_id long, rk int, nbr_id long, "
        "nbr_batch string, score long",
    )
    return p1.unionByName(p2).unionByName(audit).unionByName(erased_row)


#: Oracle: the SQL_INCREMENTAL_IVF_BATCH frozen-artifact chain (same
#: centroids/scales/assignment CTEs) with two phases — phase 2 masks
#: the erased ids out of the candidate set — plus the partition audits.
SQL_IVF_INDEX_ERASURE = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS vec,
         CASE WHEN vec_id % 10 = 3 THEN 1
              WHEN vec_id % 10 = 7 THEN 2 ELSE 0 END AS bord
  FROM embeddings),
m AS (
  SELECT vec_id, pos,
         CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS mv
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos FROM embeddings)),
cm AS (
  SELECT b.label AS cell, m.pos, CAST(floor(sum(m.mv) / count(*)) AS DOUBLE) AS c
  FROM m JOIN (SELECT vec_id, label FROM v WHERE bord = 0) b USING (vec_id)
  GROUP BY 1, 2),
cent AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM cm GROUP BY cell),
scale AS (
  SELECT pos, max(abs(mv)) AS mx
  FROM m JOIN (SELECT vec_id FROM v WHERE bord = 0) b USING (vec_id)
  GROUP BY pos),
codes AS (
  SELECT vec_id, m.pos,
         CASE WHEN s.mx = 0 THEN 0
              ELSE (CASE WHEN mv < 0 THEN -1 ELSE 1 END)
                   * CAST(floor(abs(mv) * 127.0 / s.mx) AS BIGINT) END AS code
  FROM m JOIN scale s ON m.pos = s.pos),
acell AS (
  SELECT vec_id, bord, cell FROM (
    SELECT r.vec_id, r.bord, c.cell,
           row_number() OVER (
             PARTITION BY r.vec_id
             ORDER BY list_dot_product(r.vec, c.centroid) /
                      (sqrt(list_dot_product(r.vec, r.vec)) *
                       sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                      c.cell ASC) AS rk
    FROM v r CROSS JOIN cent c) WHERE rk = 1),
qv AS (SELECT vec_id AS query_id, vec FROM v WHERE vec_id < 5),
routed AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.vec, c.centroid) /
                      (sqrt(list_dot_product(q.vec, q.vec)) *
                       sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                      c.cell ASC) AS rk
    FROM qv q CROSS JOIN cent c) WHERE rk <= 2),
qm AS (SELECT vec_id AS query_id, pos, mv FROM m WHERE vec_id < 5),
ph AS (SELECT unnest([1, 2]) AS phase),
-- phase 2 sees only the survivors of erase(vec_id % 5 == 1)
cand AS (
  SELECT ph.phase, r.query_id, a.vec_id AS nbr_id, a.bord
  FROM ph CROSS JOIN routed r
  JOIN acell a ON r.cell = a.cell AND a.vec_id <> r.query_id
  WHERE ph.phase = 1 OR a.vec_id % 5 <> 1),
sc AS (
  SELECT cand.phase, cand.query_id, cand.nbr_id, max(cand.bord) AS bord,
         CAST(SUM(c.code * qm.mv) AS BIGINT) AS score
  FROM cand
  JOIN codes c ON c.vec_id = cand.nbr_id
  JOIN qm ON qm.query_id = cand.query_id AND qm.pos = c.pos
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT phase, query_id, nbr_id, bord, score,
         row_number() OVER (PARTITION BY phase, query_id
                            ORDER BY score DESC, nbr_id) AS rk
  FROM sc)
SELECT phase, 'probe' AS kind, query_id, rk, nbr_id,
       CASE bord WHEN 1 THEN 'b1' WHEN 2 THEN 'b2' ELSE 'base' END AS nbr_batch,
       score
FROM ranked WHERE rk <= 5
UNION ALL
SELECT 2, 'rows:' || CASE bord WHEN 1 THEN 'b1' WHEN 2 THEN 'b2'
                               ELSE 'base' END,
       NULL, NULL, NULL, NULL, count(*)
FROM v WHERE vec_id % 5 <> 1 GROUP BY bord
UNION ALL
SELECT 2, 'erased', NULL, NULL, NULL, NULL, count(*)
FROM v WHERE vec_id % 5 = 1
"""


def q_bm25_compact_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-merge lifecycle for the persisted BM25 index. Output
    rows (phase, kind, doc_id, term, score):

    - phase 1 'search': top-20 over four per-batch partitions
    - phase 2 'search': top-20 AFTER compact_segments() — must be
      bit-identical (search only sums the per-batch aggregates)
    - phase 2 'batches': distinct batch partitions remaining (1.0 —
      a no-op compaction diverges here), 'docs': docstats N after the
      merge, 'df' per query term: merged document frequencies
    """
    from dataplatform_cdc_pipeline_spark.operators.bm25_index import (
        _DOCSTATS_SCHEMA,
        IncrementalBm25Index,
    )
    from dataplatform_cdc_pipeline_spark.queries_llm import BM25_TERMS

    docs = load_table(spark, sf_dir, "documents")
    idx = IncrementalBm25Index(
        spark, tempfile.mkdtemp(prefix="bm25_seg_q_") + "/ix"
    )
    for g in range(4):
        idx.add_batch(f"b{g}", docs.filter(F.col("doc_id") % 4 == g))
    bench_phases.mark("setup")

    def search_rows(phase: int) -> DataFrame:
        return idx.search(BM25_TERMS).select(
            F.lit(phase).alias("phase"), F.lit("search").alias("kind"),
            F.col("doc_id"), F.lit(None).cast("string").alias("term"),
            F.col("bm25").alias("score"),
        )

    p1 = search_rows(1).localCheckpoint(eager=True)
    bench_phases.mark("search")
    idx.compact_segments()
    bench_phases.mark("compact")
    p2 = search_rows(2).localCheckpoint(eager=True)
    stats = idx._read("docstats", _DOCSTATS_SCHEMA)
    audit = stats.agg(
        F.count_distinct("batch").alias("batches"),
        F.sum("n_docs").alias("n_docs"),
    ).select(
        F.lit(2).alias("phase"), F.lit("batches").alias("kind"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("term"),
        F.col("batches").cast("double").alias("score"),
    ).unionByName(
        stats.agg(F.sum("n_docs").alias("n")).select(
            F.lit(2).alias("phase"), F.lit("docs").alias("kind"),
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("string").alias("term"),
            F.col("n").cast("double").alias("score"),
        )
    )
    dfrows = idx.term_stats(BM25_TERMS).select(
        F.lit(2).alias("phase"), F.lit("df").alias("kind"),
        F.lit(None).cast("long").alias("doc_id"), F.col("term"),
        F.col("df").cast("double").alias("score"),
    )
    return p1.unionByName(p2).unionByName(audit).unionByName(dfrows)


def _compact_segments_oracle_sql() -> str:
    from dataplatform_cdc_pipeline_spark.queries_llm import TOKS
    from dataplatform_cdc_pipeline_spark.queries_promoted_r11 import (
        _TERMS_SQL,
        _bm25_phase_sql,
    )

    return (
        _bm25_phase_sql(1, "TRUE")
        + "\nUNION ALL"
        + _bm25_phase_sql(2, "TRUE")
        + f"""
UNION ALL
SELECT 2 AS phase, 'batches' AS kind, NULL::BIGINT AS doc_id,
       NULL::VARCHAR AS term, 1.0 AS score
UNION ALL
SELECT 2, 'docs', NULL, NULL, count(*)::DOUBLE FROM documents
UNION ALL
SELECT 2, 'df', NULL::BIGINT, term, count(DISTINCT doc_id)::DOUBLE
FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
WHERE term IN {_TERMS_SQL}
GROUP BY term
"""
    )


SQL_BM25_COMPACT_SEGMENTS = _compact_segments_oracle_sql()


STAGED_R13_QUERIES = {
    "dedup_index_erasure": q_dedup_index_erasure,
    "ivf_index_erasure": q_ivf_index_erasure,
    "bm25_compact_segments": q_bm25_compact_segments,
}

STAGED_R13_ORACLES = {
    "dedup_index_erasure": SQL_DEDUP_INDEX_ERASURE,
    "ivf_index_erasure": SQL_IVF_INDEX_ERASURE,
    "bm25_compact_segments": SQL_BM25_COMPACT_SEGMENTS,
}
