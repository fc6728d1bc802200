"""Training-data preparation wave: content-defined boilerplate removal,
deterministic weighted sampling, k-anonymity auditing, product
quantization (ADC search + recall), distribution-drift (PSI), seeded
global shuffle into training batches, and per-doc TF-IDF keywords.

Same conventions as queries_llm.py / queries_curation.py: MD5-derived
determinism (functions/hashing.py), exact integer arithmetic wherever an
aggregate feeds the driver's value hash, floor-scaled doubles where a
float (ln) is semantically unavoidable — the float expression is written
IDENTICALLY in both engines so IEEE evaluation lands on the same double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long, md5_long_sql
from dataplatform_cdc_pipeline_spark.operators.chunking import (
    BOILER_FRACTION_DIV,
    BOILER_MIN_DF,
    CDC_MOD,
    boilerplate_strip,
)
from dataplatform_cdc_pipeline_spark.queries_llm import TOKS
from dataplatform_cdc_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# content-defined-chunking boilerplate strip
# ---------------------------------------------------------------------------

#: synthesized footers (the corpus is footer-free) — chosen so the CDC
#: rolling hash places a boundary INSIDE each footer's own-content gram
#: region (verified: footer A flags at token 4, footer B at token 9), so
#: their trailing chunks are offset-independent and hash-identical across
#: every doc that carries the same footer combination.
FOOTER_A = "follow this page and subscribe to our newsletter for weekly updates and offers"
FOOTER_B = "all rights reserved unauthorized reproduction of this material is strictly prohibited worldwide"


def _dirty_docs(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(" " + FOOTER_A)).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" " + FOOTER_B)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-content removal with CONTENT-DEFINED chunk boundaries
    (operators/chunking.py) — the CCNet/RefinedWeb-style boilerplate
    strip that fixed-offset windows cannot do, because the injected
    footers start at a different token offset in every document."""
    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_strip(_dirty_docs(docs))


_DIRTY_SQL = f"""
SELECT doc_id,
       text ||
       CASE WHEN doc_id % 4 = 0 THEN ' {FOOTER_A}' ELSE '' END ||
       CASE WHEN doc_id % 7 = 0 THEN ' {FOOTER_B}' ELSE '' END AS text
FROM documents"""

_GRAM = "concat_ws(' ', t3, t2, t1, tok)"

SQL_BOILERPLATE_STRIP = f"""
WITH dirty AS ({_DIRTY_SQL}),
tok AS (
  SELECT doc_id, unnest({TOKS}) AS tok,
         generate_subscripts({TOKS}, 1) - 1 AS pos
  FROM dirty),
lagged AS (
  SELECT doc_id, pos, tok,
         lag(tok, 3) OVER w AS t3, lag(tok, 2) OVER w AS t2,
         lag(tok, 1) OVER w AS t1
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
fl AS (
  SELECT doc_id, pos, tok,
         CASE WHEN pos >= 3 AND {md5_long_sql(_GRAM)} % {CDC_MOD} = 0
              THEN 1 ELSE 0 END AS flag
  FROM lagged),
ch AS (
  SELECT doc_id, pos, tok,
         coalesce(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_id
  FROM fl),
chunks AS (
  SELECT doc_id, chunk_id, string_agg(tok, ' ' ORDER BY pos) AS chunk_text
  FROM ch GROUP BY 1, 2),
hashed AS (SELECT *, md5(chunk_text) AS h FROM chunks),
dfreq AS (SELECT h, count(DISTINCT doc_id) AS df FROM hashed GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM dirty),
tagged AS (
  SELECT c.doc_id, c.chunk_id, c.chunk_text,
         CASE WHEN f.df >= greatest({BOILER_MIN_DF},
                                    floor(n_docs / {BOILER_FRACTION_DIV}))
              THEN 1 ELSE 0 END AS boiler
  FROM hashed c JOIN dfreq f USING (h) CROSS JOIN nd)
SELECT doc_id, count(*) AS n_chunks, sum(boiler)::BIGINT AS n_boiler,
       md5(coalesce(string_agg(CASE WHEN boiler = 0 THEN chunk_text END,
                               ' ' ORDER BY chunk_id), '')) AS cleaned_md5
FROM tagged GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# deterministic weighted sampling (A-ES / Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

SAMPLE_K = 20
_TWO60 = float(1 << 60)


def q_corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=20, weight = n_chars —
    the Efraimidis-Spirakis A-ES scheme (key = ln(u)/w, keep the k
    largest keys), with u derived from md5(doc_id) instead of RNG state
    so every engine/run draws the SAME sample. u = (h+1)/2^60 ∈ (0, 1]
    (h is the 60-bit md5 integer; the /2^60 is a power-of-two division —
    EXACT in binary floating point), and ln(u)/w is evaluated by the
    identical expression in both engines. Plans as TakeOrderedAndProject
    (per-partition heads merged on the driver), not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    u = (md5_long(F.col("doc_id").cast("string")) + 1).cast("double") / F.lit(_TWO60)
    key_nano = F.floor(
        F.log(u) / F.col("n_chars").cast("double") * F.lit(1e9)
    ).cast("long")
    return (
        docs.select("doc_id", F.col("n_chars").alias("weight"),
                    key_nano.alias("key_nano"))
        .orderBy(F.col("key_nano").desc(), F.col("doc_id"))
        .limit(SAMPLE_K)
    )


SQL_CORPUS_WEIGHTED_SAMPLE = f"""
SELECT doc_id, n_chars AS weight,
       floor(ln((({md5_long_sql('doc_id::VARCHAR')}) + 1)::DOUBLE
                / 1152921504606846976.0)
             / n_chars::DOUBLE * 1000000000.0)::BIGINT AS key_nano
FROM documents
ORDER BY key_nano DESC, doc_id
LIMIT {SAMPLE_K}
"""

# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

K_ANON = 10


def q_pii_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a corpus ships: group sizes over the
    quasi-identifier pair (nation, market segment) — any group smaller
    than k=10 re-identifies its members (Sweeney's k-anonymity). One
    map-side-combined agg; the violating share is what a release gate
    would check."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn(
            "is_violating", (F.col("group_size") < K_ANON).cast("int")
        )
    )


SQL_PII_K_ANONYMITY = f"""
SELECT c_nationkey, c_mktsegment, count(*) AS group_size,
       (count(*) < {K_ANON})::INT AS is_violating
FROM customer GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# product quantization: ADC top-k + recall harness
# ---------------------------------------------------------------------------

_PQ_M = 4        # subspaces (64 dims -> 16 per subspace)
_PQ_K = 4        # codes per subspace
_PQ_ITER = 2     # Lloyd iterations per codebook
_PQ_SUBLEN = 16
_PQ_TOPK = 5
_N_QUERIES = 10


def _pq_books(spark: SparkSession, sf_dir: str):
    from dataplatform_cdc_pipeline_spark.operators.pq import pq_fit

    emb = load_table(spark, sf_dir, "embeddings")
    return emb, pq_fit(emb, m=_PQ_M, k=_PQ_K, n_iter=_PQ_ITER)


def q_embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN end to end (operators/pq.py): m=4
    per-subspace codebooks learned by the exact integer k-means, corpus
    encoded to 4 small codes per vector (one scan, zero shuffles), and
    top-5 per query by exact-integer ADC distance. Everything downstream
    of the floor-stable codebook fit is BIGINT — hash-oracle-checked."""
    from dataplatform_cdc_pipeline_spark.operators.pq import pq_topk

    emb, books = _pq_books(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return pq_topk(emb, queries, books, k=_PQ_TOPK)


# Shared PQ CTE chain: the kmeans chain of SQL_EMBEDDING_KMEANS
# (queries_llm.py) generalized with a subspace column — one grouped
# Lloyd recursion covers all m codebooks at once.
_PQ_CTES = f"""pts AS (
  SELECT vec_id, pos - 1 AS pos,
         CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS xi
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos FROM embeddings)),
sp AS (SELECT vec_id, pos // {_PQ_SUBLEN} AS sub, pos % {_PQ_SUBLEN} AS spos, xi
       FROM pts),
seeds AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             AS cluster
    FROM embeddings) WHERE cluster < {_PQ_K}),
c0 AS (SELECT s.cluster, p.sub, p.spos, p.xi AS m
       FROM seeds s JOIN sp p USING (vec_id)),
d1 AS (SELECT p.vec_id, p.sub, c.cluster, SUM((p.xi - c.m) * (p.xi - c.m)) AS d
       FROM sp p JOIN c0 c ON p.sub = c.sub AND p.spos = c.spos
       GROUP BY 1, 2, 3),
a1 AS (SELECT vec_id, sub, cluster FROM (
         SELECT vec_id, sub, cluster,
                row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cluster)
                  AS rk FROM d1) WHERE rk = 1),
c1 AS (SELECT a.sub, a.cluster, p.spos,
              CAST(floor(SUM(p.xi) / COUNT(*)) AS BIGINT) AS m
       FROM sp p JOIN a1 a ON p.vec_id = a.vec_id AND p.sub = a.sub
       GROUP BY 1, 2, 3),
d2 AS (SELECT p.vec_id, p.sub, c.cluster, SUM((p.xi - c.m) * (p.xi - c.m)) AS d
       FROM sp p JOIN c1 c ON p.sub = c.sub AND p.spos = c.spos
       GROUP BY 1, 2, 3),
a2 AS (SELECT vec_id, sub, cluster FROM (
         SELECT vec_id, sub, cluster,
                row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cluster)
                  AS rk FROM d2) WHERE rk = 1),
c2 AS (SELECT a.sub, a.cluster, p.spos,
              CAST(floor(SUM(p.xi) / COUNT(*)) AS BIGINT) AS m
       FROM sp p JOIN a2 a ON p.vec_id = a.vec_id AND p.sub = a.sub
       GROUP BY 1, 2, 3),
d3 AS (SELECT p.vec_id, p.sub, c.cluster, SUM((p.xi - c.m) * (p.xi - c.m)) AS d
       FROM sp p JOIN c2 c ON p.sub = c.sub AND p.spos = c.spos
       GROUP BY 1, 2, 3),
codes AS (SELECT vec_id, sub, cluster AS code FROM (
            SELECT vec_id, sub, cluster,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d, cluster) AS rk
            FROM d3) WHERE rk = 1),
qsp AS (SELECT * FROM sp WHERE vec_id < {_N_QUERIES}),
dtab AS (SELECT q.vec_id AS query_id, c.sub, c.cluster AS code,
                SUM((q.xi - c.m) * (q.xi - c.m)) AS d
         FROM qsp q JOIN c2 c ON q.sub = c.sub AND q.spos = c.spos
         GROUP BY 1, 2, 3),
adc AS (SELECT t.query_id, k.vec_id AS nbr_id,
               CAST(SUM(t.d) AS BIGINT) AS adc_dist2
        FROM codes k JOIN dtab t ON k.sub = t.sub AND k.code = t.code
        WHERE k.vec_id != t.query_id GROUP BY 1, 2),
pq5 AS (SELECT query_id, rk, nbr_id, adc_dist2 FROM (
          SELECT query_id, nbr_id, adc_dist2,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_dist2, nbr_id) AS rk
          FROM adc) WHERE rk <= {_PQ_TOPK})"""

SQL_EMBEDDING_PQ_TOPK = f"""
WITH {_PQ_CTES}
SELECT query_id, rk, nbr_id, adc_dist2 FROM pq5
"""


def q_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of PQ/ADC against the EXACT integer-L2 ground truth —
    the compression/recall trade-off is PQ's actual tuning interface.
    Both rankings are exact-integer, so the whole harness is
    hash-oracle-checked; recall is reported in exact ppm."""
    from dataplatform_cdc_pipeline_spark.operators.clustering import quantized_points
    from dataplatform_cdc_pipeline_spark.operators.pq import pq_topk

    emb, books = _pq_books(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    pq5 = pq_topk(emb, queries, books, k=_PQ_TOPK).select("query_id", "nbr_id")

    pts = quantized_points(emb)
    qp = quantized_points(queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact5 = (
        pts.join(F.broadcast(qp), pts["vec_id"] != qp["query_id"])
        .select("query_id", "vec_id", dist2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select("query_id", F.col("vec_id").alias("nbr_id"))
    )
    hits = (
        exact5.join(pq5, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = exact5.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (F.floor(
                F.coalesce(F.col("n_hit"), F.lit(0)) * F.lit(1_000_000)
                / F.col("n_exact")
            )).cast("long").alias("recall_ppm"),
        )
    )


SQL_PQ_RECALL_EVAL = f"""
WITH {_PQ_CTES},
ed AS (SELECT q.vec_id AS query_id, p.vec_id AS nbr_id,
              SUM((q.xi - p.xi) * (q.xi - p.xi)) AS d2
       FROM pts p JOIN pts q ON q.vec_id < {_N_QUERIES}
                            AND q.vec_id != p.vec_id AND q.pos = p.pos
       GROUP BY 1, 2),
e5 AS (SELECT query_id, nbr_id FROM (
         SELECT query_id, nbr_id,
                row_number() OVER (PARTITION BY query_id ORDER BY d2, nbr_id)
                  AS rk FROM ed) WHERE rk <= {_PQ_TOPK}),
nh AS (SELECT e5.query_id, count(*) AS n_hit
       FROM e5 JOIN pq5 ON e5.query_id = pq5.query_id AND e5.nbr_id = pq5.nbr_id
       GROUP BY 1),
ne AS (SELECT query_id, count(*) AS n_exact FROM e5 GROUP BY 1)
SELECT ne.query_id, ne.n_exact, coalesce(nh.n_hit, 0) AS n_hit,
       floor(coalesce(nh.n_hit, 0) * 1000000 / ne.n_exact)::BIGINT AS recall_ppm
FROM ne LEFT JOIN nh ON ne.query_id = nh.query_id
"""

# ---------------------------------------------------------------------------
# PSI distribution drift
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_FOCUS = "click"


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check: the `value` distribution
    of one event class ('click') vs the rest, over 10 equal-width bins
    spanning the global [min, max]. Add-one smoothing keeps empty bins
    finite; the per-bin contribution (p−q)·ln(p/q) is floor-scaled nano.
    Shape: one stats agg (broadcast back), one binning pass, one
    map-side-combined groupBy — two corpus reads, no joins on data."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    binned = ev.crossJoin(F.broadcast(stats)).withColumn(
        "bin",
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * F.lit(float(_PSI_BINS))
            ),
        ).cast("int"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(
            F.when(F.col("event_type") == _PSI_FOCUS, 1).otherwise(0)
        ).alias("c_p"),
        F.sum(
            F.when(F.col("event_type") != _PSI_FOCUS, 1).otherwise(0)
        ).alias("c_q"),
    )
    totals = counts.agg(
        F.sum("c_p").alias("n_p"), F.sum("c_q").alias("n_q")
    )
    p = (F.col("c_p") + 1).cast("double") / (
        F.col("n_p") + _PSI_BINS
    ).cast("double")
    q = (F.col("c_q") + 1).cast("double") / (
        F.col("n_q") + _PSI_BINS
    ).cast("double")
    return counts.crossJoin(F.broadcast(totals)).select(
        "bin",
        "c_p",
        "c_q",
        F.floor((p - q) * F.log(p / q) * F.lit(1e9)).cast("long").alias("psi_nano"),
    )


SQL_EVENTS_PSI_DRIFT = f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
st AS (SELECT min(value) AS vmin, max(value) AS vmax FROM ev),
binned AS (
  SELECT event_type,
         least({_PSI_BINS - 1},
               floor((value - vmin) / (vmax - vmin) * {float(_PSI_BINS)}))::INT
           AS bin
  FROM ev CROSS JOIN st),
counts AS (
  SELECT bin,
         sum(CASE WHEN event_type = '{_PSI_FOCUS}' THEN 1 ELSE 0 END)::BIGINT AS c_p,
         sum(CASE WHEN event_type != '{_PSI_FOCUS}' THEN 1 ELSE 0 END)::BIGINT AS c_q
  FROM binned GROUP BY bin),
tot AS (SELECT sum(c_p)::BIGINT AS n_p, sum(c_q)::BIGINT AS n_q FROM counts)
SELECT bin, c_p, c_q,
       floor(((c_p + 1)::DOUBLE / (n_p + {_PSI_BINS})::DOUBLE
              - (c_q + 1)::DOUBLE / (n_q + {_PSI_BINS})::DOUBLE)
             * ln(((c_p + 1)::DOUBLE / (n_p + {_PSI_BINS})::DOUBLE)
                  / ((c_q + 1)::DOUBLE / (n_q + {_PSI_BINS})::DOUBLE))
             * 1000000000.0)::BIGINT AS psi_nano
FROM counts CROSS JOIN tot
"""

# ---------------------------------------------------------------------------
# seeded global shuffle -> training batches
# ---------------------------------------------------------------------------

_SHUFFLE_SEED = "shuffle42"
_BATCH_SIZE = 32


def q_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch shuffle for training: a SEEDED deterministic global order
    (md5(seed|doc_id) — rerunnable, no RNG state) and fixed-size batch
    ids. Uses the range-partition + driver prefix-sum formulation from
    q_doc_global_ids (queries_ext.py) — the oracle is the naive global
    row_number, which a 1000-executor cluster could not run."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.concat(F.lit(_SHUFFLE_SEED + "|"),
                                 F.col("doc_id").cast("string"))).alias("skey")
    )
    parts = docs.repartitionByRange(8, F.col("skey"), F.col("doc_id")).withColumn(
        "__pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint(eager=True)  # pin partitioning across passes
    counts = parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["n"]
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "__pid int, __offset long"
    )
    w = Window.partitionBy("__pid").orderBy("skey", "doc_id")
    return (
        parts.join(F.broadcast(off_df), "__pid")
        .withColumn("global_idx", F.col("__offset") + F.row_number().over(w))
        .select(
            "doc_id",
            "global_idx",
            ((F.col("global_idx") - 1) / _BATCH_SIZE).cast("long").alias("batch_id"),
        )
    )


SQL_TRAINING_BATCHES = f"""
WITH s AS (
  SELECT doc_id, md5('{_SHUFFLE_SEED}|' || doc_id::VARCHAR) AS skey
  FROM documents),
r AS (SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) AS global_idx
      FROM s)
SELECT doc_id, global_idx, (global_idx - 1) // {_BATCH_SIZE} AS batch_id FROM r
"""

# ---------------------------------------------------------------------------
# TF-IDF keywords
# ---------------------------------------------------------------------------

_TFIDF_TOPK = 3


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword/feature
    extractor (idf = ln((N+1)/(df+1)) + 1, sklearn's smoothed form).
    One explode feeds the (doc, term) tf agg; df is a term-keyed agg of
    that (map-side combined); N rides a broadcast 1-row frame. The
    double score ranks; the REPORTED score is floor-scaled micro."""
    docs = load_table(spark, sf_dir, "documents")
    from dataplatform_cdc_pipeline_spark.operators.text_analysis import tokens_expr

    toks = docs.select("doc_id", F.explode(tokens_expr("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log(
        (F.col("n_docs") + 1).cast("double") / (F.col("df") + 1).cast("double")
    ) + F.lit(1.0)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf").cast("double") * idf)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TFIDF_TOPK)
        .select(
            "doc_id", "rk", "term",
            F.floor(F.col("score") * F.lit(1e6)).cast("long").alias("score_micro"),
        )
    )


SQL_TFIDF_KEYWORDS = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf::DOUBLE * (ln((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE) + 1.0)
           AS score
  FROM tf JOIN df USING (term) CROSS JOIN n)
SELECT doc_id, rk, term, floor(score * 1000000.0)::BIGINT AS score_micro
FROM (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rk
      FROM scored)
WHERE rk <= {_TFIDF_TOPK}
"""

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

PREP_QUERIES = {
    "boilerplate_strip": q_boilerplate_strip,
    "corpus_weighted_sample": q_corpus_weighted_sample,
    "pii_k_anonymity": q_pii_k_anonymity,
    "embedding_pq_topk": q_embedding_pq_topk,
    "pq_recall_eval": q_pq_recall_eval,
    "events_psi_drift": q_events_psi_drift,
    "training_batches": q_training_batches,
    "tfidf_keywords": q_tfidf_keywords,
}

PREP_ORACLES = {
    "boilerplate_strip": SQL_BOILERPLATE_STRIP,
    "corpus_weighted_sample": SQL_CORPUS_WEIGHTED_SAMPLE,
    "pii_k_anonymity": SQL_PII_K_ANONYMITY,
    "embedding_pq_topk": SQL_EMBEDDING_PQ_TOPK,
    "pq_recall_eval": SQL_PQ_RECALL_EVAL,
    "events_psi_drift": SQL_EVENTS_PSI_DRIFT,
    "training_batches": SQL_TRAINING_BATCHES,
    "tfidf_keywords": SQL_TFIDF_KEYWORDS,
}
