"""Corpus keyword search: BM25 ranking as a pure relational plan.

Beyond-reference surface (the retrieval side of a training-data platform:
find documents matching curation/debug queries without an external search
engine). Okapi BM25 with the Robertson +1 idf:

    idf(t)      = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)
    score(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Scale shape: ONE tokenization pass over the corpus, reduced in the same
projection to (id, doc length, query-term matches) — a few ints + at most
|query| short strings per doc — and eagerly materialized, so the stats agg
and the tf/df legs read the tiny reduced frame instead of re-tokenizing
(two full passes at 100 TB otherwise). The explode runs over the
query-term matches only (the filter applied before the shuffle, so only
matching term rows exist at all), one groupBy (doc, term) with map-side
combine, document-frequency and corpus stats broadcast (≤ |query| rows +
one stats row). No UDFs — the whole plan is native Columns.

Cross-engine determinism: the score is per-row IEEE arithmetic summed over
≤ |query| terms, floor-scaled at 1e-6 (absolute float noise ~1e-15 — far
inside the grid); ranking ties broken by doc_id, and the top-k cut is
taken on the FLOORED score in both engines so the selected set is
identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.text_analysis import tokens_expr


def score_postings(
    tf: DataFrame,
    df_: DataFrame,
    stats: DataFrame,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 scoring tail shared by the from-scratch search and the
    incremental index (operators/bm25_index.py): rank ``tf`` rows
    (id, __term, __dl, __tf) against broadcast document frequencies
    (__term, __df) and corpus stats (__n_docs, __avgdl). Floor-scaled
    at 1e-6 with the top-k cut ON the floored score + id tiebreak so
    the selected set is engine-identical — and identical between the
    batch and incremental paths, which share this exact expression."""
    scored = tf.join(F.broadcast(df_), "__term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("__n_docs") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_d = F.col("__tf").cast("double")
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl")
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / norm
    per_doc = scored.groupBy(id_col).agg(F.sum(contrib).alias("__raw"))
    floored = per_doc.select(
        F.col(id_col),
        (F.floor(F.col("__raw") * F.lit(1_000_000.0)) / F.lit(1_000_000.0)).alias("bm25"),
    )
    return floored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(top_k)


def bm25_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms."""
    terms = list(query_terms)
    # ONE tokenization pass: the same projection computes doc length and
    # keeps only query-term occurrences (duplicates preserved for tf);
    # eager localCheckpoint (invariant 11 — not persist) materializes the
    # reduced frame both legs read. Size: one long + one int + the
    # matched terms per doc — negligible next to the corpus.
    base = (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.filter("__toks", lambda t: t.isin(terms)).alias("__qtoks"),
        )
        .localCheckpoint(eager=True)
    )

    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )
    qt = base.filter(F.size("__qtoks") > 0).select(
        F.col(id_col), F.col("__dl"), F.explode("__qtoks").alias("__term")
    )
    tf = qt.groupBy(id_col, "__term", "__dl").agg(F.count(F.lit(1)).alias("__tf"))
    df_ = qt.groupBy("__term").agg(F.count_distinct(F.col(id_col)).alias("__df"))

    return score_postings(tf, df_, stats, id_col=id_col, k1=k1, b=b, top_k=top_k)
