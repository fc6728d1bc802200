"""Content-defined chunking (CDC) and boilerplate stripping.

Fixed-offset chunking (doc_chunks' token windows) cannot align repeated
content that appears at DIFFERENT offsets across documents: a footer
starting at token 37 in one doc and token 52 in another lands in
different windows, so its chunks never hash-match. Content-defined
chunking (the rsync/LBFS trick; Muthitacharoen et al., SOSP 2001) puts
chunk boundaries where a rolling hash of the last W tokens hits a target
residue — boundaries depend only on LOCAL content, so identical token
runs produce identical interior chunks regardless of offset. This is the
primitive behind storage dedup and the CCNet/RefinedWeb-style repeated-
paragraph removal a 100 TB text pipeline needs.

Semantics:
- tokens = whitespace split of lower(trim(text)) (text_analysis.tokens_expr);
- a boundary closes the chunk at token i when i >= W-1 and
  md5_long(tokens[i-W+1..i] joined by ' ') % mod == 0 — the deterministic
  md5 primitive (functions/hashing.py), so any engine reproduces it;
- expected chunk length ≈ mod tokens; the final chunk ends at doc end.

Boilerplate strip: chunk every doc, count each chunk text's document
frequency, mark chunks whose df >= max(min_df, n_docs/50) as boilerplate
(the floor keeps tiny corpora from flagging everything; the fraction
keeps the threshold meaningful as the corpus grows), rebuild each doc
from its surviving chunks in order.

Scale shape: ONE posexplode per doc (per-doc window work for lags and
the boundary prefix-sum — same key as every other per-doc pass, no
skew beyond doc length); chunk df is a map-side-combined (hash) agg;
the boilerplate set comes back as a semi/anti-join on chunk hash (no
driver collect); rebuild is one (doc, chunk) agg. Nothing is quadratic
in doc length and nothing moves the corpus twice.

Reference parity: no counterpart — beyond-reference LLM-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long
from dataplatform_cdc_pipeline_spark.operators.text_analysis import tokens_expr

#: rolling-hash window (tokens) and boundary modulus (expected chunk len)
CDC_WINDOW = 4
CDC_MOD = 8

#: df threshold floor and corpus fraction divisor for boilerplate
BOILER_MIN_DF = 10
BOILER_FRACTION_DIV = 50


def cdc_chunk_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_toks) — content-defined chunks.

    chunk_id counts boundaries strictly BEFORE the token (prefix sum over
    a per-doc ordered window), so a boundary at token i makes i the last
    token of its chunk.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_expr(text_col)).alias("__pos", "__tok"),
    )
    per_doc = Window.partitionBy(id_col).orderBy("__pos")
    gram = F.concat_ws(
        " ",
        *[F.lag("__tok", j).over(per_doc) for j in range(CDC_WINDOW - 1, 0, -1)],
        F.col("__tok"),
    )
    flagged = toks.withColumn(
        "__flag",
        F.when(
            (F.col("__pos") >= CDC_WINDOW - 1)
            & (md5_long(gram) % CDC_MOD == 0),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    chunk_id = F.coalesce(
        F.sum("__flag").over(
            per_doc.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        flagged.withColumn("chunk_id", chunk_id)
        .groupBy(id_col, "chunk_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                    lambda s: s["__tok"],
                ),
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )


def boilerplate_strip(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_chunks, n_boiler, cleaned_md5) — drop high-df chunks,
    rebuild the doc from the survivors in order. Docs whose every chunk
    was boilerplate keep a row with cleaned_md5 = md5('')."""
    chunks = cdc_chunk_frame(df, text_col, id_col).withColumn(
        "__h", F.md5("chunk_text")  # df keyed by digest: the shuffle and
    )  # the join move 32-byte keys, not chunk bodies
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    dfreq = chunks.groupBy("__h").agg(
        F.count_distinct(id_col).alias("__df")
    )
    tagged = (
        chunks.join(dfreq, "__h")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "__boiler",
            (
                F.col("__df")
                >= F.greatest(
                    F.lit(BOILER_MIN_DF),
                    F.floor(F.col("n_docs") / BOILER_FRACTION_DIV),
                )
            ).cast("int"),
        )
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("__boiler").alias("n_boiler"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler") == 0,
                                F.struct("chunk_id", "chunk_text"),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
            )
        ).alias("cleaned_md5"),
    )
