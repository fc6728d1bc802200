"""Exact-substring deduplication — the suffix-array dedup family
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") re-expressed as a shuffle-bounded relational computation.

MinHash/SimHash (text_dedup.py) answer "which DOCUMENTS are near-
duplicates"; this module answers the finer question that paper showed
matters for LM training: "which SPANS inside a document are verbatim
repeats of text elsewhere in the corpus". The reference engine has no
counterpart (its dedup is row-level, merge.sql's rn=1); this is part of
the beyond-reference training-data surface.

The suffix-array construction is inherently sequential, so the scalable
equivalent used here (and by RefinedWeb/SlimPajama-style pipelines) is
fixed-length window fingerprinting:

1. **window hashes** — every ``w``-token window of every doc gets an MD5
   fingerprint (one map-side explode; ~n_tokens rows per doc, no joins);
2. **duplicate windows** — fingerprints occurring ≥2 times corpus-wide
   (one hash-keyed groupBy with map-side combine — the ONLY global
   shuffle; within-doc repeats count, matching the paper's "any
   substring occurring twice" rule);
3. **maximal spans** — per doc, overlapping/adjacent duplicate windows
   merge into maximal covered intervals via a plain gaps-and-islands
   window (per-doc shuffle, linear state);
4. **span removal** — tokens inside any span drop; the survivor text is
   rebuilt in order. Matching windows never cross doc boundaries, so a
   span is always a well-formed token interval.

False-positive rate is MD5-collision (~2^-64 per window pair) — unlike
MinHash there is no similarity estimation here, a flagged window IS an
exact repeat modulo hash collision. At 100 TB the shuffle volume is one
(hash, doc, pos) row per token — the same order as the MinHash signature
shuffle — and the span/removal stages are per-doc window functions over
only the HIT rows (usually a small fraction of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: window length in tokens — the paper uses 50 BPE tokens at web scale;
#: the test corpus' docs are 30-160 whitespace tokens, so 8 keeps the
#: operator discriminating there (1015 duplicated windows at sf0.01).
#: For the paper-faithful BPE-space variant see ``bpe.bpe_tokens_expr``
#: composed through the ``tokens`` parameter below (w=50 BPE tokens).
DEFAULT_WINDOW = 8


def default_tokens():
    """The default tokenization (lowercased whitespace tokens). Every
    function below takes a ``tokens`` Column (array<string>, document
    order) so the same span machinery runs in ANY token space — the
    BPE-token composition uses ``bpe.bpe_tokens_expr`` here."""
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def window_hashes(docs: DataFrame, w: int = DEFAULT_WINDOW, tokens=None) -> DataFrame:
    """(doc_id, pos, h): MD5 of the ``w``-token window starting at
    0-based token position ``pos``. Docs shorter than ``w`` tokens emit
    no windows (nothing shorter can be an exact ``w``-repeat). One
    map-side explode — no shuffle."""
    toks = default_tokens() if tokens is None else tokens
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= w)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - w),
        lambda i: F.md5(F.array_join(F.slice("toks", i + 1, w), " ")),
    )
    return d.select("doc_id", F.posexplode(grams).alias("pos", "h"))


def duplicate_window_hits(
    docs: DataFrame, w: int = DEFAULT_WINDOW, tokens=None
) -> DataFrame:
    """(doc_id, pos) of windows whose fingerprint occurs ≥2 times
    corpus-wide — the paper's duplication predicate. One groupBy on the
    hash (map-side combined) + a semi-join back on the same key.

    The hash frame feeds BOTH legs, so it is materialized once (eager
    localCheckpoint — the persist-hygiene invariant): without it the
    tokenize+MD5 scan runs twice, which at 100 TB is the whole cost of
    the operator (same fix as bm25_search's tokenized projection)."""
    g = window_hashes(docs, w, tokens).localCheckpoint(eager=True)
    dup = (
        g.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("h")
    )
    return g.join(dup, "h", "left_semi").select("doc_id", "pos")


def contaminated_window_hits(
    docs: DataFrame, reference: DataFrame, w: int = DEFAULT_WINDOW
) -> DataFrame:
    """(doc_id, pos) of ``docs`` windows that appear VERBATIM anywhere in
    ``reference`` — the benchmark-decontamination predicate (the same
    exact-substring machinery pointed across corpora: Lee et al. 2022
    §4 applies it to strip eval-set text out of training data). One
    distinct over the reference's window hashes + one semi-join."""
    g = window_hashes(docs, w)
    ref = window_hashes(reference, w).select("h").distinct()
    return g.join(ref, "h", "left_semi").select("doc_id", "pos")


def spans_from_hits(hits: DataFrame, w: int = DEFAULT_WINDOW) -> DataFrame:
    """(doc_id, span_id, s, e): maximal token intervals [s, e]
    (inclusive, 0-based) — overlapping or touching hit windows merged by
    gaps-and-islands over the hit positions."""
    per_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + w - 1).over(
        per_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    with_id = hits.withColumn("span_id", F.sum(is_new).over(per_doc))
    return with_id.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + w - 1).alias("e")
    )


def duplicate_spans(docs: DataFrame, w: int = DEFAULT_WINDOW) -> DataFrame:
    """Maximal corpus-duplicated spans of every doc (see
    :func:`spans_from_hits`)."""
    return spans_from_hits(duplicate_window_hits(docs, w), w)


def strip_spans(
    docs: DataFrame, hits: DataFrame, w: int = DEFAULT_WINDOW, tokens=None
) -> DataFrame:
    """Per-doc span-removal report for an arbitrary hit set: token
    counts, covered-token counts, span count, dup ppm, and the text
    REBUILT from surviving tokens (lowercased — the dedup domain). Docs
    with no hit span pass through intact.

    The covered/uncovered decision avoids a position-range join: token
    rows and span rows union into one per-doc ordered stream, and a
    running max over span ends marks every token at or under the high-
    water mark as covered — linear per doc, no quadratic candidate set.
    """
    toks = default_tokens() if tokens is None else tokens
    tok_rows = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    ).select(
        "doc_id",
        "pos",
        "tok",
        F.lit(0).alias("is_span"),
        F.lit(None).cast("long").alias("end"),
    )
    span_rows = spans_from_hits(hits, w).select(
        "doc_id",
        F.col("s").alias("pos"),
        F.lit(None).cast("string").alias("tok"),
        F.lit(1).alias("is_span"),
        F.col("e").cast("long").alias("end"),
    )
    merged = tok_rows.unionByName(span_rows)
    # span rows sort BEFORE the token at the same position (is_span
    # desc), so a span starting at pos covers the token at pos
    ordered = Window.partitionBy("doc_id").orderBy(
        F.col("pos"), F.col("is_span").desc()
    )
    high_water = F.max("end").over(
        ordered.rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = merged.withColumn(
        "covered",
        (F.col("is_span") == 0)
        & high_water.isNotNull()
        & (high_water >= F.col("pos")),
    )
    is_tok = F.col("is_span") == 0
    kept = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(is_tok & ~F.col("covered"), F.struct("pos", "tok"))
                )
            ),
            lambda s: s["tok"],
        ),
        " ",
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum(is_tok.cast("long")).alias("n_tokens"),
            F.sum((is_tok & F.col("covered")).cast("long")).alias(
                "dup_tokens"
            ),
            F.sum(F.col("is_span").cast("long")).alias("n_spans"),
            kept.alias("kept_text"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "dup_tokens",
            "n_spans",
            F.floor(
                F.col("dup_tokens") * F.lit(1_000_000) / F.col("n_tokens")
            )
            .cast("long")
            .alias("dup_ppm"),
            "kept_text",
        )
    )


def strip_duplicate_spans(
    docs: DataFrame, w: int = DEFAULT_WINDOW, tokens=None
) -> DataFrame:
    """Corpus self-dedup: remove every span duplicated ≥2 times
    corpus-wide (see :func:`strip_spans`)."""
    return strip_spans(docs, duplicate_window_hits(docs, w, tokens), w, tokens)


def decontaminate_against(
    docs: DataFrame, reference: DataFrame, w: int = DEFAULT_WINDOW
) -> DataFrame:
    """Benchmark decontamination: remove from ``docs`` every span that
    appears verbatim in ``reference`` (the held-out eval set). Same
    report shape as :func:`strip_duplicate_spans`; span-level, so a
    training doc QUOTING an eval doc loses the quote, not the doc."""
    return strip_spans(docs, contaminated_window_hits(docs, reference, w), w)
