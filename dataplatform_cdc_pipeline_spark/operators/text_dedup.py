"""Document-deduplication operators: exact, n-gram Jaccard, MinHash-LSH,
SimHash — the dedup family of a large-scale training-data pipeline.

Scale design (the point of each at 100 TB):
- **exact**: one shuffle on the content hash (groupBy), map-side partial agg.
- **MinHash + LSH**: signatures are a narrow projection computed at scan
  speed; banding explodes each doc into `bands` rows (constant factor) and
  ONE shuffle on the band key finds all candidate pairs — never the O(n²)
  cross join. Candidate verification joins shingle sets only for the
  (tiny) candidate set.
- **SimHash**: 64-bit signature per doc; near-dup candidates via banded
  bit-slices (same LSH shuffle shape), verified by hamming distance —
  `bit_count(a XOR b)`, pure JVM.

All hashes are MD5-derived (functions/hashing.py) → engine-portable
(DuckDB oracle can replay them bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long

DEFAULT_MINHASH_K = 8
DEFAULT_BANDS = 4  # rows-per-band r = K / BANDS = 2
SIMHASH_BITS = 60  # width of the portable MD5-derived hashes
SIMHASH_BANDS = 4  # 15-bit slices


def shingles_expr(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of the lowercased, whitespace-split text.

    Documents shorter than n words yield a single shingle of all words,
    so every non-empty doc has at least one shingle.
    """
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(F.lower(F.trim(c)), r"\s+")
    sz = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(sz - F.lit(n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, n))
    )


def minhash_signature_expr(shingles: Column, k: int = DEFAULT_MINHASH_K) -> Column:
    """Array of k MinHash values: min over shingles of the salted 60-bit
    MD5 hash, one independent salt per hash family."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s, i=i: md5_long(s, f"mh{i}"))) for i in range(k)]
    )


def band_keys_expr(sig: Column, bands: int = DEFAULT_BANDS, k: int = DEFAULT_MINHASH_K) -> Column:
    """LSH band keys: the signature cut into `bands` slices, each slice
    concatenated into one string key."""
    r = k // bands
    return F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(str(b)),
                *[F.element_at(sig, b * r + j + 1).cast("string") for j in range(r)],
            )
            for b in range(bands)
        ]
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: every doc mapped to its group's
    canonical (minimum) id + group size. One hash-shuffle."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
    groups = h.groupBy("content_md5").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return h.join(groups, "content_md5").select(
        id_col, "content_md5", "canonical_id", "group_size"
    )


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_MINHASH_K,
    n: int = 3,
) -> DataFrame:
    """Attach shingle set + MinHash signature (narrow scan-speed projection)."""
    sh = shingles_expr(text_col, n)
    return df.select(
        F.col(id_col),
        F.array_distinct(sh).alias("shingle_set"),
        minhash_signature_expr(sh, k).alias("minhash_sig"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_MINHASH_K,
) -> DataFrame:
    """Candidate pairs (a < b) sharing at least one LSH band bucket.

    One explode (×bands) + one shuffle on the band key. The self-join is
    per-bucket, so cost is Σ bucket² — the LSH guarantee keeps buckets
    small for non-duplicate content.
    """
    exploded = sigs.select(
        F.col(id_col), F.explode(band_keys_expr(F.col("minhash_sig"), bands, k)).alias("band_key")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_expr(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct) shingle arrays."""
    inter = F.size(F.array_intersect(set_a, set_b)).cast("double")
    union = F.size(F.array_union(set_a, set_b)).cast("double")
    return inter / union


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
) -> DataFrame:
    """MinHash→LSH→verify: near-duplicate pairs with exact Jaccard ≥
    threshold. The full dedup pipeline: signature scan → banded shuffle →
    candidate join → shingle-set verification of candidates only."""
    sigs = with_minhash(df, text_col, id_col, k, n)
    cands = lsh_candidate_pairs(sigs, id_col, bands, k)
    sets_ = sigs.select(F.col(id_col), F.col("shingle_set"))
    joined = (
        cands.join(sets_.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingle_set", "set_a"), "id_a")
        .join(sets_.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingle_set", "set_b"), "id_b")
    )
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(jaccard_expr(F.col("set_a"), F.col("set_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_expr(text: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """60-bit SimHash over word tokens, single pass.

    bit_j(simhash) = 1 iff Σ_tokens (±1 by bit j of the token hash) > 0.
    One fold over the token array maintains all 60 counters at once
    (array accumulator), so each token is hashed exactly once — vs the
    naive 60-aggregates formulation that rehashes per bit.
    """
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(F.lower(F.trim(c)), r"\s+")
    hashes = F.transform(words, lambda w: md5_long(w))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for j in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(F.element_at(counts, j + 1) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        ).cast("long")
    return out


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    # two-stage select: materialize the counter array once, then assemble
    # bits from it — keeps the token fold from re-evaluating per bit term
    c = F.col(text_col)
    words = F.split(F.lower(F.trim(c)), r"\s+")
    hashes = F.transform(words, lambda w: md5_long(w))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for j in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    staged = df.select(F.col(id_col), counts.alias("__counts"))
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(F.element_at("__counts", j + 1) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        ).cast("long")
    return staged.select(F.col(id_col), out.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Near-dup pairs by SimHash: banded bit-slices generate candidates
    (a pair within hamming ≤ bands-1 must share ≥1 identical slice),
    verified with bit_count(a XOR b) ≤ max_hamming."""
    sh = simhash64(df, text_col, id_col, bits)
    width = bits // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.concat_ws(
                "_", F.lit(str(b)), F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).cast("string")
            )
            for b in range(bands)
        ]
    )
    exploded = sh.select(F.col(id_col), F.col("simhash"), F.explode(slices).alias("slice_key"))
    a, b = exploded.alias("a"), exploded.alias("b")
    cands = (
        a.join(b, (F.col("a.slice_key") == F.col("b.slice_key")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return cands.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
