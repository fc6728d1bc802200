"""Scalar (int8) quantization for embedding columns — the memory/IO
compression layer in front of ANN search.

At 100 TB an embedding corpus is usually the single biggest table; a
float32 64-dim vector is 256 bytes/row while an int8 code is 64. The
standard serving layout (FAISS `SQ8`, ScaNN's scalar path) stores the
codes and scores queries ASYMMETRICALLY: the query stays full-precision,
corpus vectors are dequantized on the fly (equivalently: an integer dot
of codes with the raw query, scaled per dimension). We implement exactly
that shape:

- **Scales are an index artifact**: per-dimension ``max(abs(x))`` over
  the corpus — d integers, collected once to the driver and inlined as a
  literal array in the scoring expression (same pattern as the k-means
  centroids in operators/clustering.py; MLlib ships model vectors in the
  task closure the same way). Building them is one posexplode + max agg
  — a single map-side-combining shuffle of ≤ d·partitions rows.
- **Exactness** (what makes this hash-oracle-able): coordinates are
  quantized to integer micro-units first (``round(x·1e6) -> bigint``,
  the clustering.py convention), the code is
  ``sign(m) · floor(|m|·127 / M_d)`` and the asymmetric score is an
  EXACT 64-bit integer dot ``Σ code_d · m_qd`` — no float accumulation
  anywhere, so Spark and DuckDB agree bit for bit. The single float op
  (that floor's division) cannot cross an integer boundary: if M_d
  divides |m|·127 the IEEE quotient is exact, otherwise the true
  quotient is ≥ 1/M_d away from an integer while the division error is
  ~1e-12 absolute at these magnitudes (|m|·127 < 2^31).
- **Scale shape**: scoring is corpus-scan × broadcast(queries) — zero
  shuffles up to the per-query top-k, whose window runs with a
  WindowGroupLimit partial top-k before the exchange (same plan shape as
  dedup-latest, pinned there by test_plan_quality).

Reference parity: the reference has no vector surface — beyond-reference
operator for the LLM-data pipeline (SURVEY.md §2's "similarity search"
family; the scale path next to similarity.py's LSH and IVF indexes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.clustering import quantized_points

SQ8_MAX = 127  # int8 symmetric range


def scales_from_rows(rows) -> list[int]:
    """Dense per-dimension scale list from (pos, mx) rows — the shared
    assembly for every reader/builder of the SQ8 scale artifact
    (sq8_scales, the IVF index's bootstrap and scales())."""
    scales = [0] * (max(r["pos"] for r in rows) + 1)
    for r in rows:
        scales[r["pos"]] = int(r["mx"])
    return scales


def sq8_scales(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[int]:
    """Per-dimension quantization scale: max(|micros|) over the corpus.

    Returns a Python list of d ints (an index artifact — build once,
    persist next to the corpus, broadcast into every probe). Dimensions
    that are identically zero get scale 0 and quantize to code 0.
    """
    rows = (
        quantized_points(embeddings, id_col, vec_col)
        .select(F.posexplode("v").alias("pos", "m"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("m"))).alias("mx"))
        .collect()
    )
    if not rows:
        raise ValueError("sq8_scales: empty corpus")
    return scales_from_rows(rows)


def _scales_lit(scales: list[int]):
    return F.array(*[F.lit(int(s)).cast("long") for s in scales])


def sq8_code_expr(vec_col, scales: list[int]):
    """SQ8 code array as ONE row expression over a raw embedding column:
    code_d = sign(m_d) · floor(|m_d|·127 / M_d); 0 where M_d = 0 — the
    exact ``sq8_codes`` arithmetic, exposed as an expression so callers
    can fuse encoding with other projections in a single scan (the
    incremental IVF index's add path does)."""
    from dataplatform_cdc_pipeline_spark.operators.clustering import (
        micro_units_expr,
    )

    v = micro_units_expr(vec_col)
    return F.zip_with(
        v,
        _scales_lit(scales),
        lambda m, s: F.when(s == F.lit(0), F.lit(0).cast("long")).otherwise(
            F.when(m < 0, F.lit(-1).cast("long")).otherwise(F.lit(1).cast("long"))
            * F.floor(F.abs(m).cast("double") * F.lit(float(SQ8_MAX)) / s.cast("double")).cast(
                "long"
            )
        ),
    )


def sq8_codes(
    embeddings: DataFrame,
    scales: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes: array<long> in [-127, 127]).

    code_d = sign(m_d) · floor(|m_d|·127 / M_d); 0 where M_d = 0. Stored
    as long for arithmetic convenience — a physical sink would pack to
    int8/binary (the value range already fits).
    """
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        sq8_code_expr(vec_col, scales).alias("codes"),
    )


def ivf_sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_col: str = "label",
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scales: list[int] | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The production ANN stack composed (FAISS's ``IVF<n>,SQ8`` layout):
    a coarse quantizer routes each query to its ``nprobe`` nearest cells,
    and the probed cells are scored from int8 CODES, not raw vectors —
    the corpus is stored compressed AND only nprobe/cells of it is read.

    Routing stays full-precision (centroids are index metadata, tiny and
    broadcast — compressing them saves nothing); candidate scoring is the
    exact-integer asymmetric dot of :func:`sq8_topk`, so the whole
    composition remains hash-oracle-able. Returns
    (query_id, rk, nbr_id, score).
    """
    from pyspark.sql import Window

    from dataplatform_cdc_pipeline_spark.operators.similarity import (
        as_double_vec,
        dot_expr,
        ivf_centroids,
        norm_expr,
    )

    if scales is None:
        scales = sq8_scales(embeddings, id_col, vec_col)
    if centroids is None:
        centroids = ivf_centroids(embeddings, cell_col, vec_col)
    codes = sq8_codes(embeddings, scales, id_col, vec_col).select(
        F.col("vec_id").alias("nbr_id"), "codes"
    )
    cells = embeddings.select(
        F.col(id_col).alias("nbr_id"), F.col(cell_col).alias("cell")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("q_vec")
    ).withColumn("q_norm", norm_expr(F.col("q_vec")))
    routed = (
        qs.crossJoin(F.broadcast(centroids))
        .withColumn(
            "c_cos",
            dot_expr(F.col("q_vec"), F.col("centroid"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("c_cos").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "cell")
    )
    qm = quantized_points(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qm")
    )
    cand = cells.join(
        F.broadcast(routed), (cells.cell == routed.cell) & (F.col("query_id") != F.col("nbr_id"))
    ).select("query_id", "nbr_id")
    scored = (
        cand.join(codes, "nbr_id")
        .join(F.broadcast(qm), "query_id")
        .select(
            "query_id",
            "nbr_id",
            F.aggregate(
                F.zip_with(F.col("codes"), F.col("qm"), lambda c, q: c * q),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "nbr_id", "score")
    )


def sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scales: list[int] | None = None,
) -> DataFrame:
    """Asymmetric top-k over the quantized corpus: score(q, c) =
    Σ_d code_cd · m_qd (exact bigint). Queries broadcast; one corpus
    scan; per-query top-k window (partial top-k before the exchange).

    The score is a monotone surrogate for the dequantized dot product
    (code_cd/127·M_d ≈ m_cd up to per-dim scaling); ranking quality vs
    exact cosine is measured by the recall harness, not assumed.

    Returns (query_id, rk, nbr_id, score).
    """
    from pyspark.sql import Window

    if scales is None:
        scales = sq8_scales(embeddings, id_col, vec_col)
    codes = sq8_codes(embeddings, scales, id_col, vec_col).select(
        F.col("vec_id").alias("nbr_id"), "codes"
    )
    qm = quantized_points(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qm")
    )
    scored = codes.join(F.broadcast(qm), F.col("query_id") != F.col("nbr_id")).select(
        "query_id",
        "nbr_id",
        F.aggregate(
            F.zip_with(F.col("codes"), F.col("qm"), lambda c, q: c * q),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "nbr_id", "score")
    )
