"""Corpus-curation operators, part 2: PII redaction, quality-filter
funnels, deterministic train/val/test splits, and domain-mix rebalancing —
the remaining selection/cleanup layer of a training-data pipeline
(beyond-reference surface, same program as operators/corpus.py).

Scale design:
- **PII redaction** is pure ``regexp_replace``/``regexp_extract_all``
  Column work: JVM-side, codegen-able, scan-speed on a 100 TB corpus, no
  shuffle at all.
- **Quality funnel** is ONE map-side-combined aggregation over boolean
  flags (a single 1-row shuffle), then a constant-width unpivot; rule
  evaluation stays in integer arithmetic so any engine reproduces it.
- **Split assignment** is a pure Column filter (MD5-slot arithmetic, no
  RNG state) — the split is a FUNCTION of the id, reproducible across
  engines, runs, and cluster sizes.
- **Domain-mix planning** aggregates per-source token totals (tiny,
  dimension-sized result) and derives per-source keep rates with integer
  ppm arithmetic; the APPLY step broadcast-joins the plan back to the
  corpus — no skew, no wide shuffle of document rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long
from dataplatform_cdc_pipeline_spark.operators.text_analysis import tokens_expr

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: Patterns expressible identically in Java regex (Spark) and RE2 (DuckDB).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def synthesize_pii_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministically augment a clean corpus with PII-shaped spans (the
    driver's synthetic documents contain none): every 3rd doc gains an
    email, every 5th a phone number — both derived from the id, so the
    oracle can rebuild the exact same dirty corpus."""
    c = F.col(id_col)
    email = F.concat(F.lit(" contact user"), c.cast("string"), F.lit("@example.com"))
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad(F.pmod(c, F.lit(1000)).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod(c * 7, F.lit(10000)).cast("string"), 4, "0"),
    )
    dirty = F.concat(
        F.col(text_col),
        F.when(c % 3 == 0, email).otherwise(F.lit("")),
        F.when(c % 5 == 0, phone).otherwise(F.lit("")),
    )
    return df.withColumn("dirty_text", dirty)


def redact_pii(
    df: DataFrame, text_col: str = "dirty_text", out_col: str = "redacted_text"
) -> DataFrame:
    """Scrub email/phone spans to typed placeholders and count what was
    removed. Spark's ``regexp_replace`` replaces ALL occurrences (DuckDB
    needs the explicit ``'g'`` flag — see the oracle)."""
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(c, EMAIL_PATTERN, "[EMAIL]"), PHONE_PATTERN, "[PHONE]"
    )
    return (
        df.withColumn("n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0)))
        .withColumn("n_phones", F.size(F.regexp_extract_all(c, F.lit(PHONE_PATTERN), 0)))
        .withColumn(out_col, redacted)
    )


# ---------------------------------------------------------------------------
# quality-filter funnel
# ---------------------------------------------------------------------------

#: rule name → integer-exact predicate builder over (toks, text) columns.
#: Integer forms avoid float division at rule boundaries: e.g.
#: rep_ratio = 1 - d/g <= 0.2  ⟺  5d >= 4g  exactly.
def _funnel_rules(text: Column) -> dict[str, Column]:
    from dataplatform_cdc_pipeline_spark.operators.text_dedup import shingles_expr

    toks = tokens_expr(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    sh = shingles_expr(text, 3)
    d, g = F.size(F.array_distinct(sh)), F.size(sh)
    from dataplatform_cdc_pipeline_spark.operators.text_analysis import (
        LANG_PROFILES,
        stopword_hits,
    )

    stop = stopword_hits(toks, LANG_PROFILES["en"])
    chars_sum = n_chars - n_tok + 1  # total token chars (ws-separated)
    return {
        "min_tokens": n_tok >= 20,
        "max_tokens": n_tok <= 1000,
        "avg_len_ok": (chars_sum >= 3 * n_tok) & (chars_sum <= 10 * n_tok),
        "low_repetition": 5 * d >= 4 * g,
        "stopword_ratio": 20 * stop >= n_tok,
    }


def quality_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/Gopher-style filter funnel: per-rule pass/fail counts plus the
    conjunction row — ONE aggregation job (map-side combine over boolean
    sums), then a constant-width unpivot of the 1-row result."""
    rules = _funnel_rules(F.col(text_col))
    aggs = [F.count(F.lit(1)).alias("total")]
    passed_all = F.lit(True)
    for name, pred in rules.items():
        aggs.append(F.sum(pred.cast("long")).alias(name))
        passed_all = passed_all & pred
    aggs.append(F.sum(passed_all.cast("long")).alias("all_rules"))
    one = df.agg(*aggs)
    entries = [
        F.struct(F.lit(name).alias("rule"), F.col(name).alias("n_pass"))
        for name in [*rules, "all_rules"]
    ]
    return one.select(
        F.col("total"), F.explode(F.array(*entries)).alias("e")
    ).select(
        "e.rule", "e.n_pass", (F.col("total") - F.col("e.n_pass")).alias("n_fail")
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------

SPLIT_BOUNDS = (("train", 90), ("val", 95), ("test", 100))


def assign_split(
    df: DataFrame, id_col: str = "doc_id", salt: str = "split"
) -> DataFrame:
    """MD5-slot split assignment (90/5/5): reproducible across engines and
    stable under corpus growth — a doc's split never changes when other
    docs are added, unlike percentile- or RNG-based splits."""
    slot = F.pmod(md5_long(F.col(id_col).cast("string"), salt), F.lit(100))
    expr = None
    for name, bound in SPLIT_BOUNDS:
        cond = slot < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split_slot", slot).withColumn("split", expr)


# ---------------------------------------------------------------------------
# domain-mix rebalancing
# ---------------------------------------------------------------------------

PPM = 1_000_000


def domain_mix_plan(
    df: DataFrame,
    weights_ppm: dict[str, int],
    default_ppm: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling plan hitting a target token mix: find the
    largest total budget T such that every source can supply its share
    (``T = min_s tokens_s * 1e6 / w_s``), then per-source
    ``keep_tokens = w_s * T / 1e6`` and ``rate_ppm = keep_tokens * 1e6 /
    tokens_s``. All integer (BIGINT) arithmetic — exact in any engine.

    The per-source aggregate is dimension-sized (one row per source), so
    the min-capacity scalar is a broadcast cross-join, not a global sort.
    At extreme scale (per-source token counts beyond ~9e12) the ppm
    products approach int64 range — switch the two multiplications to
    DECIMAL(38,0) there.
    """
    w = F.lit(default_ppm)
    for src, ppm in weights_ppm.items():
        w = F.when(F.col(source_col) == src, F.lit(ppm)).otherwise(w)
    per_source = (
        df.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens_expr(F.col(text_col)))).alias("tokens"),
        )
        .withColumn("w_ppm", w.cast("long"))
        # `div` = exact BIGINT division (DuckDB `//`): float division would
        # floor to the wrong side when the quotient lands on an integer
        .withColumn("cap", F.expr(f"(tokens * {PPM}) div w_ppm"))
    )
    budget = per_source.agg(F.min("cap").alias("budget_t"))
    return (
        per_source.crossJoin(F.broadcast(budget))
        .withColumn("keep_tokens", F.expr(f"(w_ppm * budget_t) div {PPM}"))
        .withColumn("rate_ppm", F.expr(f"(keep_tokens * {PPM}) div tokens"))
        .select(source_col, "n_docs", "tokens", "w_ppm", "keep_tokens", "rate_ppm")
    )


def domain_mix_apply(
    df: DataFrame,
    weights_ppm: dict[str, int],
    default_ppm: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Materialize the rebalanced corpus: broadcast the (tiny) plan onto
    the documents and keep rows whose MD5 slot clears the per-source rate.
    One scan + one broadcast join — document rows never shuffle."""
    plan = domain_mix_plan(df, weights_ppm, default_ppm, source_col, text_col)
    slot = F.pmod(md5_long(F.col(id_col).cast("string"), salt), F.lit(PPM))
    return (
        df.join(F.broadcast(plan.select(source_col, "rate_ppm")), source_col)
        .withColumn("mix_slot", slot)
        .filter(F.col("mix_slot") < F.col("rate_ppm"))
        .select(id_col, source_col, "mix_slot")
    )
