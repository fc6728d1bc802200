"""Curation-layer operator tests: PII redaction, quality funnel,
split assignment, domain-mix rebalancing (operators/curation.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataplatform_cdc_pipeline_spark.operators.curation import (
    PPM,
    assign_split,
    domain_mix_apply,
    domain_mix_plan,
    quality_funnel,
    redact_pii,
    synthesize_pii_text,
)
from dataplatform_cdc_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_pii_redaction_removes_all_matches(spark, docs):
    out = redact_pii(synthesize_pii_text(docs))
    rows = out.select("doc_id", "n_emails", "n_phones", "redacted_text").collect()
    for r in rows:
        assert "@" not in r.redacted_text
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0)
        assert r.n_phones == (1 if r.doc_id % 5 == 0 else 0)
        if r.doc_id % 3 == 0:
            assert "[EMAIL]" in r.redacted_text
        if r.doc_id % 5 == 0:
            assert "[PHONE]" in r.redacted_text


def test_pii_redaction_is_noop_on_clean_text(spark, docs):
    out = redact_pii(docs.withColumn("dirty_text", F.col("text")))
    assert out.filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0)).count() == 0
    assert out.filter(F.col("redacted_text") != F.col("text")).count() == 0


def test_quality_funnel_consistency(spark, docs):
    total = docs.count()
    rows = {r.rule: r for r in quality_funnel(docs).collect()}
    assert set(rows) == {
        "min_tokens", "max_tokens", "avg_len_ok", "low_repetition",
        "stopword_ratio", "all_rules",
    }
    for r in rows.values():
        assert r.n_pass + r.n_fail == total
    # the conjunction can't pass more than any single rule
    assert rows["all_rules"].n_pass <= min(
        r.n_pass for name, r in rows.items() if name != "all_rules"
    )


def test_split_is_deterministic_and_exhaustive(spark, docs):
    a = assign_split(docs).select("doc_id", "split")
    b = assign_split(docs).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0
    counts = {r.split: r.cnt for r in a.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    total = docs.count()
    assert sum(counts.values()) == total
    # 90/5/5 within generous tolerance at small n
    assert counts["train"] > 0.75 * total
    assert 0 < counts.get("val", 0) < 0.15 * total
    assert 0 < counts.get("test", 0) < 0.15 * total


def test_split_stable_under_corpus_growth(spark, docs):
    """A doc's split must not change when the corpus grows."""
    subset = docs.filter(F.col("doc_id") < 50)
    full = {r.doc_id: r.split for r in assign_split(docs).collect()}
    small = {r.doc_id: r.split for r in assign_split(subset).collect()}
    for doc_id, split in small.items():
        assert full[doc_id] == split


def test_top_ngrams_counts_and_order(spark, docs):
    from dataplatform_cdc_pipeline_spark.operators.text_analysis import top_ngrams

    rows = top_ngrams(docs, n=2, k=10).collect()
    assert len(rows) == 10
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    # exact check against a driver-side recount
    texts = [r.text for r in docs.select("text").collect()]
    from collections import Counter

    c = Counter()
    for t in texts:
        w = t.strip().lower().split()
        grams = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)] if len(w) >= 2 else [" ".join(w)]
        c.update(grams)
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.gram, r.n_occurrences) for r in rows] == expected


def test_doc_frequency_idf(spark, docs):
    from dataplatform_cdc_pipeline_spark.operators.text_analysis import doc_frequency

    n = docs.count()
    for r in doc_frequency(docs, top=20).collect():
        assert 0 < r.df <= n
        assert r.idf_ppm == (n * 1_000_000) // r.df


def test_cross_corpus_finds_planted_dup(spark):
    from dataplatform_cdc_pipeline_spark.operators.corpus import cross_corpus_near_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [(i, base if i in (3, 40) else f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(30)))
            for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = docs.filter(F.col("doc_id") % 20 == 0)   # contains 40
    train = docs.filter(F.col("doc_id") % 20 != 0)   # contains 3
    out = cross_corpus_near_pairs(train, bench, threshold=0.5).collect()
    assert [(r.train_id, r.bench_id) for r in out] == [(3, 40)]
    assert out[0].jaccard == 1.0


WEIGHTS = {"src0": 150_000, "src1": 100_000}
DEFAULT = 41_666


def test_domain_mix_plan_feasible(spark, docs):
    plan = domain_mix_plan(docs, WEIGHTS, DEFAULT).collect()
    by_src = {r.source: r for r in plan}
    # every source can supply its keep_tokens, and the binding source is ~fully used
    for r in plan:
        assert 0 <= r.keep_tokens <= r.tokens
        assert 0 <= r.rate_ppm <= PPM
    # realized mix approximates the target: keep_tokens ratio tracks w_ppm ratio
    s0, s2 = by_src["src0"], by_src["src2"]
    realized = s0.keep_tokens / max(s2.keep_tokens, 1)
    target = s0.w_ppm / s2.w_ppm
    assert abs(realized - target) / target < 0.01


def test_domain_mix_apply_subset_and_rate(spark, docs):
    kept = domain_mix_apply(docs, WEIGHTS, DEFAULT)
    plan = {r.source: r for r in domain_mix_plan(docs, WEIGHTS, DEFAULT).collect()}
    counts = {r.source: r.cnt for r in kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    totals = {r.source: r.cnt for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    for src, n_kept in counts.items():
        assert n_kept <= totals[src]
        # slots are uniform: kept fraction within wide (small-n) tolerance
        expected = totals[src] * plan[src].rate_ppm / PPM
        assert abs(n_kept - expected) <= max(10, 0.8 * expected)
