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
