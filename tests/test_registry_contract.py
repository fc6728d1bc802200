"""Registry/driver-contract guards: the verification surface itself is
load-bearing (the driver gates the FIRST 50 registry entries; COVERAGE.md
maps operators to query names), so drift in either is a silent
correctness-gate hole. These tests pin the contracts."""

import os
import re

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle_and_vice_versa():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_r6_driver_window_is_pinned():
    """The first 50 registry entries ARE the r6 correctness window the
    rotation invariant was designed around — an accidental reorder (e.g.
    inserting a new query mid-list) would silently swap what the driver
    verifies. New queries slot in at 40+ (displacing an r4-green pick);
    everything else belongs in the tail until the next rotation."""
    window = list(entrymod.queries())[:50]
    # 13 pinned §2 core entries lead
    assert window[:13] == [
        "cdc_window_scan", "cdc_dedup_latest", "cdc_cast_projection",
        "cdc_delete_survivorship", "cdc_merge_full", "cdc_merge_incremental",
        "cdc_merge_multi_pk", "cdc_merge_op_u", "cdc_merge_late_replay",
        "cdc_rowkey_timestamp", "cdc_watermark_stats", "cdc_bucket_pruned_read",
        "cdc_job_log",
    ]
    # slots 14-39: the 26 r5-new entries getting their FIRST driver row
    assert window[13:39] == [
        "cdc_snapshot_merge", "cdc_time_travel_read", "cdc_snapshot_diff",
        "cdc_debezium_ingest", "stream_debezium_merge", "cdc_zorder_read",
        "cdc_ivm_minmax", "stream_ivm_totals",
        "embedding_ivf_learned", "embedding_sq8_topk", "sq8_recall_eval",
        "embedding_ivf_sq8", "ivf_sq8_recall_eval", "semantic_dedup",
        "dedup_containment", "interdoc_repetition", "bigram_perplexity",
        "bpe_learn", "bpe_encode",
        "events_cube", "events_distinct_sketch", "events_value_percentiles",
        "heavy_hitters_cms", "customer_pareto", "fuzzy_name_match",
        "stream_distinct_sketch",
    ]
    assert len(window) == len(set(window)) == 50


def test_coverage_doc_names_only_real_queries():
    """Every `backticked_name` in COVERAGE.md that looks like a registry
    query (matches a knowns-prefix vocabulary) must exist in queries() —
    stale doc references rot the judge's map."""
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    q = set(entrymod.queries())
    prefixes = (
        "cdc_", "dedup_", "embedding_", "text_", "doc_", "token_", "corpus_",
        "contamination_", "gopher_", "multimodal_", "training_", "stream_",
        "events_", "customer_", "asof_", "value_", "props_", "order_",
        "small_", "top_", "min_", "market_", "sessionize_", "pricing_",
        "revenue_", "shipping_", "promo_", "large_", "discounted_", "sales_",
        "pii_", "quality_", "domain_", "ngram_", "vocab_", "cross_", "bm25_",
        "unigram_", "bigram_", "ann_", "ivf_", "semantic_", "sq8_",
        "heavy_", "fuzzy_", "bpe_",
    )
    mentioned = {
        m
        for m in re.findall(r"`([a-z0-9_]+)`", text)
        if m.startswith(prefixes) and not m.endswith(("_py", "_md"))
    }
    # helper/function names also appear in backticks; only enforce the
    # ones that LOOK like query ids (contain no parens and are snake_case
    # words the registry could plausibly hold) AND are not module members
    non_queries = {
        "cdc_table", "cdc_start_ts", "cdc_end_ts", "text_analysis",
        "text_dedup", "doc_id", "value_micros", "stream_merge",
        "ivf_topk",  # operator function (similarity.ivf_topk), not a query
    }
    unknown = {m for m in mentioned if m not in q and m not in non_queries}
    # allow operator/file references like dedup_clusters (also a query) —
    # anything left must be a genuine stale reference
    assert not unknown, f"COVERAGE.md names unknown queries: {sorted(unknown)}"
