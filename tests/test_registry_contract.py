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


def test_r9_driver_window_is_pinned():
    """The first 50 registry entries ARE the r9 correctness window the
    rotation-by-staleness plan schedules — an accidental reorder (e.g.
    inserting a new query mid-list) would silently swap what the driver
    verifies. r9 (per the r8 verdict, task 1) = 13 pinned core + the
    next 37 never-driver-verified (backlog 48 -> 11), exactly the cohort
    the r8 mid-round sweep pre-verified 37/37."""
    window = list(entrymod.queries())[:50]
    # 13 pinned §2 core entries lead
    assert window[:13] == [
        "cdc_window_scan", "cdc_dedup_latest", "cdc_cast_projection",
        "cdc_delete_survivorship", "cdc_merge_full", "cdc_merge_incremental",
        "cdc_merge_multi_pk", "cdc_merge_op_u", "cdc_merge_late_replay",
        "cdc_rowkey_timestamp", "cdc_watermark_stats", "cdc_bucket_pruned_read",
        "cdc_job_log",
    ]
    # slots 14-50: the next 37 never-driver-verified, oldest-first
    assert window[13:50] == [
        "agg_function_matrix", "null_order_suite", "stream_dlq_merge",
        "events_percentile_check", "boilerplate_strip",
        "corpus_weighted_sample", "pii_k_anonymity", "embedding_pq_topk",
        "pq_recall_eval", "events_psi_drift", "training_batches",
        "tfidf_keywords", "media_phash_dedup", "domain_temperature_sample",
        "hybrid_search_rrf", "hard_negatives", "phrase_search",
        "cdc_branch_merge", "events_hopping_windows", "pii_masked_read",
        "pii_l_diversity", "span_corruption", "stream_psi_drift",
        "cdc_clone_read", "regression_suite", "dim_truncation_recall",
        "cdc_erasure_txn", "events_ewma", "curation_uncertainty_sample",
        "cdc_table_history", "orders_cohort_ltv", "cluster_safe_split",
        "split_leakage_audit", "packing_efficiency_eval",
        "stream_sliding_counts", "text_ngram_novelty", "dup_ratio_by_source",
    ]
    assert len(window) == len(set(window)) == 50


def test_r10_window_is_queued():
    """The FULL r10 window plan must head positions 51-87 (r8 verdict
    task 7: the 26 stalest r4-green names are enumerated, not implied):
    the last 11 never-driver-verified + the 26 stalest r4-green rows, so
    after r10 every registry entry has a driver row and the oldest
    rotation green is refreshed."""
    tail = list(entrymod.queries())[50:87]
    assert tail == [
        # the last 11 never-driver-verified
        "quality_calibration", "text_zipf_fit", "session_window_overlap",
        "dedup_substring_spans", "orc_events_ingest",
        "incremental_dedup_batch", "stream_dedup_index",
        "decontamination_spans", "dedup_soft_weights", "stream_dv_merge",
        "substring_dup_profile",
        # the 26 stalest r4-green rotation names
        "embedding_ann_lsh", "multimodal_features", "quality_funnel",
        "pii_redaction", "corpus_split", "token_counts", "text_stats",
        "contamination_check", "corpus_sample", "revenue_by_nation",
        "text_langid", "doc_fingerprint", "embedding_ivf_nprobe2",
        "embedding_dup_clusters", "multimodal_frame_plan", "domain_mix_plan",
        "domain_mix_apply", "ngram_top_bigrams", "vocab_df_stats",
        "cross_corpus_dedup", "shipping_priority_mix", "promo_revenue",
        "large_volume_customer", "discounted_revenue", "sales_opportunity",
        "dedup_keep_best",
    ]


def test_registry_frozen_at_240():
    """r7 verdict task 7: the registry stays frozen at 240 entries until
    the never-driver-verified backlog is drained (scheduled r10)."""
    assert len(entrymod.queries()) == 240


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
