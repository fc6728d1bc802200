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


def test_r8_driver_window_is_pinned():
    """The first 50 registry entries ARE the r8 correctness window the
    rotation-by-staleness plan schedules — an accidental reorder (e.g.
    inserting a new query mid-list) would silently swap what the driver
    verifies. r8 (per the r7 verdict, task 1) = 13 pinned core + the 6
    aging §2 flank rows (all last driver-green r4) + the next 31
    never-driver-verified."""
    window = list(entrymod.queries())[:50]
    # 13 pinned §2 core entries lead
    assert window[:13] == [
        "cdc_window_scan", "cdc_dedup_latest", "cdc_cast_projection",
        "cdc_delete_survivorship", "cdc_merge_full", "cdc_merge_incremental",
        "cdc_merge_multi_pk", "cdc_merge_op_u", "cdc_merge_late_replay",
        "cdc_rowkey_timestamp", "cdc_watermark_stats", "cdc_bucket_pruned_read",
        "cdc_job_log",
    ]
    # slots 14-19: the 6 aging §2-adjacent flank rows (r4-green; verdict
    # requirement that every §2 row is driver-green within r5..r8)
    assert window[13:19] == [
        "cdc_merge_late_guarded", "cdc_merge_multi_pk_guarded",
        "stream_merge_state", "cdc_dedup_latest_salted",
        "cdc_date_partitioned_read", "stream_user_totals",
    ]
    # slots 20-50: the next 31 never-driver-verified (backlog 79 -> 48)
    assert window[19:50] == [
        "cdc_merge_soft_delete", "multimodal_packing",
        "events_growth_accounting", "events_bag_set_ops",
        "scalar_function_matrix", "stream_late_data_drop", "text_normalize",
        "langid_confusion", "corpus_dedup_funnel", "cdc_retention_sweep",
        "stream_outer_attribution", "events_hll_check",
        "events_hourly_profile", "cdc_metadata_count", "array_function_suite",
        "cdc_merge_wap", "stream_topk_per_type", "events_unpivot",
        "map_function_suite", "events_mad", "events_bfs_reach",
        "events_time_weighted", "basket_pair_lift", "kmv_set_ops",
        "feature_hashing", "cdc_multi_txn", "window_nav_suite",
        "revenue_share", "corpus_profile", "cdc_cached_read", "cdc_merge_dlq",
    ]
    assert len(window) == len(set(window)) == 50


def test_r9_window_is_queued():
    """The r9 window plan (next 37 never-verified) must head positions
    51+ so the drain schedule keeps walking mechanically."""
    tail = list(entrymod.queries())[50:56]
    assert tail == [
        "agg_function_matrix", "null_order_suite", "stream_dlq_merge",
        "events_percentile_check", "boilerplate_strip",
        "corpus_weighted_sample",
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
