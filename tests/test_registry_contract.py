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


def test_r7_driver_window_is_pinned():
    """The first 50 registry entries ARE the r7 correctness window the
    rotation-by-staleness plan schedules — an accidental reorder (e.g.
    inserting a new query mid-list) would silently swap what the driver
    verifies. r7 = 13 pinned core + 37 FIRST-TIME rows (cdc_merge_dv,
    the two r7-new queries, then the 34 oldest never-verified)."""
    window = list(entrymod.queries())[:50]
    # 13 pinned §2 core entries lead
    assert window[:13] == [
        "cdc_window_scan", "cdc_dedup_latest", "cdc_cast_projection",
        "cdc_delete_survivorship", "cdc_merge_full", "cdc_merge_incremental",
        "cdc_merge_multi_pk", "cdc_merge_op_u", "cdc_merge_late_replay",
        "cdc_rowkey_timestamp", "cdc_watermark_stats", "cdc_bucket_pruned_read",
        "cdc_job_log",
    ]
    # slots 14-16: verdict-mandated picks (task 7 DV sink; tasks 3/5 new)
    assert window[13:16] == [
        "cdc_merge_dv", "dedup_substring_bpe", "incremental_ivf_batch",
    ]
    # slots 17-50: the 34 oldest never-driver-verified (r6-late cohort)
    assert window[16:50] == [
        "events_scd2_join", "table_reconcile", "snapshot_reconcile",
        "dq_expectations", "volume_shipping", "product_type_profit",
        "returned_item_report", "customer_order_histogram",
        "supplier_part_variety", "exclusive_open_supplier", "events_funnel",
        "events_transitions", "events_outliers", "cdc_canal_ingest",
        "cdc_change_feed", "supplier_triangles", "part_skyline",
        "events_grouping_sets", "stream_scd2_enrich",
        "jsonl_documents_ingest", "csv_documents_ingest",
        "events_retention_cohorts", "asof_next_error", "unshipped_priority",
        "forecast_revenue", "important_parts", "order_window_suite",
        "cdc_txn_audit", "stream_txn_merge", "lsh_recall_eval",
        "events_intervals_merged", "doc_global_ids", "cdc_tagged_read",
        "cdc_merge_patch",
    ]
    assert len(window) == len(set(window)) == 50


def test_r8_flank_rotation_is_queued():
    """Verdict task 2: the six aging §2-adjacent flank rows (last
    driver-green r4) must head the r8 window plan — positions 51-56."""
    tail = list(entrymod.queries())[50:56]
    assert tail == [
        "cdc_merge_late_guarded", "cdc_merge_multi_pk_guarded",
        "stream_merge_state", "cdc_dedup_latest_salted",
        "cdc_date_partitioned_read", "stream_user_totals",
    ]


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
