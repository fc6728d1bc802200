"""Registry/driver-contract guards: the verification surface itself is
load-bearing (the driver gates the FIRST 50 registry entries; COVERAGE.md
maps operators to query names), so drift in either is a silent
correctness-gate hole. These tests pin the contracts."""

import os
import re
import sys

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle_and_vice_versa():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


#: The 13 §2 CDC core queries lead EVERY driver window (re-verified
#: every round by construction).
CORE_13 = [
    "cdc_window_scan", "cdc_dedup_latest", "cdc_cast_projection",
    "cdc_delete_survivorship", "cdc_merge_full", "cdc_merge_incremental",
    "cdc_merge_multi_pk", "cdc_merge_op_u", "cdc_merge_late_replay",
    "cdc_rowkey_timestamp", "cdc_watermark_stats", "cdc_bucket_pruned_read",
    "cdc_job_log",
]


def test_r10_driver_window_is_pinned():
    """The first 50 registry entries ARE the r10 correctness window the
    rotation-by-staleness plan schedules — an accidental reorder (e.g.
    inserting a new query mid-list) would silently swap what the driver
    verifies. r10 (per the r9 verdict, task 1) = 13 pinned core + the
    LAST 11 never-driver-verified (backlog 11 -> 0) + the 26 stalest
    r4-green rotation names, exactly the cohort the r9 mid-round sweep
    pre-verified 37/37."""
    window = list(entrymod.queries())[:50]
    assert window[:13] == CORE_13
    # slots 14-24: the last 11 never-driver-verified, oldest-first
    assert window[13:24] == [
        "quality_calibration", "text_zipf_fit", "session_window_overlap",
        "dedup_substring_spans", "orc_events_ingest",
        "incremental_dedup_batch", "stream_dedup_index",
        "decontamination_spans", "dedup_soft_weights", "stream_dv_merge",
        "substring_dup_profile",
    ]
    # slots 25-50: the 26 stalest r4-green rotation names
    assert window[24:50] == [
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
    assert len(window) == len(set(window)) == 50


def test_r11_window_is_queued():
    """Post-drain steady-state rotation contract (r9 verdict task 5):
    from r11 on, every window = 13 pinned core + 37 stalest entries with
    never-driver-verified first. The r11 window is therefore the 3 r10
    promotions (the only never-verified entries once the r10 drain
    lands) followed by the 34 stalest greens — which must occupy
    positions 51-84 and the registry tail respectively, so the r11
    rotation is a mechanical splice: promote tail -> slots 14-16, shift
    51-84 -> slots 17-50."""
    q = list(entrymod.queries())
    # the 3 promotions sit at the registry tail, never driver-verified
    assert q[-3:] == [
        "ivf_refit_lifecycle", "txn_recover_torn", "dv_fold_crossover",
    ]
    # the 34 stalest greens (r4-green leftovers, list order) at 51-84
    assert q[50:84] == [
        "doc_chunks", "bm25_search", "unigram_perplexity",
        "ann_recall_eval", "cdc_ivm_type_counts", "cdc_ivm_sum",
        "cdc_schema_drift", "ivf_recall_curve", "embedding_kmeans",
        "dedup_minhash_lsh", "embedding_near_dup", "text_quality",
        "training_mix", "multimodal_resize", "sessionize_events",
        "pricing_summary", "gopher_repetition", "multimodal_audio_segments",
        "top_supplier", "min_cost_supplier", "market_share",
        "customer_value_deciles", "stream_session_windows",
        "stream_click_attribution", "stream_dedup_events", "events_rollup",
        "events_pivot", "customer_set_ops", "asof_prior_click",
        "value_band_join", "events_distinct_stats", "props_stats",
        "order_priority_check", "small_quantity_revenue",
    ]


def test_rotation_derivation_matches_pinned_windows():
    """scripts/rotation_plan.py derives windows from the CORRECTNESS
    history instead of transcribing them; the derivation must agree
    with BOTH hand-pinned contracts — the current r10 window (check
    mode, with the mid-round-promotion exception) and the enumerated
    r11 plan (next mode) — so a future rotation computed by the tool
    cannot silently diverge from the invariant these tests pin."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import rotation_plan

    priority = list(entrymod.queries())
    last = rotation_plan.last_green_rounds()
    # check mode: never-verified entries OUTSIDE the window are
    # same-round promotions (registry tail) and excluded by design
    pool = [n for i, n in enumerate(priority) if n in last or i < 50]
    assert rotation_plan.derive_window(pool, last) == priority[:50]
    # next mode: greening the current window must yield the pinned r11
    # splice exactly (promotions lead, then the 34 stalest greens)
    nxt = dict(last)
    bump = max(nxt.values(), default=0) + 1
    for n in priority[:50]:
        nxt[n] = bump
    assert rotation_plan.derive_window(priority, nxt) == (
        CORE_13
        + ["ivf_refit_lifecycle", "txn_recover_torn", "dv_fold_crossover"]
        + priority[50:84]
    )


def test_registry_is_243_after_r10_promotion():
    """The r7-r9 freeze held the registry at 240 until the
    never-driver-verified backlog drained (r10 window); the r9 verdict
    (task 2) then mandated exactly the three staged promotions — and
    nothing else — so the registry is now pinned at 243."""
    assert len(entrymod.queries()) == 243


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
