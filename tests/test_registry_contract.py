"""Registry/driver-contract guards: the verification surface itself is
load-bearing (the driver gates the FIRST 50 registry entries; COVERAGE.md
maps operators to query names), so drift in either is a silent
correctness-gate hole. These tests pin the contracts."""

import os
import re
import sys

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import rotation_plan


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


def test_r11_driver_window_is_pinned():
    """The first 50 registry entries ARE the r11 correctness window the
    rotation-by-staleness plan schedules — an accidental reorder (e.g.
    inserting a new query mid-list) would silently swap what the driver
    verifies. r11 (per the r10 verdict, task 2) = 13 pinned core + the
    3 r10 promotions (the only never-driver-verified entries after the
    r10 backlog drain — backlog 3 -> 0 once this window greens) + the
    34 stalest greens, exactly the splice rotation_plan.py --next
    derived from the r1-r10 history."""
    window = list(entrymod.queries())[:50]
    assert window[:13] == CORE_13
    # slots 14-16: the r10 promotions, never driver-verified, lead
    assert window[13:16] == [
        "ivf_refit_lifecycle", "txn_recover_torn", "dv_fold_crossover",
    ]
    # slots 17-50: the 34 stalest greens (r4-green leftovers, list order)
    assert window[16:50] == [
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
    assert len(window) == len(set(window)) == 50


def test_r12_window_is_queued():
    """Steady-state rotation: the r12 window = 13 pinned core + the two
    r11 promotions (the only never-driver-verified entries once the r11
    drain lands; registry tail) + the 35 stalest greens — which sit at
    positions 51-85, so the r12 rotation is again a mechanical splice.
    Pinned from rotation_plan.py --next output (r10 verdict task 6: the
    derivation tool is the source of truth for window planning)."""
    q = list(entrymod.queries())
    assert q[-2:] == ["incremental_bm25_batch", "stream_bm25_index"]
    expected_r12 = CORE_13 + q[-2:] + q[50:85]
    assert rotation_plan.plan_next(q, rotation_plan.correctness_records()) \
        == expected_r12
    # the 35 stalest greens r12 will refresh (r5/r6-green cohort head)
    assert q[50] == "stream_windowed_counts" and q[84] == "cdc_scd2_history"


def test_rotation_derivation_matches_pinned_window():
    """The check-mode derivation must agree with the pinned current
    window in BOTH history states a pinned window lives through (r10
    verdict task 1 — the old single-state check turned the suite red
    the moment the driver landed the round's own CORRECTNESS record):

    1. as planned: derivation over the full on-disk history;
    2. greened-not-yet-rotated: the driver lands round max+1 greening
       every window entry — check_current must still pass via its
       history-minus-newest branch (simulated with a synthetic record,
       so the test is state-independent of what the driver has or has
       not written this round)."""
    priority = list(entrymod.queries())
    records = rotation_plan.correctness_records()

    ok, which, _ = rotation_plan.check_current(priority, records)
    assert ok, which

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    mx = max(r for r, _ in records)
    post = records + [(mx + 1, {n: green for n in priority[:50]})]
    ok, which, _ = rotation_plan.check_current(priority, post)
    assert ok and f"minus r{mx + 1}" in which, which


def test_rotation_next_uses_one_shared_bump():
    """--next must assign ONE shared synthetic round to all 50
    just-greened entries (ties broken by registry order — the
    documented contract). The r10 implementation recomputed the max
    inside the bump loop, giving distinct rounds M+1..M+50 instead of
    one shared M+1 (r10 ADVICE); this pins plan_next to the
    shared-bump reference computation on a synthetic registry."""
    priority = [f"c{i}" for i in range(13)] + [f"q{i}" for i in range(47)]
    nxt = {n: 1 for n in priority}
    bump = max(nxt.values()) + 1
    for n in priority[:50]:
        nxt[n] = bump
    expected = rotation_plan.derive_window(priority, nxt)
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    records = [(1, {n: green for n in priority})]
    assert rotation_plan.plan_next(priority, records) == expected
    # the 10 entries outside the current window (still round-1 green)
    # lead; the re-greened head follows in registry order
    assert expected[13:23] == priority[50:60]
    assert expected[23:50] == priority[13:40]


def test_registry_is_245_after_r11_promotion():
    """The r7-r9 freeze held the registry at 240 until the
    never-driver-verified backlog drained (r10 window); the r9 verdict
    mandated the three r10 promotions (243) and the r10 verdict (task 3)
    exactly the two staged BM25 queries — and nothing else — so the
    registry is now pinned at 245."""
    assert len(entrymod.queries()) == 245


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
        "heavy_", "fuzzy_", "bpe_", "incremental_",
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
