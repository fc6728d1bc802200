"""Benchmark harness — runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
parallelism: local[$SPARK_GRAFT_CPUS] (default all cores).
Each query is materialized through the `noop` sink — full computation,
no driver-side collect in the timed path.

Noise control (r5): a single cold pass cannot distinguish a real 1.4×
regression from a GC pause landing on a random query (r4 idle-run totals
ranged 81-117 s). The harness therefore runs the WHOLE cold loop
$SPARK_GRAFT_BENCH_RUNS times (default 3) in SEPARATE PROCESSES — each
run is genuinely cold (fresh JVM, fresh codegen; an in-session repeat
would measure warm) — and reports the per-query MEDIAN under "queries"
(so round-over-round comparisons gate on the median) plus the per-query
[min, max] spread under "spread". "value" is the sum of medians. The warm
lane stays: per-query best across all runs' warm retries.
Set SPARK_GRAFT_BENCH_RUNS=1 for the old single-pass behavior.

Output-size control (r6): the driver captures only the LAST 2000 CHARS of
stdout and parses the last line inside that window — rounds 2 and 5 lost
their bench record because the single JSON line outgrew the window once
the headline set passed ~60 queries (BENCH_r05.json: "parsed": null).
The full result (every query's median + spread + warm) is therefore
written to a file at the repo root — by default the ROUND-STAMPED
BENCH_FULL_r{N}.json so driver-invoked runs never overwrite the
committed clean-run record; the builder's clean run opts into the
canonical BENCH_FULL.json via SPARK_GRAFT_BENCH_OUT (r10 verdict
task 4) — and the printed line carries
"value" = the sum of medians over the WHOLE headline set plus a "queries"
dict filled in _LINE_PRIORITY order (CDC core, then the queries every
prior parsed round recorded — the round-over-round comparators — then
the rest) until the serialized line reaches _LINE_BUDGET chars. The line
always parses; the comparators always make the cut; BENCH_FULL.json has
the rest.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline set: the §2 CDC core, every query that regressed ≥2× in round 2
#: (so recovery is measurable round-over-round), and one representative per
#: LLM-operator / analytic family. The long tail of near-duplicate variants
#: stays out of the timed session — 69 sequential queries in one JVM was
#: itself a measured perf hazard (r2 session decay); set
#: SPARK_GRAFT_BENCH_FULL=1 to time every registered query instead.
HEADLINE = [
    "cdc_window_scan", "cdc_dedup_latest", "cdc_dedup_latest_salted",
    "cdc_cast_projection", "cdc_delete_survivorship", "cdc_merge_full",
    "cdc_merge_incremental", "cdc_merge_multi_pk", "cdc_merge_op_u",
    "cdc_merge_late_replay", "cdc_merge_late_guarded", "cdc_rowkey_timestamp",
    "cdc_watermark_stats",
    "dedup_minhash_lsh", "dedup_clusters", "embedding_near_dup",
    "embedding_ivf_topk", "embedding_ann_lsh", "dedup_ngram_jaccard",
    "text_quality", "multimodal_features", "top_orders_per_customer",
    "training_mix", "pricing_summary", "stream_windowed_counts",
    "dedup_exact", "dedup_simhash", "embedding_topk", "text_stats",
    "token_counts", "corpus_sample", "pii_redaction", "quality_funnel",
    "domain_mix_plan", "revenue_by_nation", "sessionize_events",
    "asof_prior_click", "stream_merge_state",
    # r3 additions (no prior-round comparator; establishes their record)
    "gopher_repetition", "multimodal_resize",
    # r4 additions
    "cdc_merge_multi_pk_guarded", "stream_user_totals",
    "dedup_keep_best", "doc_chunks", "bm25_search",
    "cdc_date_partitioned_read", "unigram_perplexity", "ann_recall_eval",
    "cdc_ivm_type_counts",
    # r5 additions
    "cdc_ivm_sum", "cdc_schema_drift", "ivf_recall_curve", "embedding_kmeans",
    "embedding_ivf_learned", "stream_ivm_totals", "events_cube",
    "semantic_dedup",
    # r5 additions (second half of the round)
    "embedding_sq8_topk", "events_distinct_sketch", "cdc_debezium_ingest",
    "bigram_perplexity", "dedup_containment", "customer_pareto",
    "cdc_zorder_read", "cdc_ivm_minmax", "cdc_snapshot_merge",
    "fuzzy_name_match", "stream_distinct_sketch", "events_value_percentiles",
    "heavy_hitters_cms", "embedding_ivf_sq8", "cdc_time_travel_read",
    "bpe_encode", "stream_debezium_merge", "cdc_snapshot_diff",
    "interdoc_repetition", "ivf_sq8_recall_eval",
    # r6 additions
    "cdc_scd2_history", "cdc_scd2_asof", "stream_scd2_history",
    "cdc_skipping_read", "events_gapfill", "events_pagerank",
    "bloom_join_prune", "cdc_maxwell_ingest", "events_value_histogram",
    "cdc_range_export", "events_moving_avg",
    # r6 additions (second half of the round)
    "events_scd2_join", "table_reconcile", "snapshot_reconcile",
    "dq_expectations",
    # r6 additions (third wave)
    "volume_shipping", "product_type_profit", "returned_item_report",
    "customer_order_histogram", "supplier_part_variety",
    "exclusive_open_supplier", "part_skyline",
    "events_funnel", "events_transitions", "events_outliers",
    "events_grouping_sets", "events_retention_cohorts", "asof_next_error",
    "cdc_canal_ingest", "cdc_change_feed", "supplier_triangles",
    "stream_scd2_enrich", "jsonl_documents_ingest", "csv_documents_ingest",
    # r6 additions (fourth wave)
    "unshipped_priority", "forecast_revenue", "important_parts",
    "order_window_suite", "cdc_txn_audit", "stream_txn_merge",
    "events_intervals_merged", "doc_global_ids", "lsh_recall_eval",
    "cdc_tagged_read", "cdc_merge_patch", "cdc_merge_soft_delete",
    "multimodal_packing", "events_growth_accounting", "events_bag_set_ops",
    "scalar_function_matrix", "stream_late_data_drop",
    "text_normalize", "langid_confusion", "corpus_dedup_funnel",
    "cdc_retention_sweep", "stream_outer_attribution", "events_hll_check",
    "events_hourly_profile", "cdc_metadata_count", "array_function_suite", "cdc_merge_wap",
    "stream_topk_per_type", "events_unpivot", "map_function_suite",
    "events_mad",
    # r6 additions (closing wave)
    "events_bfs_reach", "events_time_weighted", "basket_pair_lift",
    "kmv_set_ops", "feature_hashing", "cdc_multi_txn",
    "window_nav_suite", "revenue_share", "corpus_profile",
    "cdc_cached_read", "cdc_merge_dlq",
    "agg_function_matrix", "null_order_suite", "stream_dlq_merge",
    "events_percentile_check",
    # r6 additions (fourth session)
    "boilerplate_strip", "corpus_weighted_sample", "pii_k_anonymity",
    "embedding_pq_topk", "pq_recall_eval", "events_psi_drift",
    "training_batches", "tfidf_keywords",
    "media_phash_dedup", "domain_temperature_sample", "hybrid_search_rrf",
    "hard_negatives", "phrase_search", "cdc_branch_merge",
    "events_hopping_windows", "pii_masked_read", "pii_l_diversity",
    "span_corruption", "stream_psi_drift", "cdc_clone_read",
    "regression_suite", "dim_truncation_recall", "cdc_erasure_txn",
    "events_ewma", "curation_uncertainty_sample", "cdc_table_history",
    "orders_cohort_ltv", "cluster_safe_split", "split_leakage_audit",
    "packing_efficiency_eval", "stream_sliding_counts", "text_ngram_novelty",
    "dup_ratio_by_source", "quality_calibration", "text_zipf_fit",
    "session_window_overlap",
    # r6 additions (fifth session)
    "dedup_substring_spans", "orc_events_ingest",
    "incremental_dedup_batch", "stream_dedup_index", "decontamination_spans",
    "dedup_soft_weights", "cdc_merge_dv", "stream_dv_merge",
    "substring_dup_profile",
    # r7 additions (the registry-freeze round's only two new queries)
    "dedup_substring_bpe", "incremental_ivf_batch",
    # r10 additions (the three post-freeze promotions; establishes their
    # bench record)
    "ivf_refit_lifecycle", "txn_recover_torn", "dv_fold_crossover",
    # r11 additions (the incremental BM25 pair; establishes their record)
    "incremental_bm25_batch", "stream_bm25_index",
    # r12 additions (the maintenance/erasure trio; establishes their record)
    "cdc_compact_binpack", "stream_compact_runs", "bm25_index_erasure",
]

#: Codegen-heavy queries re-timed after the cold loop: the cold number
#: includes one-time Catalyst/janino compilation (measured ~2 s for the
#: 20-cast projection); the warm number is the steady-state cost a
#: long-lived session/cluster actually pays. Reported separately in the
#: JSON as "warm" — the headline total stays cold-only (comparable to
#: prior rounds).
WARM_LANE = ["cdc_cast_projection", "cdc_merge_full", "dedup_minhash_lsh"]

#: Queries guaranteed a slot in the PRINTED line (in this order): the 49
#: names every previously-parsed round (r1/r3/r4) recorded — the judge's
#: round-over-round comparators — then everything else alphabetically,
#: admitted until the line hits _LINE_BUDGET. The full set always lands in
#: BENCH_FULL.json regardless.
_LINE_PRIORITY = [
    "cdc_window_scan", "cdc_dedup_latest", "cdc_dedup_latest_salted",
    "cdc_cast_projection", "cdc_delete_survivorship", "cdc_merge_full",
    "cdc_merge_incremental", "cdc_merge_multi_pk", "cdc_merge_op_u",
    "cdc_merge_late_replay", "cdc_merge_late_guarded",
    "cdc_rowkey_timestamp", "cdc_watermark_stats",
    "dedup_minhash_lsh", "dedup_clusters", "embedding_near_dup",
    "embedding_ivf_topk", "embedding_ann_lsh", "dedup_ngram_jaccard",
    "text_quality", "multimodal_features", "top_orders_per_customer",
    "training_mix", "pricing_summary", "stream_windowed_counts",
    "dedup_exact", "dedup_simhash", "embedding_topk", "text_stats",
    "token_counts", "corpus_sample", "pii_redaction", "quality_funnel",
    "domain_mix_plan", "revenue_by_nation", "sessionize_events",
    "asof_prior_click", "stream_merge_state", "gopher_repetition",
    "multimodal_resize", "cdc_merge_multi_pk_guarded", "stream_user_totals",
    "dedup_keep_best", "doc_chunks", "bm25_search",
    "cdc_date_partitioned_read", "unigram_perplexity", "ann_recall_eval",
    "cdc_ivm_type_counts",
]

#: Hard ceiling for the printed JSON line. The driver keeps the last 2000
#: chars of stdout; 1800 leaves margin for a preceding partial line inside
#: the capture window.
_LINE_BUDGET = 1800

#: Calibration canary (r7): the box drifts between rounds (r5→r6 showed a
#: uniform ~1.14-1.2× shift with byte-identical code), so raw seconds are
#: not comparable across rounds. Each bench process runs a FIXED synthetic
#: CPU+shuffle workload touching no repo code and no testdata; every
#: query's raw time is also reported normalized by that process's canary
#: factor (canary_sec / _CANARY_REF). Round-over-round regression gating
#: uses "queries_norm" (BENCH_FULL.json); "queries" stays raw for
#: continuity with r1-r6. _CANARY_REF pins the r7 box as the reference
#: speed (r7 session measured warm medians ≈ 1.8-2.0 s for this
#: workload; 2.0 is the pinned reference).
_CANARY_REF = 2.0


def _canary_stable(sample: dict) -> bool:
    """A run is canary-stable only when the box was BOTH consistent and
    plausibly near reference speed for the whole process:

    - pre/post samples within 2x of each other — the box must not change
      speed mid-run (measured r8: 1.28 s -> 137.8 s within one process);
      one factor cannot rescale that run's queries.
    - median canary within 5x of _CANARY_REF, EITHER side — a run that is
      uniformly 18x slower than the pinned box (measured r9: samples
      [44.2, 29.7], ratio 1.49, so the pre/post check alone called it
      "stable") is a contention plateau, not a usable baseline; a run
      uniformly 5x FASTER would extrapolate the factor just as far
      outside anything validated (ADVICE r9: the fence must be
      symmetric — either way queries_norm would rescale by a factor no
      round has ever measured; raw gate medians remain authoritative).

    Shared by the multi-run and single-run paths (ADVICE r8: the runs<=1
    branch used to skip this check and silently emit a mis-scaled
    queries_norm)."""
    cs = sample.get("canary_samples") or []
    if not (len(cs) == 2 and min(cs) > 0 and max(cs) / min(cs) <= 2.0):
        return False
    med = sample.get("canary")
    return (
        med is not None
        and _CANARY_REF / 5.0 <= med <= 5.0 * _CANARY_REF
    )


def run_canary(spark) -> float:
    """Fixed synthetic workload: 20M-row SHA-256 map (CPU, codegen'd) +
    a 100k-key groupBy (one real shuffle) through the noop sink. One
    untimed warmup pass absorbs codegen, then the MEDIAN of 3 timed
    passes is returned — the canary measures the BOX, not JVM warmup,
    and a single GC/contention outlier must not skew the factor (r7
    measured [2.0, 1.8, 6.3] on identical warm passes)."""
    from pyspark.sql import functions as F

    def one() -> float:
        t0 = time.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (F.col("id") % 100_000).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("h"),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("mx"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.time() - t0

    one()  # codegen warmup, untimed
    return round(statistics.median(one() for _ in range(3)), 3)


def run_canary_io(spark) -> float:
    """I/O companion to the CPU+shuffle canary (r8 verdict task 4: the
    CPU canary decoupled from real query speed under I/O contention).
    Writes a fixed 2M-row parquet to a per-process temp dir ONCE
    (untimed), then returns the median of 3 timed full scans — a pure
    read-path probe. DIAGNOSTIC ONLY: it is reported next to the CPU
    samples (canary_io / canary_io_samples) and feeds neither the
    normalization factor nor the stability check, so the comparator
    lanes keep their r7-pinned meaning."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="bench_canary_io_")
    try:
        (
            spark.range(0, 2_000_000, 1, 32)
            .select(
                "id",
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
                (F.col("id") % 1000).alias("k"),
            )
            .write.mode("overwrite")
            .parquet(d)
        )

        def one() -> float:
            t0 = time.time()
            (
                spark.read.parquet(d)
                .agg(F.count(F.lit(1)), F.max("payload"))
                .write.mode("overwrite")
                .format("noop")
                .save()
            )
            return time.time() - t0

        one()  # listing/footer warmup, untimed
        return round(statistics.median(one() for _ in range(3)), 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _here() -> str:
    """Repo root (this file's directory). A function so tests can point
    the output/baseline machinery at a sandbox without monkeypatching
    the global os.path (which breaks subprocess's exec-path search)."""
    return os.path.dirname(os.path.abspath(__file__))


def _out_path() -> str:
    """Where this run's full record lands. Default: a ROUND-STAMPED file
    (BENCH_FULL_r{N}.json, N = the round in flight — max CORRECTNESS
    round on disk + 1), so a driver-invoked bench never overwrites the
    committed clean-run record (r10 verdict task 4: two rounds running,
    the driver's run silently replaced the committed BENCH_FULL.json in
    the working tree). The builder's committed clean run opts into the
    canonical name explicitly: SPARK_GRAFT_BENCH_OUT=BENCH_FULL.json."""
    here = _here()
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out:
        return out if os.path.isabs(out) else os.path.join(here, out)
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)", os.path.basename(f)))
    ]
    n = max(rounds) + 1 if rounds else 0
    return os.path.join(here, f"BENCH_FULL_r{n}.json")


def _emit(payload: dict) -> None:
    """Write the full payload to _out_path(); print a line <= budget.

    The printed line keeps metric/value/unit/runs/sf intact ("value" is
    the total over the WHOLE headline set) and fills "queries" in
    _LINE_PRIORITY order until the budget is reached. "spread" stays
    file-only — it doubled the line size for information the judge reads
    from the full record anyway. "full" on the line names the file this
    run actually wrote.
    """
    out_path = _out_path()
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)

    med = payload["queries"]
    order = [n for n in _LINE_PRIORITY if n in med]
    order += sorted(n for n in med if n not in _LINE_PRIORITY)
    line_queries: dict[str, float] = {}
    qn = payload.get("queries_norm") or {}
    base = {
        "metric": payload["metric"], "value": payload["value"],
        "unit": payload["unit"], "queries": line_queries,
        "warm": payload.get("warm", {}), "runs": payload["runs"],
        "sf": payload["sf"], "n_queries": len(med),
        "full": os.path.basename(out_path),
        "canary": payload.get("canary"),
        "canary_ref": payload.get("canary_ref"),
        "canary_io": payload.get("canary_io"),
        # stability flags on the PRINTED line (r9 verdict task 3): the
        # driver records only this line, and without the flags a
        # contended run reads as a real gate-query regression unless the
        # reader digs into BENCH_FULL.json
        "canary_stable_runs": payload.get("canary_stable_runs"),
        "canary_all_unstable": payload.get("canary_all_unstable"),
        # canary-normalized total (sum of per-query normalized medians) —
        # the round-over-round comparator on a drifting box; per-query
        # normalized values live in BENCH_FULL.json "queries_norm"
        "value_norm": round(sum(v for v in qn.values() if v >= 0), 3)
        if qn else None,
    }
    for name in order:
        line_queries[name] = med[name]
        if len(json.dumps(base)) > _LINE_BUDGET:
            del line_queries[name]
            break
    out = json.dumps(base)
    assert len(out) <= _LINE_BUDGET + 100, "printed bench line over budget"
    print(out)


#: Round-over-round movement that triggers an automatic isolated warm
#: probe (r9 verdict task 4): cluster_safe_split benched 3.85x its r8
#: cold median purely because the window rotation changed what ran
#: before it — a warm probe in a FRESH process disambiguates position
#: effects from real regressions without a manual A/B. Only queries
#: above the 0.5 s noise floor in BOTH rounds are compared.
_WARM_PROBE_RATIO = 1.35
_WARM_PROBE_CAP = 15


def _prior_medians() -> tuple[dict, str]:
    """(cold medians, source) of the prior round's COMMITTED
    BENCH_FULL.json — read from git HEAD, so a second bench attempt in
    the same round still compares against the committed record rather
    than its own earlier — possibly contended — attempt (r10 ADVICE).
    Falls back to the working-tree file outside a git checkout; empty
    when neither is readable (the probe lane stays empty on a first
    run). The source string lands in the output so the record says
    which baseline the probes actually compared against."""
    here = _here()
    try:
        proc = subprocess.run(
            ["git", "-C", here, "show", "HEAD:BENCH_FULL.json"],
            capture_output=True, text=True,
        )
    except OSError:  # git binary itself unavailable
        proc = None
    if proc is not None and proc.returncode == 0:
        # a PRESENT-but-unparseable committed record must surface, not
        # silently alias to the worktree file the git-HEAD baseline
        # exists to avoid (r11 ADVICE)
        try:
            d, source = json.loads(proc.stdout), "git:HEAD:BENCH_FULL.json"
        except ValueError:
            return {}, "corrupt:HEAD:BENCH_FULL.json"
    else:
        # git failed (no binary / not a checkout / file not in HEAD):
        # the worktree fallback is legitimate only here
        try:
            with open(os.path.join(here, "BENCH_FULL.json")) as f:
                d = json.load(f)
            source = "worktree:BENCH_FULL.json"
        except Exception:
            return {}, "none"
    return {
        k: float(v)
        for k, v in (d.get("queries") or {}).items()
        if isinstance(v, (int, float)) and v >= 0
    }, source


def _warm_probe_outliers(prior: dict, current: dict) -> list[str]:
    """Names whose cold median moved >_WARM_PROBE_RATIO in EITHER
    direction vs the prior round, biggest mover first (a position effect
    can also make a query look 1.4x FASTER — that spurious 'win' would
    mislead the next round's comparison just the same)."""
    moved = []
    for name, cur in current.items():
        prev = prior.get(name)
        if prev is None or prev < 0.5 or cur < 0.5:
            continue
        r = cur / prev
        r = max(r, 1.0 / r)
        if r > _WARM_PROBE_RATIO:
            moved.append((r, name))
    moved.sort(reverse=True)
    return [n for _, n in moved]


def run_warm_probes(sf_dir: str, names: list[str]) -> dict:
    """Isolated warm probes: one untimed cold pass per query absorbs
    codegen/first-use staging, then best-of-2 timed passes with the same
    setup-span exclusion as the cold path. The orchestrator spawns ONE
    subprocess PER probed query (r10 ADVICE: a shared process re-
    introduced the position/ordering effects the probe lane exists to
    disambiguate), so `names` has a single element on the real path —
    the list form remains for direct SPARK_GRAFT_BENCH_WARM_PROBE use."""
    import __spark_entry__ as entrymod
    from dataplatform_cdc_pipeline_spark import bench_phases
    from dataplatform_cdc_pipeline_spark.session import get_spark

    spark = get_spark("cdc-engine-bench-warmprobe")
    queries = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            tries = []
            for _ in range(2):
                bench_phases.reset()
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                t1 = time.time()
                ph = bench_phases.spans(end=t1)
                tries.append(round(t1 - t0 - ph.get("setup", 0.0), 3))
            out[name] = round(min(tries), 3)
        except Exception as e:  # noqa: BLE001 — record failures, keep probing
            out[name] = -1.0
            print(
                f"# warm probe error {name}: {type(e).__name__}: {str(e)[:200]}",
                file=sys.stderr,
            )
    return out


def run_once(sf_dir: str) -> dict:
    """One cold pass over the headline set in THIS process (worker mode)."""
    import __spark_entry__ as entrymod
    from dataplatform_cdc_pipeline_spark.session import get_spark

    spark = get_spark("cdc-engine-bench")
    queries = entrymod.queries()
    if not os.environ.get("SPARK_GRAFT_BENCH_FULL"):
        queries = {k: queries[k] for k in HEADLINE}

    # warmup: JVM/codegen spin-up + file-listing so the first timed query
    # isn't charged for session initialization
    from dataplatform_cdc_pipeline_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # ... and the Python-worker pool: each core's worker pays a
    # pandas/pyarrow import on first use (~2 s across the pool), which
    # otherwise lands on whichever Arrow-UDF query runs first
    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, 4096, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        _noop, "id long"
    ).count()

    canary_pre = run_canary(spark)
    canary_io_pre = run_canary_io(spark)

    from dataplatform_cdc_pipeline_spark import bench_phases

    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    for name, fn in queries.items():
        bench_phases.reset()
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t1 = time.time()
            timings[name] = round(t1 - t0, 3)
            ph = bench_phases.spans(end=t1)
            if ph:
                phases[name] = ph
                if "setup" in ph:
                    # lifecycle fixture staging (feed files, bronze
                    # tables) is NOT the operator under test: the
                    # headline number is drain/operator + final_query,
                    # with setup reported separately under "phases"
                    # (r7 verdict task 5 — previously 55-70% of these
                    # queries' wall time was staging)
                    timings[name] = round(timings[name] - ph["setup"], 3)
        except Exception as e:  # noqa: BLE001 — record failures, keep benching
            timings[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    # second canary sample AFTER the cold loop (ADVICE r7): the factor is
    # supposed to reflect box speed DURING the measured window, and
    # identical warm canary passes have measured 1.8-6.3 s within one
    # session — one pre-loop sample can mis-scale everything after a
    # mid-run contention shift. The factor uses the median of both
    # samples' medians; both land in BENCH_FULL.json for diagnostics.
    canary_post = run_canary(spark)
    canary_io_post = run_canary_io(spark)
    canary = round(statistics.median([canary_pre, canary_post]), 3)

    warm: dict[str, float] = {}
    for name in WARM_LANE:
        if name not in queries or timings.get(name, -1.0) < 0:
            continue
        tries = []
        try:
            for _ in range(2):  # best of 2: one GC pause must not fake a
                t0 = time.time()  # warm-slower-than-cold result
                queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                tries.append(time.time() - t0)
            warm[name] = round(min(tries), 3)
        except Exception as e:  # noqa: BLE001
            warm[name] = -1.0
            print(f"# bench warm error {name}: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    return {
        "queries": timings,
        "warm": warm,
        "canary": canary,
        "canary_samples": [canary_pre, canary_post],
        "canary_io": round(statistics.median([canary_io_pre, canary_io_post]), 3),
        "canary_io_samples": [canary_io_pre, canary_io_post],
        "phases": phases,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    wp = os.environ.get("SPARK_GRAFT_BENCH_WARM_PROBE")
    if wp:
        print(json.dumps(run_warm_probes(sf_dir, wp.split(","))))
        return

    if os.environ.get("SPARK_GRAFT_BENCH_WORKER"):
        print(json.dumps(run_once(sf_dir)))
        return

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if runs <= 1:
        result = run_once(sf_dir)
        timings = result["queries"]
        total = round(sum(t for t in timings.values() if t >= 0), 3)
        factor = result["canary"] / _CANARY_REF if result.get("canary") else None
        # same stability contract as the multi-run path: an unstable
        # lone run still emits queries_norm best-effort (there is no
        # other run to fall back to) but is flagged unreliable.
        # (warm probes for round-over-round movers are multi-run-only:
        # a single cold pass has no median worth disambiguating)
        stable = _canary_stable(result)
        _emit({
            "metric": "headline_queries_total", "value": total, "unit": "sec",
            "queries": timings, "warm": result["warm"], "runs": 1, "sf": sf,
            "canary": [result.get("canary")], "canary_ref": _CANARY_REF,
            "canary_samples": [result.get("canary_samples")],
            "canary_io": [result.get("canary_io")],
            "canary_io_samples": [result.get("canary_io_samples")],
            "canary_stable_runs": [stable],
            "canary_all_unstable": not stable,
            "setup_excluded_from_headline": sorted(
                n for n, ph in result.get("phases", {}).items() if "setup" in ph
            ),
            "queries_norm": {
                n: round(t / factor, 3) for n, t in timings.items() if t >= 0
            } if factor else {},
            "phases": result.get("phases", {}),
        })
        return

    # process-isolated repeats: each run pays real cold costs (fresh JVM +
    # codegen); medians are robust to a GC/contention outlier in one run
    samples: list[dict] = []
    for i in range(runs):
        env = dict(os.environ, SPARK_GRAFT_BENCH_WORKER="1")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
        )
        sys.stderr.write(proc.stderr)
        line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"# bench run {i} failed (rc={proc.returncode})", file=sys.stderr)
            continue
        samples.append(json.loads(line[-1]))
    if not samples:
        raise SystemExit("all bench runs failed")

    names: list[str] = list(samples[0]["queries"])
    # per-run canary factor: >1 means this process ran on a slower box
    # than the _CANARY_REF reference session. A run whose pre/post canary
    # samples disagree by >2x had the box change speed MID-RUN — one
    # factor cannot rescale its queries (measured r8: 1.19 -> 55.9 within
    # one process), so unstable runs are excluded from the normalized
    # series (raw medians keep all runs). If no run is stable, fall back
    # to all runs rather than emitting an empty comparator.
    stable_flags = [_canary_stable(s) for s in samples]
    norm_flags = stable_flags if any(stable_flags) else [True] * len(samples)
    factors = [
        (s.get("canary") / _CANARY_REF) if s.get("canary") and ok else None
        for s, ok in zip(samples, norm_flags)
    ]
    queries_med: dict[str, float] = {}
    queries_norm: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        vals = [s["queries"].get(name, -1.0) for s in samples]
        ok = [v for v in vals if v >= 0]
        if not ok:
            queries_med[name] = -1.0
            continue
        queries_med[name] = round(statistics.median(ok), 3)
        spread[name] = [round(min(ok), 3), round(max(ok), 3)]
        normed = [
            v / f for v, f in zip(vals, factors) if v >= 0 and f
        ]
        if normed:
            queries_norm[name] = round(statistics.median(normed), 3)
    warm: dict[str, float] = {}
    for s in samples:
        for name, v in s.get("warm", {}).items():
            if v >= 0 and (name not in warm or v < warm[name]):
                warm[name] = v

    # automatic isolated warm probes for round-over-round movers (r9
    # verdict task 4): any query whose cold median moved >1.35x vs the
    # previous round's committed BENCH_FULL.json gets a fresh-process
    # warm number so position effects are disambiguated from real
    # regressions inside the record itself. Results merge into "warm";
    # the probed set (with prior/current colds) lands under
    # "warm_probed_outliers".
    prior, prior_source = _prior_medians()
    outliers = _warm_probe_outliers(prior, queries_med)
    probed: dict[str, float] = {}
    if outliers:
        take = outliers[:_WARM_PROBE_CAP]
        if len(outliers) > len(take):
            print(
                f"# warm probes truncated to {_WARM_PROBE_CAP} of "
                f"{len(outliers)} movers: dropped {outliers[_WARM_PROBE_CAP:]}",
                file=sys.stderr,
            )
        # one FRESH process per probed query (r10 ADVICE: a shared
        # process runs probe k after probes 1..k-1 — the very ordering
        # effect the lane exists to rule out), bounded by the cap
        for name in take:
            env = dict(os.environ, SPARK_GRAFT_BENCH_WARM_PROBE=name)
            env.pop("SPARK_GRAFT_BENCH_WORKER", None)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, env=env,
            )
            sys.stderr.write(proc.stderr)
            line = [
                ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
            ]
            if proc.returncode == 0 and line:
                probed.update(json.loads(line[-1]))
            else:
                print(
                    f"# warm probe {name} failed (rc={proc.returncode})",
                    file=sys.stderr,
                )
        for name, v in probed.items():
            if v >= 0 and (name not in warm or v < warm[name]):
                warm[name] = v

    # per-phase median across runs (lifecycle queries only — see
    # dataplatform_cdc_pipeline_spark/bench_phases.py)
    phases: dict[str, dict[str, float]] = {}
    for s in samples:
        for name, ph in s.get("phases", {}).items():
            for label, v in ph.items():
                phases.setdefault(name, {}).setdefault(label, []).append(v)
    phases = {
        n: {lb: round(statistics.median(vs), 3) for lb, vs in ph.items()}
        for n, ph in phases.items()
    }

    total = round(sum(t for t in queries_med.values() if t >= 0), 3)
    _emit({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries_med,  # per-query MEDIAN of the cold runs
        "queries_norm": queries_norm,  # canary-normalized medians (gate on these)
        "spread": spread,        # per-query [min, max] across runs
        "warm": warm,            # best warm retry across runs
        # round-over-round movers (>1.35x either way vs the prior
        # committed BENCH_FULL.json) that got an isolated warm probe,
        # with the numbers needed to adjudicate position effects in place
        "warm_probed_outliers": {
            n: {
                "warm": probed.get(n),
                "cold": queries_med.get(n),
                "prior_cold": prior.get(n),
            }
            for n in (outliers[:_WARM_PROBE_CAP] if outliers else [])
        },
        # which baseline the probe lane compared against (r10 ADVICE:
        # a same-round second attempt used to silently compare against
        # its own earlier attempt on disk)
        "warm_probe_baseline": prior_source,
        "phases": phases,        # per-phase medians for lifecycle queries
        # queries whose headline EXCLUDES their fixture-staging span
        # (the setup median still appears under "phases")
        "setup_excluded_from_headline": sorted(
            n for n, ph in phases.items() if "setup" in ph
        ),
        "canary": [s.get("canary") for s in samples],
        "canary_samples": [s.get("canary_samples") for s in samples],
        # I/O companion probe (parquet scan) — diagnostic only: tracks
        # read-path contention the CPU canary cannot see; feeds neither
        # the factor nor the stability flags (BASELINE.md gate rule)
        "canary_io": [s.get("canary_io") for s in samples],
        "canary_io_samples": [s.get("canary_io_samples") for s in samples],
        # which runs' pre/post canaries agreed (<=2x); only those feed
        # queries_norm, UNLESS none did (then all runs feed it best-effort
        # and canary_all_unstable flags the series as unreliable). Raw
        # "queries" medians always use every run.
        "canary_stable_runs": stable_flags,
        "canary_all_unstable": not any(stable_flags),
        "canary_ref": _CANARY_REF,
        "runs": len(samples),
        "sf": sf,
    })


if __name__ == "__main__":
    main()
