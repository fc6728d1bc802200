"""The merge-job lifecycle — Spark-native ``sp_cdc_merge_job`` (SURVEY.md §3).

One call = one incremental batch, mirroring the reference's 8 phases
(merge.sql:1-581; step-8:7-626):

 1. config resolve + is_active gate (S1/S2)
 2. watermark read + UUID run id (S3, A1)
 3. plan synthesis — Column trees from config × target schema (§2.2)
 4. upsert/delete change set — window scan → dedup → typed projection (§2.5)
 5. J2 delete survivorship (unified dedup by default, SURVEY.md §7)
 6. window stats (A3)
 7. atomic merge (K1-K4) — bucket-swap commit stands in for the reference's
    BEGIN TRANSACTION … COMMIT/ROLLBACK (merge.sql:368-457)
 8. audit epilogue (K5) — SUCCESS/FAILED row with counts and error message
    (merge.sql:463-467, 531-581); failures re-raise after logging, like the
    reference's RESIGNAL (step-6:81-89).

Watermark semantics follow step-8: the next watermark is
``MAX(load_ts)`` actually processed, not NOW() — closing the race where
events land between wall-clock capture and the scan (step-8:493).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.config import MergeConfig
from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
from dataplatform_cdc_pipeline_spark.plans.merge_plan import (
    build_changes,
    build_two_stream,
    window_scan,
)


class MergeResult(dict):
    """Run outcome: status, window, counts (attribute + dict access)."""

    __getattr__ = dict.__getitem__


def run_merge(
    spark: SparkSession,
    cfg: MergeConfig,
    target: ParquetMergeTarget,
    audit: WatermarkStore,
    raw: DataFrame | None = None,
    window: tuple[datetime.datetime | None, datetime.datetime | None] | None = None,
    deterministic_audit: bool = False,
    dry_run: bool = False,
    pre_merge_hook=None,
) -> MergeResult:
    """Run one incremental CDC merge batch.

    ``pre_merge_hook``: optional callable invoked with the built change
    set immediately before ``target.merge`` — the seam downstream
    maintenance (incremental views, CDC fan-out) attaches to so it sees
    the EXACT rows the merge will apply, after every engine phase
    (windowing, drift policy, two-stream survivorship, dedup) has run.

    ``raw`` defaults to ``spark.read.parquet(cfg.cdc_table)``; ``window``
    defaults to ``(watermark, None]`` — scan everything newer than the last
    successful run, then advance the watermark to MAX(load_ts) processed
    (step-8:493 semantics).

    ``dry_run=True`` is the reference's step-5 variant (§3.3): run phases
    1-5 — config gate, watermark read, plan synthesis, upsert view, delete
    view — but NO DML and NO audit writes; the result carries the two
    views (``log_v_i`` / ``log_v_d``) and their counts for inspection,
    exactly what step-5.sql:332-336, 377-380 SELECTs back as debug output.
    """
    # Phase 1-2: gates + watermark (merge.sql:90-94, 111-115)
    etl_start_time = datetime.datetime.utcnow()  # v_etl_start_time, step-8:150
    if not cfg.is_active:
        return MergeResult(status="SKIPPED_INACTIVE", records_inserted=0, records_deleted=0)
    if raw is None:
        raw = spark.read.parquet(cfg.cdc_table)
    if window is None:
        start = audit.read_watermark(cfg.cdc_table, cfg.target_table)
        end = None
    else:
        start, end = window

    if dry_run:
        # §3.3 step-5 variant: materialize both views, touch nothing.
        windowed = window_scan(raw, cfg, start, end)
        log_v_i, log_v_d = build_two_stream(
            windowed, target.schema, cfg, deterministic_audit=deterministic_audit
        )
        return MergeResult(
            status="DRY_RUN",
            window=(start, end),
            log_v_i=log_v_i,
            log_v_d=log_v_d,
            upsert_candidates=log_v_i.count(),
            delete_candidates=log_v_d.count(),
            records_inserted=0,
            records_deleted=0,
        )

    try:
        # Phase 3-5: plan synthesis + change-set build
        windowed = window_scan(raw, cfg, start, end)
        if cfg.schema_drift_policy != "ignore":
            # payload keys with no target column: raise (fail → FAILED
            # audit row below, like a CAST error) or extend the target
            # schema before the typed projection (evolve). The reference's
            # INFORMATION_SCHEMA re-read per run, made an explicit policy
            # (merge.sql:289-294; operators/schema_drift.py).
            from dataplatform_cdc_pipeline_spark.operators.schema_drift import (
                apply_drift_policy,
            )

            apply_drift_policy(windowed, target, cfg)
        if cfg.two_stream_fidelity:
            log_v_i, log_v_d = build_two_stream(
                windowed, target.schema, cfg, deterministic_audit=deterministic_audit
            )
            # The reference applies the delete MERGE *after* the upsert MERGE
            # inside the transaction (merge.sql:403-436), so when a key has
            # both a surviving upsert and a surviving delete (delete strictly
            # newer, J2), the delete is the net effect. Replaying that
            # statement order as one change set = delete-priority dedup.
            from dataplatform_cdc_pipeline_spark.operators.dedup import latest_per_key

            changes = latest_per_key(
                log_v_i.unionByName(log_v_d),
                list(cfg.pk),
                order_cols=[(F.col("__op") == "d").cast("int").desc()],
            )
        else:
            changes = build_changes(
                windowed, target.schema, cfg, deterministic_audit=deterministic_audit
            )

        # Phase 6+7: atomic merge; window stats come back from the SAME
        # cached change-set agg (merge.sql:360-366 computes stats from the
        # materialized view; step-8:493 MAX(load_ts) → next watermark).
        if pre_merge_hook is not None:
            pre_merge_hook(changes)
        stats = target.merge(changes)
        cdc_start_ts = stats.pop("cdc_start_ts", None)
        cdc_end_ts = stats.pop("cdc_end_ts", None)

        # Phase 8: audit epilogue — BOTH tables, like step-8:572-626
        run_id = audit.append_run(
            cfg.cdc_table,
            cfg.target_database,
            cfg.target_table,
            cdc_start_ts,
            cdc_end_ts,
            "SUCCESS",
            records_inserted=stats["records_inserted"],
            records_deleted=stats["records_deleted"],
        )
        audit.append_job_log(
            run_id,
            "sp_cdc_merge_job",
            cfg.target_database,
            cfg.target_table,
            etl_start_time,
            datetime.datetime.utcnow(),
            "SUCCESS",
            records_inserted=stats["records_inserted"],
            records_deleted=stats["records_deleted"],
        )
        return MergeResult(
            status="SUCCESS",
            run_id=run_id,
            cdc_start_ts=cdc_start_ts,
            cdc_end_ts=cdc_end_ts,
            **stats,
        )
    except Exception as exc:  # noqa: BLE001 — reference logs then RESIGNALs
        run_id = audit.append_run(
            cfg.cdc_table,
            cfg.target_database,
            cfg.target_table,
            None,
            None,
            "FAILED",
            error_msg=str(exc)[:2000],
        )
        audit.append_job_log(
            run_id,
            "sp_cdc_merge_job",
            cfg.target_database,
            cfg.target_table,
            etl_start_time,
            datetime.datetime.utcnow(),
            "FAILED",
            error_msg=str(exc)[:2000],
        )
        raise


def run_all_pipelines(
    spark: SparkSession,
    config_table: str,
    base_path: str,
    schemas: dict[str, T.StructType],
    raw_frames: dict[str, DataFrame] | None = None,
    deterministic_audit: bool = False,
) -> dict[str, MergeResult | Exception]:
    """Orchestrator loop: one ``run_merge`` per config row (the reference
    invokes ``CALL sp_cdc_merge_job(db, table, cdc_table)`` per table from
    an external scheduler — this is that loop, in-process).

    - ``config_table``: parquet/JSON(L) path, one row per pipeline
      (config_file5 mirror; see config.lookup_config).
    - ``base_path``: targets land at ``<base>/<db>/<table>``, audits share
      one keyed store at ``<base>/_audit`` (or per-source via
      WatermarkStore's fidelity flag by the caller).
    - ``schemas``: target_table → silver StructType (the reference reads
      these from INFORMATION_SCHEMA; Spark's catalog equivalent).
    - ``raw_frames``: optional cdc_table → pre-built bronze frame (tests);
      defaults to reading ``cfg.cdc_table`` as a path.

    A failing pipeline logs its FAILED audit row inside run_merge and the
    loop CONTINUES (the reference's scheduler treats each CALL
    independently; its per-table handler RESIGNALs to the scheduler, not
    to sibling tables). Inactive rows come back SKIPPED_INACTIVE.
    Returns {(target_database, target_table, cdc_table): MergeResult | the
    raised exception} — keyed by the full pipeline identity because one
    target table fed by two CDC sources is a supported layout (per-source
    audit naming exists for exactly that) and must not collapse to one key.
    """
    from dataplatform_cdc_pipeline_spark.config import MergeConfig
    from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore

    reader = spark.read
    cfg_df = (
        reader.json(config_table)
        if config_table.endswith((".json", ".jsonl"))
        else reader.parquet(config_table)
    )
    audit = WatermarkStore(spark, f"{base_path}/_audit")
    results: dict[tuple[str, str, str], MergeResult | Exception] = {}
    # validate pipeline identities BEFORE any merge runs: raising mid-loop
    # would discard results for pipelines whose merges already committed
    # (and contradict the documented per-table failure isolation)
    cfgs = [
        MergeConfig.from_dict({k: v for k, v in row.asDict().items() if v is not None})
        for row in cfg_df.collect()  # config rows: one per pipeline, tiny
    ]
    seen: set[tuple[str, str, str]] = set()
    for cfg in cfgs:
        key = (cfg.target_database, cfg.target_table, cfg.cdc_table)
        if key in seen:
            raise ValueError(f"duplicate config row for pipeline {key}")
        seen.add(key)
    for cfg in cfgs:
        key = (cfg.target_database, cfg.target_table, cfg.cdc_table)
        if cfg.target_table not in schemas:
            results[key] = KeyError(f"no schema for {cfg.target_table}")
            continue
        target = ParquetMergeTarget(
            spark,
            f"{base_path}/{cfg.target_database}/{cfg.target_table}",
            cfg,
            schemas[cfg.target_table],
        )
        raw = (raw_frames or {}).get(cfg.cdc_table)
        try:
            results[key] = run_merge(
                spark, cfg, target, audit, raw=raw, deterministic_audit=deterministic_audit
            )
        except Exception as exc:  # noqa: BLE001 — isolate per-table failures
            results[key] = exc
    return results
