"""Transactional audit: the reference's single-transaction semantics
restored on the snapshot sink.

The reference commits the target MERGE, the watermark upsert, and the
job log in ONE transaction (merge.sql:368-457 — BEGIN … MERGE … audit
INSERTs … COMMIT), so a crash can never leave data without its audit
row or a watermark pointing past uncommitted data. The engine's default
wiring (engine.py phase 8) writes the audit AFTER the merge commit —
sound under at-least-once + idempotent-merge, but a crash in between
leaves a committed version with no audit row and an un-advanced
watermark (the window replays).

``ManifestAuditStore`` closes that gap where the storage layer makes it
possible: the SUCCESS audit record (run row + job-log fields) rides the
snapshot sink's commit manifest, so data + audit + watermark become
visible in the SAME atomic publish — Delta's txn/commitInfo pattern.
FAILED rows still go to a side :class:`WatermarkStore`: the reference
likewise writes its failure log AFTER the ROLLBACK, outside the
transaction (step-6:81-89), because a failed transaction must not be
able to roll back its own failure evidence.

Drop-in for ``WatermarkStore`` in :func:`engine.run_merge`:

- ``read_watermark`` scans the manifest chain newest-first for the last
  SUCCESS txn (falling back to the side store, which only ever holds
  FAILED and empty-batch rows);
- ``append_run("SUCCESS")`` writes NOTHING — it verifies the payload the
  merge already committed and returns its run id (a missing payload
  fails loudly: it means the sink silently skipped the composer);
- ``append_job_log("SUCCESS")`` is a no-op (the fields rode the same
  payload);
- empty batches (no affected buckets → no commit) fall back to the side
  store like failures — there is no data to be atomic WITH, and an
  empty window's watermark never advances anyway.

The bucket-swap ``ParquetMergeTarget`` cannot host this: its commit is
per-bucket, so there is no single publish to attach the record to —
installing a composer on it fails loudly in ``_commit`` rather than
silently degrading to non-atomic audit.
"""

from __future__ import annotations

import datetime
import uuid

from pyspark.sql import DataFrame, SparkSession

from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
    SnapshotMergeTarget,
)
from dataplatform_cdc_pipeline_spark.operators.watermark import EPOCH, WatermarkStore


def _us(ts: datetime.datetime | None) -> int | None:
    """Naive-UTC datetime → exact integer micros (timedelta arithmetic —
    no float seconds, no dependence on the host timezone)."""
    if ts is None:
        return None
    td = ts - EPOCH
    return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds


def _from_us(us: int | None) -> datetime.datetime | None:
    if us is None:
        return None
    return EPOCH + datetime.timedelta(microseconds=us)


class ManifestAuditStore:
    """WatermarkStore-compatible facade whose SUCCESS rows commit
    atomically with the data inside the snapshot manifest."""

    def __init__(
        self,
        spark: SparkSession,
        target: SnapshotMergeTarget,
        fallback_path: str,
        deterministic_run_ids: bool = False,
    ):
        if not isinstance(target, SnapshotMergeTarget):
            raise TypeError(
                "ManifestAuditStore requires the snapshot sink (table-atomic "
                "manifest commits); the bucket-swap sink has no single "
                "publish to attach the audit record to"
            )
        self.spark = spark
        self.target = target
        self.fallback = WatermarkStore(spark, fallback_path)
        self.deterministic = deterministic_run_ids
        self._etl_start: datetime.datetime | None = None
        #: streaming idempotency (Delta's txnAppId/txnVersion pattern):
        #: when set, the payload carries the (app_id, batch_id) of the
        #: micro-batch it commits — see streaming/stream_merge.
        self.stream_txn: dict | None = None
        target.audit_composer = self._compose

    # -- composer (called by the sink between stats and commit) -------------

    def _compose(self, stats: dict) -> dict:
        cfg = self.target.cfg
        run_id = (
            f"txn-v{self.target._read_version() + 1}"
            if self.deterministic
            else str(uuid.uuid4())
        )
        now = None if self.deterministic else _us(datetime.datetime.utcnow())
        return {
            "id": run_id,
            "cdc_table_name": cfg.cdc_table,
            "target_database": cfg.target_database,
            "target_table": cfg.target_table,
            "cdc_start_ts_us": _us(stats.get("cdc_start_ts")),
            "cdc_end_ts_us": _us(stats.get("cdc_end_ts")),
            "run_status": "SUCCESS",
            "records_inserted": stats["records_inserted"],
            "records_deleted": stats["records_deleted"],
            "proc_name": "sp_cdc_merge_job",
            "etl_start_us": _us(self._etl_start) if not self.deterministic else None,
            "etl_end_us": now,
            **({"stream": dict(self.stream_txn)} if self.stream_txn else {}),
        }

    # -- manifest scan -------------------------------------------------------

    def _txns(self) -> list[tuple[int, dict]]:
        """(version, txn payload) for every retained version carrying one,
        newest first."""
        out = []
        for v in sorted(self.target._versions(), reverse=True):
            m = self.target._manifest(v)
            if m and m.get("txn"):
                out.append((v, m["txn"]))
        return out

    # -- WatermarkStore surface ---------------------------------------------

    def read_watermark(self, cdc_table: str, target_table: str) -> datetime.datetime:
        self._etl_start = self._etl_start or datetime.datetime.utcnow()
        for _, txn in self._txns():
            if (
                txn["cdc_table_name"] == cdc_table
                and txn["target_table"] == target_table
                and txn["run_status"] == "SUCCESS"
                and txn["cdc_end_ts_us"] is not None
            ):
                return _from_us(txn["cdc_end_ts_us"])
        return self.fallback.read_watermark(cdc_table, target_table)

    def append_run(
        self,
        cdc_table: str,
        target_database: str,
        target_table: str,
        cdc_start_ts,
        cdc_end_ts,
        run_status: str,
        error_msg: str | None = None,
        records_inserted: int = 0,
        records_deleted: int = 0,
        run_id: str | None = None,
    ) -> str:
        if run_status != "SUCCESS":
            return self.fallback.append_run(
                cdc_table, target_database, target_table, cdc_start_ts,
                cdc_end_ts, run_status, error_msg=error_msg,
                records_inserted=records_inserted,
                records_deleted=records_deleted, run_id=run_id,
            )
        txns = self._txns()
        head = txns[0][1] if txns else None
        if head is None or head["cdc_end_ts_us"] != _us(cdc_end_ts):
            if records_inserted == 0 and records_deleted == 0:
                # empty batch: the merge never committed (nothing to be
                # atomic with) — record it beside the failures
                return self.fallback.append_run(
                    cdc_table, target_database, target_table, cdc_start_ts,
                    cdc_end_ts, run_status, records_inserted=0,
                    records_deleted=0, run_id=run_id,
                )
            raise RuntimeError(
                "SUCCESS reported but the latest manifest carries no matching "
                "txn payload — the sink bypassed the audit composer"
            )
        if (
            head["records_inserted"] != records_inserted
            or head["records_deleted"] != records_deleted
        ):
            raise RuntimeError(
                f"committed txn counts {head['records_inserted']}/"
                f"{head['records_deleted']} disagree with the engine's "
                f"{records_inserted}/{records_deleted}"
            )
        return head["id"]

    def append_job_log(self, run_id: str, proc_name: str, *args, **kwargs):
        run_status = args[4] if len(args) > 4 else kwargs.get("run_status")
        if run_status == "SUCCESS":
            return run_id  # rode the txn payload
        return self.fallback.append_job_log(run_id, proc_name, *args, **kwargs)

    def history(self) -> DataFrame:
        """All runs — manifest txns (atomic SUCCESS) + fallback rows
        (FAILED / empty batches) — as one frame for audit queries."""
        rows = [
            (
                v,
                t["id"],
                t["run_status"],
                t["records_inserted"],
                t["records_deleted"],
                t["cdc_start_ts_us"],
                t["cdc_end_ts_us"],
            )
            for v, t in self._txns()
        ]
        schema = (
            "version int, id string, run_status string, records_inserted long, "
            "records_deleted long, cdc_start_ts_us long, cdc_end_ts_us long"
        )
        return self.spark.createDataFrame(rows, schema)


def last_committed_batch(target: SnapshotMergeTarget, app_id: str) -> int | None:
    """Highest micro-batch id this stream (``app_id``) has COMMITTED into
    the target's manifest chain, or None — the read side of the
    txnAppId/txnVersion idempotency protocol. Scans newest-first and
    returns on first hit (stream batches commit in order)."""
    for v in sorted(target._versions(), reverse=True):
        m = target._manifest(v)
        txn = (m or {}).get("txn") or {}
        stream = txn.get("stream") or {}
        if stream.get("app_id") == app_id:
            return stream["batch_id"]
    return None
