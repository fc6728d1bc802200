"""Transactional audit (operators/txn_audit.py): the SUCCESS audit row,
watermark, and data commit in ONE manifest publish — crash-atomicity,
loud failure on the non-atomic sink, fallback for FAILED/empty runs."""

import datetime

import pytest

from dataplatform_cdc_pipeline_spark.engine import run_merge
from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.snapshot_target import SnapshotMergeTarget
from dataplatform_cdc_pipeline_spark.operators.txn_audit import ManifestAuditStore
from dataplatform_cdc_pipeline_spark.operators.watermark import EPOCH
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

from test_merge_target_contract import changes


def make(spark, tmp_path):
    cfg = user_state_config()
    t = SnapshotMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)
    a = ManifestAuditStore(spark, t, str(tmp_path / "fb"), deterministic_run_ids=True)
    return cfg, t, a


def test_success_commits_audit_with_data(spark, tmp_path):
    cfg, t, a = make(spark, tmp_path)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("d", 2, 0.0, 0, 2)]))
    m = t._manifest()
    assert m["txn"]["id"] == "txn-v1"
    assert m["txn"]["records_inserted"] == 1
    assert m["txn"]["records_deleted"] == 1
    # append_run(SUCCESS) verifies, writes nothing, returns the txn id
    end = m["txn"]["cdc_end_ts_us"]
    rid = a.append_run(
        cfg.cdc_table, cfg.target_database, cfg.target_table,
        None, EPOCH + datetime.timedelta(microseconds=end), "SUCCESS",
        records_inserted=1, records_deleted=1,
    )
    assert rid == "txn-v1"
    assert a.fallback.history().count() == 0
    assert a.read_watermark(cfg.cdc_table, cfg.target_table) == EPOCH + datetime.timedelta(
        microseconds=end
    )


def test_crash_before_publish_leaves_no_data_no_audit_no_watermark(spark, tmp_path):
    cfg, t, a = make(spark, tmp_path)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    wm = a.read_watermark(cfg.cdc_table, cfg.target_table)

    def boom():
        raise RuntimeError("crash between staging write and publish")

    t.pre_commit_hook = boom
    with pytest.raises(RuntimeError, match="crash between"):
        t.merge(changes(spark, [("u", 1, 9.0, 5, 2)]))
    t.pre_commit_hook = None
    # nothing moved: same version, same state, same watermark, no txn v2
    assert t._read_version() == 1
    assert [r["value"] for r in t.read().collect()] == [1.0]
    assert a.read_watermark(cfg.cdc_table, cfg.target_table) == wm
    assert [v for v, _ in a._txns()] == [1]
    # and no stale payload leaks into the NEXT commit's manifest
    t.merge(changes(spark, [("u", 1, 7.0, 9, 3)]))
    assert t._manifest()["txn"]["id"] == "txn-v2"
    assert t._manifest()["txn"]["records_inserted"] == 1


def test_swap_sink_fails_loudly(spark, tmp_path):
    cfg = user_state_config()
    t = ParquetMergeTarget(spark, str(tmp_path / "pt"), cfg, USER_STATE_SCHEMA)
    with pytest.raises(TypeError, match="snapshot sink"):
        ManifestAuditStore(spark, t, str(tmp_path / "fb"))
    # even a hand-installed composer cannot silently degrade
    t.audit_composer = lambda stats: {"id": "x"}
    with pytest.raises(NotImplementedError, match="transactional audit"):
        t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))


def test_failed_and_empty_runs_fall_back(spark, tmp_path):
    from helpers import bronze

    cfg, t, a = make(spark, tmp_path)
    raw = bronze(spark, [("c", 0, 1, 1, 1.0), ("u", 5_000_000, 2, 1, 2.0)])
    res1 = run_merge(spark, cfg, t, a, raw=raw, window=(None, None))
    assert res1["status"] == "SUCCESS" and res1["records_inserted"] == 1
    assert [v for v, _ in a._txns()] == [1]
    # watermark-driven rerun: nothing newer -> empty batch -> SUCCESS row
    # in the FALLBACK store, no new manifest version
    res2 = run_merge(spark, cfg, t, a, raw=raw)
    assert res2["status"] == "SUCCESS" and res2["records_inserted"] == 0
    fb = a.fallback.history().collect()
    assert len(fb) == 1 and fb[0]["run_status"] == "SUCCESS"
    assert [v for v, _ in a._txns()] == [1]
    # FAILED runs land beside it: poison payload -> CAST error -> FAILED
    poison = bronze(spark, [("c", 9_000_000, 9, "not-a-number", 1.0)])
    with pytest.raises(Exception):
        run_merge(spark, cfg, t, a, raw=poison, window=(None, None))
    statuses = sorted(r["run_status"] for r in a.fallback.history().collect())
    assert statuses == ["FAILED", "SUCCESS"]
    assert [v for v, _ in a._txns()] == [1]  # data untouched


def test_stream_txn_replay_skips_without_touching_commit_path(spark, tmp_path):
    """Checkpoint-loss replay under the same app id must skip every batch
    at the manifest probe — proven by poisoning the commit hook: if the
    replay even REACHES the commit path, the test fails. A different app
    id is not covered by the skip and must commit normally."""
    from helpers import bronze

    from dataplatform_cdc_pipeline_spark.operators.txn_audit import last_committed_batch
    from dataplatform_cdc_pipeline_spark.streaming.stream_merge import (
        run_streaming_merge_txn,
    )

    cfg = user_state_config()
    t = SnapshotMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)
    src = str(tmp_path / "bronze")
    bronze(spark, [("c", 0, 1, 1, 1.0), ("c", 0, 2, 2, 2.0)]).write.parquet(src)
    assert last_committed_batch(t, "A") is None
    run_streaming_merge_txn(
        spark, cfg, t, str(tmp_path / "fb"), src, str(tmp_path / "ck1"), "A",
        deterministic_audit=True,
    )
    v1 = t._read_version()
    assert v1 >= 1 and last_committed_batch(t, "A") is not None
    # second delivery through the SAME checkpoint: only the new file merges
    bronze(spark, [("u", 5_000_000, 3, 1, 9.0)]).write.mode("append").parquet(src)
    run_streaming_merge_txn(
        spark, cfg, t, str(tmp_path / "fb"), src, str(tmp_path / "ck1"), "A",
        deterministic_audit=True,
    )
    v2 = t._read_version()
    assert v2 > v1
    state = sorted((r["user_id"], r["value"]) for r in t.read().collect())
    assert state == [(1, 9.0), (2, 2.0)]

    def boom():
        raise AssertionError("replay reached the commit path")

    t.pre_commit_hook = boom
    run_streaming_merge_txn(  # total checkpoint loss, same app id
        spark, cfg, t, str(tmp_path / "fb"), src, str(tmp_path / "ck2"), "A",
        deterministic_audit=True,
    )
    assert t._read_version() == v2  # nothing re-committed
    t.pre_commit_hook = None
    # a DIFFERENT app id is a different transaction stream: it commits
    run_streaming_merge_txn(
        spark, cfg, t, str(tmp_path / "fb"), src, str(tmp_path / "ck3"), "B",
        deterministic_audit=True,
    )
    assert t._read_version() > v2
    assert sorted((r["user_id"], r["value"]) for r in t.read().collect()) == state
