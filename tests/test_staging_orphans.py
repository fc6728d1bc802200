"""Staging-tree lifecycle on FAILED commits (r9 hardening, same defect
class as the r8 ADVICE refit-orphan item): a commit that fails before its
tree is referenced must reclaim the tree immediately instead of leaving
an orphan for vacuum() to find later — and must never reclaim a tree a
manifest references.

Covers operators/merge_target.py ``_commit`` (sibling ``.staging-*``
dirs) and operators/snapshot_target.py ``_commit`` (``data/v*-*`` trees):
(a) the staging parquet write itself failing, (b) a pre-publish failure
after a successful write (snapshot sink's except-BaseException reclaim).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.merge_target import (
    BUCKET_COL,
    ParquetMergeTarget,
    bucket_expr,
)
from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
    SnapshotMergeTarget,
)
from dataplatform_cdc_pipeline_spark.sources.cdc import (
    USER_STATE_SCHEMA,
    user_state_config,
)

from test_merge_target_contract import changes


def _poison(df):
    """Replace `value` with a same-typed column that raises at execution
    time — analysis passes, the staging write's first task fails."""

    @F.udf("double")
    def boom(v):
        raise RuntimeError("poisoned staging write")

    return df.withColumn("value", boom(F.col("value")))


def _staging_siblings(path):
    base, parent = os.path.basename(path), os.path.dirname(path)
    return [e for e in os.listdir(parent) if e.startswith(f"{base}.staging-")]


def _snapshot_trees(t):
    data_root = os.path.join(t.path, t.DATA_DIR)
    return set(os.listdir(data_root)) if os.path.isdir(data_root) else set()


def _referenced_trees(t):
    m = t._manifest() or {"buckets": {}}
    return {str(d).split("/")[1] for d in m["buckets"].values()}


def state(t):
    return sorted((r["user_id"], r["value"]) for r in t.read().collect())


def test_parquet_failed_staging_write_leaves_no_orphan(spark, tmp_path):
    t = ParquetMergeTarget(
        spark, str(tmp_path / "t"), user_state_config(), USER_STATE_SCHEMA
    )
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    before = state(t)
    pk, n = list(t.cfg.pk), t.cfg.n_buckets
    poisoned = _poison(t.read()).withColumn(BUCKET_COL, bucket_expr(pk, n))
    with pytest.raises(Exception, match="poisoned"):
        t._commit(poisoned, affected=list(range(n)))
    assert _staging_siblings(t.path) == []  # reclaimed, not orphaned
    assert t.pending_commit() is None  # never reached the manifest
    assert state(t) == before  # old state intact and readable
    # and the sink still commits cleanly afterwards
    t.merge(changes(spark, [("u", 1, 9.0, 5, 3)]))
    assert state(t) == [(1, 9.0), (2, 2.0)]


def test_snapshot_failed_staging_write_leaves_no_orphan(spark, tmp_path):
    t = SnapshotMergeTarget(
        spark, str(tmp_path / "t"), user_state_config(), USER_STATE_SCHEMA
    )
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    v0, before = t._read_version(), state(t)
    pk, n = list(t.cfg.pk), t.cfg.n_buckets
    poisoned = _poison(t.read()).withColumn(BUCKET_COL, bucket_expr(pk, n))
    with pytest.raises(Exception, match="poisoned"):
        t._commit(poisoned, affected=list(range(n)))
    assert _snapshot_trees(t) == _referenced_trees(t)  # no orphan tree
    assert (t._read_version(), state(t)) == (v0, before)
    t.merge(changes(spark, [("u", 1, 7.0, 5, 2)]))
    assert state(t) == [(1, 7.0)]


def test_snapshot_pre_publish_failure_reclaims_tree(spark, tmp_path):
    """Write succeeds, then the commit fails BEFORE _publish links the
    manifest (pre_commit_hook raises): the fully-written tree is
    unreferenced and must be reclaimed — previously only the
    ConcurrentWriteError path did this and everything else waited for
    vacuum()."""
    t = SnapshotMergeTarget(
        spark, str(tmp_path / "t"), user_state_config(), USER_STATE_SCHEMA
    )
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    v0, before = t._read_version(), state(t)

    def hook():
        raise RuntimeError("validation rejected the staged commit")

    t.pre_commit_hook = hook
    with pytest.raises(RuntimeError, match="rejected"):
        t.merge(changes(spark, [("u", 1, 5.0, 5, 2)]))
    t.pre_commit_hook = None
    assert _snapshot_trees(t) == _referenced_trees(t)  # reclaimed
    assert (t._read_version(), state(t)) == (v0, before)
    t.merge(changes(spark, [("u", 1, 7.0, 10, 3)]))
    assert state(t) == [(1, 7.0)]
    # referenced trees were never touched: all versions still time-travel
    assert t.read(version=v0).count() == 1


def test_snapshot_txn_capture_failure_keeps_tree_for_vacuum(spark, tmp_path):
    """Under txn prepare-capture a pre-publish failure must NOT reclaim
    the staged tree — a (possibly partially-written) txn-staged manifest
    may reference it and only the coordinator can resolve that. The tree
    is left as an ahead-tree and a later vacuum reclaims it once commits
    advance past its version."""
    from dataplatform_cdc_pipeline_spark.operators.multi_txn import MultiTableTxn

    t = SnapshotMergeTarget(
        spark, str(tmp_path / "t"), user_state_config(), USER_STATE_SCHEMA
    )
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    txn = MultiTableTxn(str(tmp_path / "txn"))

    def hook():
        raise RuntimeError("validation rejected the staged commit")

    t.pre_commit_hook = hook
    with pytest.raises(RuntimeError, match="rejected"):
        txn.commit([(t, lambda: t.merge(changes(spark, [("u", 1, 5.0, 5, 2)])))])
    t.pre_commit_hook = None
    assert t._read_version() == 1 and state(t) == [(1, 1.0)]
    # tree KEPT (conservative: coordinator owns its fate), 1 orphan ahead
    orphans = _snapshot_trees(t) - _referenced_trees(t)
    assert len(orphans) == 1 and next(iter(orphans)).startswith("v2-")
    orphan = next(iter(orphans))
    # commits advance past the orphan's version; vacuum then reclaims it
    t.merge(changes(spark, [("u", 1, 7.0, 10, 3)]))
    t.merge(changes(spark, [("u", 1, 8.0, 15, 4)]))
    removed = t.vacuum(retain_last=2)
    assert any(orphan in r for r in removed)
    assert orphan not in _snapshot_trees(t)
    assert state(t) == [(1, 8.0)]


def test_tree_referenced_is_exact_containment_not_prefix():
    """ADVICE r9: the provably-unreferenced check must match entries
    INSIDE the tree (tree + "/"), not string-prefixes — a sibling tree
    whose name extends ours must not make our unreferenced tree look
    referenced (which would skip a valid reclaim)."""
    ref = SnapshotMergeTarget._tree_referenced
    assert ref("data/v2-aaaa0000", ["data/v2-aaaa0000/bucket=3/part.parquet"])
    # sibling whose name string-extends ours: NOT a reference to ours
    assert not ref("data/v2-aaaa", ["data/v2-aaaa0000/bucket=3/part.parquet"])
    assert not ref("data/v2-aaaa0000", ["data/v3-bbbb1111/bucket=0/p.parquet"])
    assert not ref("data/v2-aaaa0000", [])
    # an entry equal to the tree name itself (no inner path) is not a
    # bucket entry and must not count
    assert not ref("data/v2-aaaa0000", ["data/v2-aaaa0000"])
