"""Branch semantics on the snapshot sink (operators/snapshot_target.py):
fork/isolation, three-way bucket merge, conflict detection, vacuum
protection, and branch time travel."""

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.merge_target import bucket_expr
from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
    BranchConflictError,
    SnapshotMergeTarget,
)
from dataplatform_cdc_pipeline_spark.sources.cdc import (
    USER_STATE_SCHEMA,
    user_state_config,
)

from test_merge_target_contract import changes


def make(spark, tmp_path, sub="t", **cfg_kwargs):
    cfg = user_state_config(**cfg_kwargs)
    return SnapshotMergeTarget(spark, str(tmp_path / sub), cfg, USER_STATE_SCHEMA)


def state(t, version=None):
    return sorted(
        (r["user_id"], r["value"]) for r in t.read(version=version).collect()
    )


def _keys_by_bucket(spark, n_buckets, lo_side, count, start=100):
    """First `count` keys >= start whose bucket is on the requested side
    (lo_side=True → bucket < n_buckets // 2)."""
    rows = (
        spark.range(start, start + 10_000)
        .select(
            F.col("id"), bucket_expr(["id"], n_buckets).alias("b")
        )
        .collect()
    )
    half = n_buckets // 2
    picked = [
        int(r["id"])
        for r in rows
        if (r["b"] < half) == lo_side
    ]
    assert len(picked) >= count
    return picked[:count]


def test_branch_isolation_and_merge(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=8)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    base_state = state(t)

    br = t.create_branch("fix")
    lo = _keys_by_bucket(spark, 8, True, 3)
    hi = _keys_by_bucket(spark, 8, False, 3)
    br.merge(changes(spark, [("c", k, 10.0, 1, 10 + i) for i, k in enumerate(lo)]))
    # isolation: main does not see branch rows; branch sees them
    assert state(t) == base_state
    assert sorted(k for k, _ in state(br)) == sorted([1, 2] + lo)
    # branch time travel: fork-point snapshot still readable on the branch
    assert state(br, version=1) == base_state

    # main advances on DISJOINT buckets
    t.merge(changes(spark, [("c", k, 20.0, 1, 20 + i) for i, k in enumerate(hi)]))
    assert sorted(k for k, _ in state(t)) == sorted([1, 2] + hi)

    v = t.merge_branch("fix")
    assert v == t._read_version()
    assert sorted(k for k, _ in state(t)) == sorted([1, 2] + lo + hi)
    # merged manifest records provenance; branch pointer is gone
    assert t._manifest()["merged_branch"]["name"] == "fix"
    assert "fix" not in t.branches()


def test_branch_conflict_detected_and_sides_intact(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=8)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    br = t.create_branch("fix")
    # both sides touch key 1's bucket
    br.merge(changes(spark, [("u", 1, 5.0, 1, 2)]))
    t.merge(changes(spark, [("u", 1, 9.0, 1, 3)]))
    with pytest.raises(BranchConflictError, match="rebase"):
        t.merge_branch("fix")
    # nothing moved: both lines keep their own state, branch still exists
    assert state(t) == [(1, 9.0)]
    assert state(br) == [(1, 5.0)]
    assert "fix" in t.branches()


def test_vacuum_protects_live_branch_trees(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=4)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    br = t.create_branch("wip")
    br.merge(changes(spark, [("c", 2, 2.0, 0, 2)]))
    # churn main so old versions become vacuum-able
    for i in range(3):
        t.merge(changes(spark, [("u", 1, float(i), i + 1, 3 + i)]))
    t.vacuum(retain_last=1)
    # the branch must still read (its trees were pinned)
    assert state(br) == [(1, 1.0), (2, 2.0)]
    # vacuum refuses to run on a branch ref
    with pytest.raises(ValueError, match="MAIN table ref"):
        br.vacuum(retain_last=1)
    # delete the branch; its exclusive trees become reclaimable once no
    # retained main manifest references them
    t.delete_branch("wip")
    t.merge(changes(spark, [("u", 1, 99.0, 9, 9)]))
    removed = t.vacuum(retain_last=1)
    assert any("data/" in r for r in removed)
    assert state(t) == [(1, 99.0)]


def test_branch_api_errors(spark, tmp_path):
    t = make(spark, tmp_path)
    with pytest.raises(ValueError, match="empty table"):
        t.create_branch("x")
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    br = t.create_branch("x")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("x")
    with pytest.raises(ValueError, match="branches of branches"):
        br.create_branch("y")
    with pytest.raises(ValueError, match="does not exist"):
        t.branch_ref("nope")
    with pytest.raises(ValueError, match="does not exist"):
        t.merge_branch("nope")
    with pytest.raises(ValueError, match="does not exist"):
        t.delete_branch("nope")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("a/b")


def test_merge_branch_fails_after_fork_point_vacuumed(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=4)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    t.create_branch("old")
    for i in range(3):
        t.merge(changes(spark, [("u", 1, float(i), i + 1, 2 + i)]))
    t.vacuum(retain_last=1)  # prunes the fork-point manifest (v1)
    with pytest.raises(ValueError, match="fork point"):
        t.merge_branch("old")
