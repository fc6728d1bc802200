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


# ---------------------------------------------------------------------------
# property: branch-merge == sequential application on disjoint buckets
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@pytest.fixture(scope="module")
def spark_sess(spark):
    # hypothesis needs a module-scope fixture handle; reuse the session one
    return spark


branch_events_st = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=0, max_value=8),   # key slot within its side
        st.integers(min_value=1, max_value=9),   # ts bucket
        st.floats(min_value=0, max_value=50, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(branch_events_st, branch_events_st, branch_events_st)
def test_branch_merge_equals_sequential(spark_sess, seed_ev, side_a, side_b):
    """For ANY seed batch + two post-fork batches over disjoint key
    bucket groups, (branch applies A, main applies B, merge_branch)
    must equal (apply A then B sequentially on one table)."""
    spark = spark_sess
    import tempfile

    n_buckets = 8
    lo = _keys_by_bucket(spark, n_buckets, True, 9)
    hi = _keys_by_bucket(spark, n_buckets, False, 9)

    def rows(events, keys, pos0):
        return [
            (op, keys[k], float(v), ts, pos0 + i)
            for i, (op, k, ts, v) in enumerate(events)
        ]

    seed = rows(seed_ev, lo, 100) + rows(seed_ev, hi, 200)
    a = rows(side_a, lo, 300)
    b = rows(side_b, hi, 400)

    base = tempfile.mkdtemp(prefix="branch_prop_")
    cfg = user_state_config(n_buckets=n_buckets)
    t1 = SnapshotMergeTarget(spark, f"{base}/branched", cfg, USER_STATE_SCHEMA)
    t1.merge(changes(spark, seed))
    br = t1.create_branch("side_a")
    br.merge(changes(spark, a))
    t1.merge(changes(spark, b))
    t1.merge_branch("side_a")

    t2 = SnapshotMergeTarget(spark, f"{base}/sequential", cfg, USER_STATE_SCHEMA)
    t2.merge(changes(spark, seed))
    t2.merge(changes(spark, a))
    t2.merge(changes(spark, b))

    assert state(t1) == state(t2)
