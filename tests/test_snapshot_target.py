"""Snapshot-sink specifics beyond the shared contract suite
(operators/snapshot_target.py): time travel, snapshot isolation across a
concurrent commit, vacuum retention, manifest-pruned reads, maintenance
through the manifest commit path."""

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.snapshot_target import SnapshotMergeTarget
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

from test_merge_target_contract import changes


def make(spark, tmp_path, **cfg_kwargs):
    cfg = user_state_config(**cfg_kwargs)
    return SnapshotMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)


def state(t, version=None):
    return sorted(
        (r["user_id"], r["value"]) for r in t.read(version=version).collect()
    )


def test_time_travel_reads_each_version(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    t.merge(changes(spark, [("u", 1, 9.0, 5, 3), ("d", 2, 0.0, 5, 4)]))
    assert t._read_version() == 2
    assert state(t, version=1) == [(1, 1.0), (2, 2.0)]
    assert state(t, version=2) == [(1, 9.0)]
    assert state(t) == [(1, 9.0)]  # default = latest
    with pytest.raises(ValueError, match="not in log"):
        t.read(version=99)


def test_snapshot_isolation_across_commit(spark, tmp_path):
    """A frame resolved BEFORE a commit keeps reading its own snapshot
    afterwards — immutable files + manifest pinning. The swap sink cannot
    make this promise (its dirs are replaced in place)."""
    t = make(spark, tmp_path)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    old_reader = t.read()  # lazy plan over v1's files
    t.merge(changes(spark, [("u", 1, 7.0, 5, 2)]))
    assert sorted((r["user_id"], r["value"]) for r in old_reader.collect()) == [(1, 1.0)]
    assert state(t) == [(1, 7.0)]


def test_vacuum_retention_and_orphan_cleanup(spark, tmp_path):
    t = make(spark, tmp_path)
    for i in range(4):
        t.merge(changes(spark, [("u", 1, float(i), i, i + 1)]))
    assert t._read_version() == 4
    removed = t.vacuum(retain_last=2)
    assert removed  # v1/v2's unreferenced trees reclaimed
    # retained snapshots still read; older time travel is gone (like Delta)
    assert state(t, version=4) == [(1, 3.0)]
    with pytest.raises(ValueError, match="not in log"):
        t.read(version=1)
    assert t.vacuum(retain_last=2) == []  # idempotent
    with pytest.raises(ValueError, match="retain_last must be >= 1"):
        t.vacuum(retain_last=0)


def test_manifest_pruned_read_and_compact(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=8)
    t.merge(changes(spark, [("c", k, float(k), 0, k) for k in range(1, 41)]))
    from dataplatform_cdc_pipeline_spark.operators.merge_target import bucket_expr

    b = (
        t.read()
        .filter(F.col("user_id") <= 5)
        .select(bucket_expr(["user_id"], 8).alias("b"))
        .distinct()
    )
    buckets = [r["b"] for r in b.collect()]
    pruned = t.read(buckets=buckets).filter(F.col("user_id") <= 5)
    assert sorted(r["user_id"] for r in pruned.collect()) == [1, 2, 3, 4, 5]
    # maintenance flows through the same manifest commit
    n = t.compact(zorder_by=("k", "value"))
    assert n == 40
    assert len(state(t)) == 40 and t._read_version() == 2


def test_diff_classifies_and_handles_null_pk(spark, tmp_path):
    """diff(v1, v2): insert/update/delete classification with correct-side
    images; unchanged keys drop out; a NULL-PK row (legal per the merge
    contract) diffs via the presence markers, not PK nullness."""
    t = make(spark, tmp_path)
    t.merge(
        changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2), ("c", 3, 3.0, 0, 3)])
    )
    # v2: update 1, delete 2, insert 4, leave 3 untouched, upsert null-PK
    batch = changes(spark, [("u", 1, 9.0, 5, 4), ("d", 2, 0.0, 5, 5), ("c", 4, 4.0, 5, 6)])
    null_pk = batch.filter("user_id = 4").withColumn(
        "user_id", F.lit(None).cast("long")
    )
    t.merge(batch.unionByName(null_pk))
    d = {
        r["user_id"]: (r["_change_type"], r["value"])
        for r in t.diff(1, 2).collect()
    }
    assert d[1] == ("update", 9.0)  # NEW image
    assert d[2] == ("delete", 2.0)  # OLD image
    assert d[4] == ("insert", 4.0)
    assert d[None] == ("insert", 4.0)  # null-PK row present only in v2
    assert 3 not in d  # unchanged key excluded


def test_snapshot_compact_rebucket_shrink_and_grow(spark, tmp_path):
    """Re-bucketing compact on the SNAPSHOT sink (the advisor's verified
    corruption repro): live buckets come from the manifest, not from
    '__bucket=' dirs at the table root (which don't exist in this
    layout). Shrinking 64 → 8 must put every OLD manifest bucket in the
    swap set — otherwise entries for ids >= 8 carry forward next to the
    rewritten tree and read() yields duplicates (40 rows became 75)."""
    t64 = make(spark, tmp_path, n_buckets=64)
    t64.merge(changes(spark, [("c", k, float(k), 0, k) for k in range(1, 41)]))
    before = state(t64)
    assert len(before) == 40

    cfg8 = user_state_config(n_buckets=8)
    t8 = SnapshotMergeTarget(spark, t64.path, cfg8, USER_STATE_SCHEMA)
    assert t8.compact() == 40
    assert state(t8) == before  # no duplicate carryover
    m = t8._manifest()
    assert len(m["buckets"]) <= 8
    assert all(int(b) < 8 for b in m["buckets"])

    # growth direction: 8 -> 64, then a follow-up merge under the new config
    cfg64 = user_state_config(n_buckets=64)
    t64b = SnapshotMergeTarget(spark, t8.path, cfg64, USER_STATE_SCHEMA)
    assert t64b.compact() == 40
    assert state(t64b) == before
    t64b.merge(changes(spark, [("u", 7, 777.0, 9, 100)]))
    assert (7, 777.0) in state(t64b)


def test_snapshot_vacuum_spares_inflight_writer_tree(spark, tmp_path):
    """vacuum() must not delete a concurrent writer's staged-but-not-yet-
    published data tree (written BEFORE its manifest link): deleting it
    would let that writer publish a manifest referencing dead files. A
    tree whose encoded version is ahead of the latest manifest is
    in-flight and survives; once commits advance past it, an unpublished
    ahead-tree becomes a reclaimable orphan."""
    import os

    t = make(spark, tmp_path)
    for i in range(3):
        t.merge(changes(spark, [("u", 1, float(i), i, i + 1)]))
    latest = t._read_version()
    # simulate a racing writer that has staged its tree for latest+1 but
    # not yet hard-linked its manifest
    inflight = os.path.join(t.path, t.DATA_DIR, f"v{latest + 1}-cafef00d")
    os.makedirs(os.path.join(inflight, "__bucket=0"))
    foreign = os.path.join(t.path, t.DATA_DIR, "not-a-commit-tree")
    os.makedirs(foreign)

    removed = t.vacuum(retain_last=1)
    assert removed  # old versions' trees reclaimed
    assert os.path.isdir(inflight)  # in-flight writer untouched
    assert os.path.isdir(foreign)  # unrecognizable names never touched
    assert state(t) == [(1, 2.0)]

    # commits advance past the crashed writer's version -> reclaimable
    t.merge(changes(spark, [("u", 1, 9.0, 9, 50)]))
    removed2 = t.vacuum(retain_last=1)
    assert any(f"v{latest + 1}-cafef00d" in r for r in removed2)
    assert not os.path.isdir(inflight)


def test_zone_map_stats_recorded_and_pruned_read(spark, tmp_path):
    """Commits record per-bucket min/max/null-count zone maps for the
    clustering columns (harvested from parquet footers); read(where=…)
    prunes non-overlapping buckets at the manifest layer and the result
    is identical to filtering an unpruned read."""
    t = make(spark, tmp_path, n_buckets=8, clustering_fields=("value",))
    t.merge(changes(spark, [("c", k, float(k), 0, k) for k in range(1, 41)]))

    m = t._manifest()
    assert m["stats"], "commit recorded no zone maps"
    for b, st in m["stats"].items():
        assert b in m["buckets"]
        mn, mx, nulls = st["value"]
        assert 1.0 <= mn <= mx <= 40.0 and nulls == 0

    pruned = t.read(where=("value", 3.0, 6.0))
    expect = sorted(
        (r["user_id"], r["value"])
        for r in t.read().filter("value between 3.0 and 6.0").collect()
    )
    assert sorted((r["user_id"], r["value"]) for r in pruned.collect()) == expect
    # fewer files listed than the full scan — the pruning is real
    assert len(pruned.inputFiles()) < len(t.read().inputFiles())

    with pytest.raises(ValueError, match="not a target column"):
        t.read(where=("nope", 0, 1))


def test_zone_map_carry_forward_and_null_buckets(spark, tmp_path):
    """Unaffected buckets carry their zone maps forward across commits;
    an all-NULL bucket's stats ([None, None]) prune it for ANY range
    (NULL never matches BETWEEN)."""
    t = make(spark, tmp_path, n_buckets=8, clustering_fields=("value",))
    t.merge(changes(spark, [("c", k, float(k), 0, k) for k in range(1, 21)]))
    s1 = t._manifest()["stats"]
    # second commit touches exactly one key → one bucket recomputed
    t.merge(changes(spark, [("u", 7, 700.0, 10, 100)]))
    s2 = t._manifest()["stats"]
    from dataplatform_cdc_pipeline_spark.operators.merge_target import bucket_expr

    b7 = str(
        spark.createDataFrame([(7,)], "user_id long")
        .select(bucket_expr(["user_id"], 8).alias("b"))
        .first()["b"]
    )
    assert s2[b7]["value"][1] == 700.0  # recomputed bucket sees the update
    for b in s1:
        if b != b7:
            assert s2[b] == s1[b]  # carried forward verbatim

    # all-NULL values in one key's bucket: rows can never match a range
    nullb = changes(spark, [("c", 1000, 1.0, 20, 200)]).withColumn(
        "value", F.lit(None).cast("double")
    )
    t.merge(nullb)
    got = {r["user_id"] for r in t.read(where=("value", -1e9, 1e9)).collect()}
    assert 1000 not in got and 7 in got


def test_change_feed_per_commit_segments(spark, tmp_path):
    """change_feed (0, latest]: version 1 is the all-insert pre-history,
    later segments are adjacent diffs; applying segments in order onto
    the empty state reproduces the final snapshot."""
    t = make(spark, tmp_path)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    t.merge(changes(spark, [("u", 1, 9.0, 5, 3), ("d", 2, 0.0, 5, 4)]))
    t.merge(changes(spark, [("c", 3, 3.0, 9, 5)]))
    feed = t.change_feed(0).select("_commit_version", "_change_type", "user_id").collect()
    got = sorted((r["_commit_version"], r["_change_type"], r["user_id"]) for r in feed)
    assert got == [
        (1, "insert", 1),
        (1, "insert", 2),
        (2, "delete", 2),
        (2, "update", 1),
        (3, "insert", 3),
    ]
    # replay: apply the feed version-by-version onto an empty dict
    replay = {}
    rows = t.change_feed(0).collect()
    for r in sorted(rows, key=lambda r: r["_commit_version"]):
        if r["_change_type"] == "delete":
            replay.pop(r["user_id"], None)
        else:
            replay[r["user_id"]] = r["value"]
    assert sorted(replay.items()) == state(t)
    # subrange: only the middle commit
    mid = t.change_feed(1, 2).select("_commit_version").distinct().collect()
    assert [r["_commit_version"] for r in mid] == [2]
    with pytest.raises(ValueError, match="v_from < v_to"):
        t.change_feed(2, 2)
    with pytest.raises(ValueError, match="not in log"):
        t.change_feed(0, 9)


def test_tags_immutable_and_vacuum_safe(spark, tmp_path):
    """Tags are immutable pointers; tagged versions (and their data
    trees) survive vacuum past the retention window; deleting the tag
    releases them to the next vacuum."""
    t = make(spark, tmp_path)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    assert t.create_tag("gold") == 1
    assert t.create_tag("gold") == 1  # idempotent re-tag of same version
    for i in range(3):
        t.merge(changes(spark, [("u", 1, float(i + 2), i + 1, i + 2)]))
    with pytest.raises(ValueError, match="immutable"):
        t.create_tag("gold", 3)
    t.vacuum(retain_last=1)
    # v1 survives via the tag; untagged v2/v3 are gone
    assert state(t, version=1) == [(1, 1.0)]
    assert sorted((r["user_id"], r["value"]) for r in t.read(tag="gold").collect()) == [(1, 1.0)]
    with pytest.raises(ValueError, match="not in log"):
        t.read(version=2)
    with pytest.raises(ValueError, match="pass version OR tag"):
        t.read(version=1, tag="gold")
    with pytest.raises(ValueError, match="does not exist"):
        t.read(tag="nope")
    t.delete_tag("gold")
    with pytest.raises(ValueError, match="does not exist"):
        t.delete_tag("gold")
    t.vacuum(retain_last=1)
    with pytest.raises(ValueError, match="not in log"):
        t.read(version=1)  # released by the tag deletion
    assert state(t) == [(1, 4.0)]  # latest untouched throughout


def test_metadata_row_count_fail_loud_without_fingerprints(spark, tmp_path):
    """Metadata count requires fingerprints for EVERY live bucket; a
    bucket committed while harvesting was off fails the probe loudly."""
    t = make(spark, tmp_path)
    t.harvest_fingerprints = True
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    assert t.metadata_row_count() == 2
    t.harvest_fingerprints = False
    t.merge(changes(spark, [("c", 33, 3.0, 5, 3)]))  # different bucket, no fp
    with pytest.raises(ValueError, match="no fingerprint entry"):
        t.metadata_row_count()
    # the fully-fingerprinted old version still answers
    assert t.metadata_row_count(version=1) == 2


# ---------------------------------------------------------------------------
# property: change_feed replay reconstructs the final state
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_batch_st = st.dictionaries(
    st.integers(1, 4),
    st.tuples(st.sampled_from(["c", "u", "d"]), st.sampled_from([1.0, 2.0, 3.0])),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_batch_st, min_size=1, max_size=4))
def test_change_feed_replay_property(spark, tmp_path_factory, batches):
    """Applying the per-commit change feed in version order onto an empty
    consumer reproduces the final snapshot for ANY batch history —
    inserts, updates, deletes of absent keys, re-inserts."""
    t = make_tmp(spark, tmp_path_factory.mktemp("cf"))
    pos = 0
    for i, batch in enumerate(batches):
        rows = []
        for uid, (op, val) in sorted(batch.items()):
            pos += 1
            rows.append((op, uid, val, i * 10, pos))
        t.merge(changes(spark, rows))
    replay = {}
    for r in sorted(
        t.change_feed(0).collect(), key=lambda r: r["_commit_version"]
    ):
        if r["_change_type"] == "delete":
            replay.pop(r["user_id"], None)
        else:
            replay[r["user_id"]] = r["value"]
    assert sorted(replay.items()) == state(t)


def make_tmp(spark, tmp_path):
    from dataplatform_cdc_pipeline_spark.sources.cdc import user_state_config

    cfg = user_state_config()
    return SnapshotMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)
