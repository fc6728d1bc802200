"""Soft-delete merge mode (cfg.soft_delete): tombstones keep last known
values, re-inserts clear the flag, unmatched deletes stay no-ops."""

from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.snapshot_target import SnapshotMergeTarget
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

from test_merge_target_contract import changes


def rows(t):
    return sorted(
        (r["user_id"], r["value"], r["__is_deleted"], r["pos"])
        for r in t.read().collect()
    )


def test_tombstone_reinsert_and_unmatched_delete(spark, tmp_path):
    cfg = user_state_config(soft_delete=True)
    t = ParquetMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)
    assert "__is_deleted" in {f.name for f in t.schema.fields}
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    assert rows(t) == [(1, 1.0, False, 1), (2, 2.0, False, 2)]
    # matched delete -> tombstone keeps the value, flag set, pos advances;
    # unmatched delete (key 9) -> no-op
    stats = t.merge(changes(spark, [("d", 1, 0.0, 5, 3), ("d", 9, 0.0, 5, 4)]))
    assert stats["records_deleted"] == 2
    assert rows(t) == [(1, 1.0, True, 3), (2, 2.0, False, 2)]
    # re-insert clears the flag with the new image
    t.merge(changes(spark, [("c", 1, 7.0, 9, 5)]))
    assert rows(t) == [(1, 7.0, False, 5), (2, 2.0, False, 2)]
    # untouched keys keep their flag through unrelated batches
    t.merge(changes(spark, [("d", 2, 0.0, 11, 6), ("u", 1, 8.0, 11, 7)]))
    assert rows(t) == [(1, 8.0, False, 7), (2, 2.0, True, 6)]


def test_soft_delete_on_snapshot_sink(spark, tmp_path):
    cfg = user_state_config(soft_delete=True)
    t = SnapshotMergeTarget(spark, str(tmp_path / "s"), cfg, USER_STATE_SCHEMA)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    t.merge(changes(spark, [("d", 1, 0.0, 5, 2)]))
    assert rows(t) == [(1, 1.0, True, 2)]
    # time travel still sees the pre-tombstone state
    assert sorted(
        (r["user_id"], r["__is_deleted"]) for r in t.read(version=1).collect()
    ) == [(1, False)]


def test_erase_rows_compliance_lifecycle(spark, tmp_path):
    """erase_rows: bucket-pruned hard delete outside the CDC flow; on the
    snapshot sink prior versions retain the rows until vacuum, and a tag
    pinning an old version blocks reclamation until deleted."""
    import pytest
    from pyspark.sql import functions as F

    cfg = user_state_config()
    t = SnapshotMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)
    t.merge(changes(spark, [("c", k, float(k), 0, k) for k in range(1, 11)]))
    t.create_tag("pre-erasure")
    n = t.erase_rows(F.col("user_id") <= 3)
    assert n == 3
    assert sorted(r["user_id"] for r in t.read().collect()) == list(range(4, 11))
    # prior version (and the tag) still expose the erased rows...
    assert t.read(tag="pre-erasure").count() == 10
    # ...so compliance completion = delete the tag + vacuum
    t.delete_tag("pre-erasure")
    t.vacuum(retain_last=1)
    with pytest.raises(ValueError, match="not in log"):
        t.read(version=1)
    # idempotent: no matches -> no new version
    v = t._read_version()
    assert t.erase_rows(F.col("user_id") <= 3) == 0
    assert t._read_version() == v


def test_erase_rows_swap_sink(spark, tmp_path):
    from pyspark.sql import functions as F

    cfg = user_state_config()
    t = ParquetMergeTarget(spark, str(tmp_path / "p"), cfg, USER_STATE_SCHEMA)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    assert t.erase_rows(F.col("value") > 1.5) == 1
    assert sorted(r["user_id"] for r in t.read().collect()) == [1]
    # a later CDC merge still applies normally after the sweep
    t.merge(changes(spark, [("u", 1, 9.0, 5, 3)]))
    assert [(r["user_id"], r["value"]) for r in t.read().collect()] == [(1, 9.0)]


# ---------------------------------------------------------------------------
# property: soft-delete across arbitrary batch splits ≡ python simulation
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

batch_st = st.dictionaries(
    st.integers(1, 4),                                   # user_id (collisions)
    st.tuples(st.sampled_from(["c", "u", "d"]), st.sampled_from([1.0, 2.0, 3.0])),
    min_size=1,
    max_size=4,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(batch_st, min_size=1, max_size=4))
def test_soft_delete_matches_simulation_across_batches(spark, tmp_path_factory, batches):
    cfg = user_state_config(soft_delete=True)
    t = ParquetMergeTarget(
        spark, str(tmp_path_factory.mktemp("sd")) + "/t", cfg, USER_STATE_SCHEMA
    )
    state = {}  # uid -> (value, flag, pos)
    pos = 0
    for i, batch in enumerate(batches):
        rows = []
        for uid, (op, val) in sorted(batch.items()):
            pos += 1
            rows.append((op, uid, val, i * 10, pos))
            if op == "d":
                if uid in state:
                    state[uid] = (state[uid][0], True, pos)
            else:
                state[uid] = (val, False, pos)
        t.merge(changes(spark, rows))
    got = sorted(
        (r["user_id"], r["value"], r["__is_deleted"], r["pos"])
        for r in t.read().collect()
    )
    exp = sorted((u, v, f, p) for u, (v, f, p) in state.items())
    assert got == exp
