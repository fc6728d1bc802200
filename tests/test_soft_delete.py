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
