"""Cross-table GDPR erasure: both tables forget the subject atomically,
a poisoned participant means NEITHER table moves, and the history side
is verified row-by-row (the gate query only hashes the state table)."""

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.multi_txn import MultiTableTxn
from dataplatform_cdc_pipeline_spark.operators.scd2 import snapshot_scd2_target
from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
    SnapshotMergeTarget,
)
from dataplatform_cdc_pipeline_spark.sources.cdc import (
    USER_STATE_SCHEMA,
    user_state_config,
)

from test_merge_target_contract import changes


def _setup(spark, tmp_path):
    cfg = user_state_config(n_buckets=4)
    state_t = SnapshotMergeTarget(spark, str(tmp_path / "state"), cfg, USER_STATE_SCHEMA)
    hist_t = snapshot_scd2_target(spark, str(tmp_path / "hist"), cfg, USER_STATE_SCHEMA)
    rows = [("c", k, float(k), 0, k) for k in range(1, 9)] + [
        ("u", 3, 33.0, 1, 20), ("u", 4, 44.0, 1, 21)
    ]
    state_t.merge(changes(spark, rows))
    hist_t.merge(changes(spark, rows))
    return state_t, hist_t


def test_erasure_hits_both_tables(spark, tmp_path):
    state_t, hist_t = _setup(spark, tmp_path)
    subject = F.col("user_id").isin(3, 4)
    MultiTableTxn(str(tmp_path / "txn")).commit(
        [
            (state_t, lambda: state_t.erase_rows(subject)),
            (hist_t, lambda: hist_t.erase_rows(subject)),
        ]
    )
    assert sorted(r["user_id"] for r in state_t.read().collect()) == [1, 2, 5, 6, 7, 8]
    # the HISTORY forgot the subject too — every version row, not just current
    hist_users = {r["user_id"] for r in hist_t.read().collect()}
    assert 3 not in hist_users and 4 not in hist_users
    assert {1, 2, 5, 6, 7, 8} <= hist_users


def test_poisoned_participant_moves_neither_table(spark, tmp_path):
    state_t, hist_t = _setup(spark, tmp_path)
    v_state, v_hist = state_t._read_version(), hist_t._read_version()
    subject = F.col("user_id").isin(3, 4)

    def poisoned():
        raise RuntimeError("history table offline")

    with pytest.raises(RuntimeError, match="history table offline"):
        MultiTableTxn(str(tmp_path / "txn")).commit(
            [
                (state_t, lambda: state_t.erase_rows(subject)),
                (hist_t, poisoned),
            ]
        )
    # atomicity: the state table's staged erase was never published
    assert state_t._read_version() == v_state
    assert hist_t._read_version() == v_hist
    assert 3 in {r["user_id"] for r in state_t.read().collect()}
    assert 3 in {r["user_id"] for r in hist_t.read().collect()}


def test_erase_rows_null_predicate_rows_are_retained_and_uncounted(spark, tmp_path):
    """ADVICE r6: under SQL three-valued logic a NULL-valued predicate row
    was dropped by BOTH filter(pred) (not counted) and filter(~pred) (not
    kept) — silently erased without being counted, and only in buckets
    that also held a true-predicate row. NULL is now pinned to False:
    the row is deterministically RETAINED and never counted."""
    from dataplatform_cdc_pipeline_spark.operators.merge_target import (
        ParquetMergeTarget,
    )

    cfg = user_state_config(n_buckets=1)  # NULL row shares the bucket
    t = ParquetMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)
    t.merge(
        changes(
            spark,
            [("c", 1, 1.0, 0, 1), ("c", 2, None, 0, 2), ("c", 3, 3.0, 0, 3)],
        )
    )
    # predicate: value < 2.5 — TRUE for user 1, NULL for user 2 (value is
    # NULL), FALSE for user 3. The shipped retention predicate has the
    # same shape (source_ts < cutoff with NULL-ts rows).
    n = t.erase_rows(F.col("value") < 2.5)
    assert n == 1  # only the TRUE row is erased...
    kept = sorted(
        (r["user_id"], r["value"])
        for r in t.read().select("user_id", "value").collect()
    )
    assert kept == [(2, None), (3, 3.0)]  # ...and the NULL row survives
