"""Merkle reconciliation (operators/reconcile.py): fingerprint algebra,
classification correctness, bucket-pruned descent, NULL discipline."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.merge_target import (
    ParquetMergeTarget,
    bucket_expr,
)
from dataplatform_cdc_pipeline_spark.operators.reconcile import (
    bucket_fingerprints,
    reconcile_frames,
    reconcile_targets,
    row_hash,
)
from dataplatform_cdc_pipeline_spark.sources.cdc import (
    USER_STATE_SCHEMA,
    user_state_config,
)

COLS = ["v", "s"]


def _frame(spark, rows, parts=1):
    return spark.createDataFrame(rows, "uid long, v long, s string").repartition(
        parts
    )


def test_fingerprint_partition_order_independent(spark):
    rows = [(i, i * 10, f"s{i}") for i in range(50)]
    a = bucket_fingerprints(_frame(spark, rows, 1), ["uid"], COLS, 8)
    b = bucket_fingerprints(
        _frame(spark, list(reversed(rows)), 7), ["uid"], COLS, 8
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fingerprint_detects_single_row_drift(spark):
    rows = [(i, i * 10, f"s{i}") for i in range(50)]
    drifted = [(i, i * 10 + (1 if i == 17 else 0), f"s{i}") for i in range(50)]
    a = {r["bucket"]: (r["n_rows"], r["fp"]) for r in
         bucket_fingerprints(_frame(spark, rows), ["uid"], COLS, 8).collect()}
    b = {r["bucket"]: (r["n_rows"], r["fp"]) for r in
         bucket_fingerprints(_frame(spark, drifted), ["uid"], COLS, 8).collect()}
    diff = [k for k in a if a[k] != b.get(k)]
    # exactly the bucket uid=17 hashes to differs; counts all equal
    drift_bucket = (
        spark.createDataFrame([(17,)], "uid long")
        .select(bucket_expr(["uid"], 8).alias("b"))
        .collect()[0]["b"]
    )
    assert diff == [drift_bucket]


def test_reconcile_frames_classification(spark):
    a = _frame(spark, [(1, 10, "x"), (2, 20, "y"), (4, 40, "w")])
    b = _frame(spark, [(1, 10, "x"), (2, 21, "y"), (3, 30, "z")])
    out = {
        r["uid"]: r["status"]
        for r in reconcile_frames(a, b, ["uid"], COLS).collect()
    }
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_null_columns_do_not_collide(spark):
    # concat_ws drops NULLs; the sentinel must keep (v=NULL, s='10') and
    # (v=10, s=NULL) distinguishable — a classic silent-equality bug
    a = spark.createDataFrame([(1, None, "10")], "uid long, v long, s string")
    b = spark.createDataFrame([(1, 10, None)], "uid long, v long, s string")
    out = reconcile_frames(a, b, ["uid"], COLS).collect()
    assert len(out) == 1 and out[0]["status"] == "changed"
    # and NULL == NULL rows are equal (no phantom drift)
    n1 = spark.createDataFrame([(1, None, None)], "uid long, v long, s string")
    n2 = spark.createDataFrame([(1, None, None)], "uid long, v long, s string")
    assert reconcile_frames(n1, n2, ["uid"], COLS).count() == 0


def test_row_hash_matches_fingerprint_contribution(spark):
    df = _frame(spark, [(1, 5, "a")])
    h = df.select(row_hash(COLS).alias("h")).collect()[0]["h"]
    fp = bucket_fingerprints(df, ["uid"], COLS, 4).collect()[0]
    assert fp["fp"] == h % (1 << 60) and fp["n_rows"] == 1


def _merged_target(spark, tmp, rows):
    from tests.helpers import bronze
    from dataplatform_cdc_pipeline_spark.engine import run_merge
    from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore

    cfg = user_state_config()
    t = ParquetMergeTarget(spark, f"{tmp}/t", cfg, USER_STATE_SCHEMA)
    audit = WatermarkStore(spark, f"{tmp}/a")
    run_merge(
        spark, cfg, t, audit, raw=bronze(spark, rows), window=(None, None),
        deterministic_audit=True,
    )
    return t


def test_reconcile_targets_prunes_to_differing_buckets(spark):
    rows_a = [("c", i, i, i, float(i)) for i in range(40)]
    # replica B is stale for exactly one key
    rows_b = [("c", i, i, i, float(i if i != 7 else 99)) for i in range(40)]
    ta = _merged_target(spark, tempfile.mkdtemp(prefix="rec_a_"), rows_a)
    tb = _merged_target(spark, tempfile.mkdtemp(prefix="rec_b_"), rows_b)
    diff, stats = reconcile_targets(
        ta, tb, cols=["event_type", "value", "k", "source_ts_ns_order", "pos"]
    )
    got = diff.collect()
    assert [(r["user_id"], r["status"]) for r in got] == [(7, "changed")]
    assert stats["n_buckets_differing"] == 1
    assert stats["n_buckets"] == ta.cfg.n_buckets


def test_reconcile_targets_identical_is_empty(spark):
    rows = [("c", i, i, i, float(i)) for i in range(10)]
    ta = _merged_target(spark, tempfile.mkdtemp(prefix="rec_i1_"), rows)
    tb = _merged_target(spark, tempfile.mkdtemp(prefix="rec_i2_"), rows)
    diff, stats = reconcile_targets(
        ta, tb, cols=["event_type", "value", "k", "source_ts_ns_order", "pos"]
    )
    assert diff.count() == 0
    assert stats["n_buckets_differing"] == 0


def test_reconcile_targets_config_mismatch_raises(spark):
    rows = [("c", 1, 1, 1, 1.0)]
    ta = _merged_target(spark, tempfile.mkdtemp(prefix="rec_m1_"), rows)
    cfg_b = user_state_config(pk="user_id,event_type")
    tb = ParquetMergeTarget(
        spark, tempfile.mkdtemp(prefix="rec_m2_") + "/t", cfg_b, USER_STATE_SCHEMA
    )
    with pytest.raises(ValueError, match="share pk"):
        reconcile_targets(ta, tb, cols=["value"])


# ---------------------------------------------------------------------------
# commit-time fingerprints on the snapshot sink (reconcile_snapshots)
# ---------------------------------------------------------------------------


def _snap_target(spark, tmp, batches, harvest=True):
    from tests.helpers import bronze
    from dataplatform_cdc_pipeline_spark.engine import run_merge
    from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
        SnapshotMergeTarget,
    )
    from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore

    cfg = user_state_config()
    t = SnapshotMergeTarget(spark, f"{tmp}/t", cfg, USER_STATE_SCHEMA)
    t.harvest_fingerprints = harvest
    audit = WatermarkStore(spark, f"{tmp}/a")
    for rows in batches:
        run_merge(
            spark, cfg, t, audit, raw=bronze(spark, rows), window=(None, None),
            deterministic_audit=True,
        )
    return t


def test_snapshot_reconcile_matches_scan_based(spark):
    from dataplatform_cdc_pipeline_spark.operators.reconcile import (
        reconcile_snapshots,
    )

    rows_a = [("c", i, i, i, float(i)) for i in range(30)]
    rows_b = [("c", i, i, i, float(i if i not in (3, 11) else -1)) for i in range(28)]
    ta = _snap_target(spark, tempfile.mkdtemp(prefix="snrec_a_"), [rows_a])
    tb = _snap_target(spark, tempfile.mkdtemp(prefix="snrec_b_"), [rows_b])
    cols = ["event_type", "value", "k", "source_ts_ns_order", "pos"]
    scan_diff, scan_stats = reconcile_targets(ta, tb, cols)
    fp_diff, fp_stats = reconcile_snapshots(ta, tb)
    key = lambda r: (r["user_id"], r["status"])
    assert sorted(map(key, fp_diff.collect())) == sorted(map(key, scan_diff.collect()))
    assert fp_stats["n_buckets_missing_fp"] == 0
    assert fp_stats["n_buckets_differing"] == scan_stats["n_buckets_differing"]
    got = {r["user_id"]: r["status"] for r in fp_diff.collect()}
    assert got[3] == "changed" and got[28] == "added" and got[29] == "added"


def test_fingerprints_carry_forward_across_commits(spark):
    # commit 1 covers all keys; commit 2 touches ONE key — unaffected
    # buckets must keep their stored fingerprints bit-identically
    batches = [[("c", i, i, i, float(i)) for i in range(30)]]
    t1 = _snap_target(spark, tempfile.mkdtemp(prefix="snfp1_"), batches)
    m1 = t1._manifest()
    from tests.helpers import bronze
    from dataplatform_cdc_pipeline_spark.engine import run_merge
    from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore

    run_merge(
        t1.spark, t1.cfg, t1,
        WatermarkStore(spark, tempfile.mkdtemp(prefix="snfp1a_")),
        raw=bronze(spark, [("u", 1000, 7, 7, 99.0)]), window=(None, None),
        deterministic_audit=True,
    )
    m2 = t1._manifest()
    assert m2["fp_cols"] == m1["fp_cols"]
    from dataplatform_cdc_pipeline_spark.operators.merge_target import bucket_expr
    b7 = (
        spark.createDataFrame([(7,)], "user_id long")
        .select(bucket_expr(["user_id"], t1.cfg.n_buckets).alias("b"))
        .collect()[0]["b"]
    )
    for b, v in m1["fps"].items():
        if int(b) != b7:
            assert m2["fps"][b] == v, f"unaffected bucket {b} fp drifted"
    assert m2["fps"][str(b7)] != m1["fps"][str(b7)]
    # every live bucket has an entry (no holes)
    assert set(m2["fps"]) == set(m2["buckets"])


def test_reconcile_snapshots_requires_fingerprints(spark):
    from dataplatform_cdc_pipeline_spark.operators.reconcile import (
        reconcile_snapshots,
    )

    rows = [("c", i, i, i, float(i)) for i in range(5)]
    ta = _snap_target(spark, tempfile.mkdtemp(prefix="snnf_a_"), [rows], harvest=False)
    tb = _snap_target(spark, tempfile.mkdtemp(prefix="snnf_b_"), [rows], harvest=True)
    with pytest.raises(ValueError, match="harvest_fingerprints"):
        reconcile_snapshots(ta, tb)


def test_reconcile_snapshots_fp_cols_mismatch_raises(spark):
    import json as _json
    import glob as _glob

    from dataplatform_cdc_pipeline_spark.operators.reconcile import (
        reconcile_snapshots,
    )

    rows = [("c", i, i, i, float(i)) for i in range(5)]
    ta = _snap_target(spark, tempfile.mkdtemp(prefix="snmm_a_"), [rows])
    tb = _snap_target(spark, tempfile.mkdtemp(prefix="snmm_b_"), [rows])
    mf = sorted(_glob.glob(f"{tb.path}/_log/*.json"))[-1]
    m = _json.load(open(mf))
    m["fp_cols"] = m["fp_cols"] + ["extra_col"]
    _json.dump(m, open(mf, "w"))
    with pytest.raises(ValueError, match="not comparable"):
        reconcile_snapshots(ta, tb)


def test_reconcile_snapshots_missing_bucket_fp_descends(spark):
    # drop one bucket's fingerprint from B's manifest: identical tables
    # must STILL reconcile clean, via a conservative descent of that bucket
    import json as _json
    import glob as _glob

    from dataplatform_cdc_pipeline_spark.operators.reconcile import (
        reconcile_snapshots,
    )

    rows = [("c", i, i, i, float(i)) for i in range(20)]
    ta = _snap_target(spark, tempfile.mkdtemp(prefix="snmiss_a_"), [rows])
    tb = _snap_target(spark, tempfile.mkdtemp(prefix="snmiss_b_"), [rows])
    mf = sorted(_glob.glob(f"{tb.path}/_log/*.json"))[-1]
    m = _json.load(open(mf))
    dropped = next(iter(m["fps"]))
    del m["fps"][dropped]
    _json.dump(m, open(mf, "w"))
    diff, stats = reconcile_snapshots(ta, tb)
    assert diff.count() == 0
    assert stats["n_buckets_missing_fp"] == 1
    assert stats["n_buckets_differing"] == 1
