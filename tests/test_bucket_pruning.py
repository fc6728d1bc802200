"""S6-analogue: the bucketed merge target rewrites ONLY affected bucket
partitions (the engine's partition-pruning story, cf. step-8:352-377)."""

import glob
import os

from dataplatform_cdc_pipeline_spark.engine import run_merge
from dataplatform_cdc_pipeline_spark.operators.merge_target import BUCKET_COL, bucket_expr
from tests.helpers import bronze, pipeline, state


def bucket_files(path):
    out = {}
    for d in glob.glob(os.path.join(path, f"{BUCKET_COL}=*")):
        b = int(d.split("=")[-1])
        out[b] = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    return out


def test_merge_rewrites_only_affected_buckets(spark):
    cfg, target, audit = pipeline(spark)
    # seed: keys spread across many buckets
    seed = [("c", i, i, i, float(i)) for i in range(1, 40)]
    run_merge(spark, cfg, target, audit, raw=bronze(spark, seed), window=(None, None),
              deterministic_audit=True)
    before = bucket_files(target.path)
    assert len(before) > 4  # actually spread over multiple buckets

    # single-key update → exactly one affected bucket
    run_merge(spark, cfg, target, audit, raw=bronze(spark, [("u", 50, 50, 7, 777.0)]),
              window=(None, None), deterministic_audit=True)
    after = bucket_files(target.path)

    changed = {
        b
        for b in set(before) | set(after)
        if before.get(b) != after.get(b)
    }
    # compute key 7's bucket the same way the engine does
    b7 = (
        spark.createDataFrame([(7,)], "user_id long")
        .select(bucket_expr(["user_id"], cfg.n_buckets).alias("b"))
        .first()["b"]
    )
    assert changed == {b7}
    assert (7, 777.0) in state(target)


def test_pruned_read_lists_only_requested_buckets(spark):
    cfg, target, audit = pipeline(spark)
    run_merge(spark, cfg, target, audit,
              raw=bronze(spark, [("c", i, i, i, float(i)) for i in range(1, 30)]),
              window=(None, None), deterministic_audit=True)
    some_bucket = int(sorted(bucket_files(target.path))[0])
    pruned = target.read(buckets=[some_bucket])
    # partition pruning is plan-level: the scan must carry a PartitionFilters
    # entry on __bucket (inputFiles() is not filter-aware)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and BUCKET_COL in plan.split("PartitionFilters", 1)[1][:200]
    rows = pruned.count()
    total = target.read().count()
    assert 0 < rows < total


def test_date_partitioned_layout_and_pruned_read(spark):
    """cfg.partition_field (bq_partition_field parity) adds a DATE layer to
    the bucket layout; a date_range read prunes it in PartitionFilters and
    returns exactly the rows whose partition date is inside the range."""
    import datetime

    from dataplatform_cdc_pipeline_spark.operators.merge_target import PDATE_COL

    cfg, target, audit = pipeline(spark, partition_field="source_ts_ns_order")
    # events on distinct days: ts offsets are microseconds after 2024-01-01
    day_us = 86_400_000_000
    rows = [("c", i * day_us, i, i, float(i)) for i in range(10)]  # Jan 1..10
    run_merge(spark, cfg, target, audit, raw=bronze(spark, rows),
              window=(None, None), deterministic_audit=True)

    # the physical layout carries the date layer inside each bucket
    nested = glob.glob(os.path.join(target.path, f"{BUCKET_COL}=*", f"{PDATE_COL}=*"))
    assert nested, "expected __bucket=*/__pdate=* directories"

    pruned = target.read(date_range=("2024-01-03", "2024-01-05"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert PDATE_COL in plan.split("PartitionFilters", 1)[1][:300]
    got = sorted(r["user_id"] for r in pruned.collect())
    assert got == [2, 3, 4]  # offsets 2,3,4 days → Jan 3,4,5

    # partition columns never leak into the returned schema
    assert PDATE_COL not in pruned.columns and BUCKET_COL not in pruned.columns

    # full read (no range) still returns everything
    assert target.read().count() == 10


def test_date_range_requires_partition_field(spark):
    import pytest

    cfg, target, audit = pipeline(spark)
    run_merge(spark, cfg, target, audit, raw=bronze(spark, [("c", 0, 1, 1, 1.0)]),
              window=(None, None), deterministic_audit=True)
    with pytest.raises(ValueError, match="partition_field"):
        target.read(date_range=("2024-01-01", "2024-01-02"))


def test_clustering_fields_sort_within_files(spark):
    """bq_clustering_field parity: rows inside each bucket file are sorted
    by the clustering columns, so parquet row-group min/max stats are
    narrow (the scan-skipping layout BigQuery clustering provides)."""
    import pyarrow.parquet as pq

    cfg, target, audit = pipeline(spark, clustering_fields=("value",))
    rows = [("c", i, i, i, float((i * 37) % 101)) for i in range(1, 60)]
    run_merge(spark, cfg, target, audit, raw=bronze(spark, rows),
              window=(None, None), deterministic_audit=True)

    files = glob.glob(os.path.join(target.path, f"{BUCKET_COL}=*", "*.parquet"))
    assert files
    checked = 0
    for f in files:
        vals = pq.read_table(f, columns=["value"])["value"].to_pylist()
        if len(vals) > 1:
            assert vals == sorted(vals), f
            checked += 1
    assert checked > 0  # at least one multi-row file proved the ordering


def test_clustering_fields_must_be_target_columns(spark):
    import pytest

    with pytest.raises(ValueError, match="clustering_fields"):
        pipeline(spark, clustering_fields=("nope",))


def test_target_compact_merges_date_files(spark):
    """compact() on a date-partitioned target preserves state byte-for-byte
    and guarantees one file per (bucket, date) leaf. (Measured r5: the
    write path itself never fragments a leaf — each merge swaps whole
    bucket dirs with one task per bucket — so this pins the invariant
    compact must restore after any out-of-band writer, while re-bucketing
    is the lifecycle compaction actually exists for; see the rebucket
    lifecycle test below.)"""
    cfg, target, audit = pipeline(spark, partition_field="source_ts_ns_order")
    day_us = 86_400_000_000
    # two merges over the same days
    run_merge(spark, cfg, target, audit,
              raw=bronze(spark, [("c", i * day_us, i, i, float(i)) for i in range(1, 9)]),
              window=(None, None), deterministic_audit=True)
    run_merge(spark, cfg, target, audit,
              raw=bronze(spark, [("u", i * day_us, 100 + i, i, float(i * 10)) for i in range(1, 9)]),
              window=(None, None), deterministic_audit=True)
    before = sorted(state(target))

    n = target.compact()
    assert n == 8
    assert sorted(state(target)) == before
    # every (bucket, date) leaf now holds exactly one parquet file
    from dataplatform_cdc_pipeline_spark.operators.merge_target import PDATE_COL
    leaves = glob.glob(os.path.join(target.path, f"{BUCKET_COL}=*", f"{PDATE_COL}=*"))
    assert leaves
    for d in leaves:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    assert target.pending_commit() is None


def test_compact_rebucket_lifecycle_small_files_to_pruned_read(spark):
    """The maintenance lifecycle compact() actually exists for: bucket
    count follows table size, so an over-bucketed target (64 buckets of
    tiny files) is reconstructed under a right-sized config (8) —
    ``compact()`` redistributes every row with the NEW bucket function,
    the file count drops, state is byte-identical, and bucket-pruned
    reads under the new config stay correct (PartitionFilters pinned).
    Also covers the growth direction (8 → 64): a staged bucket with no
    same-id predecessor directory must still land (swap-set bug class)."""
    from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
    from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

    cfg64, target64, audit = pipeline(spark, n_buckets=64)
    rows = [("c", i, i, i, float(i)) for i in range(1, 41)]
    run_merge(spark, cfg64, target64, audit, raw=bronze(spark, rows),
              window=(None, None), deterministic_audit=True)

    def parquet_files(path):
        return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)

    before_files = len(parquet_files(target64.path))
    before_state = sorted(state(target64))
    assert before_files > 20  # over-bucketed: ~one tiny file per key group

    # reconfigure to 8 buckets and compact under the new layout
    cfg8 = user_state_config(n_buckets=8)
    target8 = ParquetMergeTarget(spark, target64.path, cfg8, USER_STATE_SCHEMA)
    assert target8.compact() == 40
    after_files = len(parquet_files(target8.path))
    assert after_files <= 8 and after_files < before_files
    assert sorted(state(target8)) == before_state
    assert target8.pending_commit() is None

    # bucket-pruned read under the NEW config finds key 7 where the new
    # bucket function says it lives
    b7 = (
        spark.createDataFrame([(7,)], "user_id long")
        .select(bucket_expr(["user_id"], 8).alias("b"))
        .first()["b"]
    )
    pruned = target8.read(buckets=[b7])
    assert (7, 7.0) in {(r["user_id"], r["value"]) for r in pruned.select("user_id", "value").collect()}
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and BUCKET_COL in plan.split("PartitionFilters", 1)[1][:200]

    # growth direction: 8 → 64 must not lose rows whose new bucket id had
    # no old directory
    target64b = ParquetMergeTarget(spark, target8.path, cfg64, USER_STATE_SCHEMA)
    assert target64b.compact() == 40
    assert sorted(state(target64b)) == before_state
    # follow-up merge under the new layout keeps working
    run_merge(spark, cfg64, target64b, audit, raw=bronze(spark, [("u", 50, 50, 7, 777.0)]),
              window=(None, None), deterministic_audit=True)
    assert (7, 777.0) in state(target64b)


def test_target_vacuum_removes_orphan_staging(spark, tmp_path):
    cfg, target, audit = pipeline(spark, tmpdir=str(tmp_path))
    run_merge(spark, cfg, target, audit, raw=bronze(spark, [("c", 0, 1, 1, 1.0)]),
              window=(None, None), deterministic_audit=True)
    # fake a crashed commit's leftover staging tree
    orphan = f"{target.path}.staging-deadbeef"
    os.makedirs(f"{orphan}/{BUCKET_COL}=0")
    removed = target.vacuum()
    assert removed == [orphan] and not os.path.isdir(orphan)
    assert (1, 1.0) in state(target)  # live data untouched


def test_target_path_trailing_slash_normalized(spark, tmp_path):
    """A trailing-slash target path must stage SIBLING '<base>.staging-*'
    dirs (not '<path>/.staging-*' inside the target) so vacuum() finds
    orphans and readers never scan half-written staging files."""
    from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
    from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
    from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

    cfg = user_state_config()
    target = ParquetMergeTarget(spark, str(tmp_path / "t") + "/", cfg, USER_STATE_SCHEMA)
    assert not target.path.endswith("/")
    audit = WatermarkStore(spark, str(tmp_path / "a"))
    run_merge(spark, cfg, target, audit, raw=bronze(spark, [("c", 0, 1, 1, 1.0)]),
              window=(None, None), deterministic_audit=True)
    # nothing staged inside the target; a crashed-commit orphan IS found
    assert not [e for e in os.listdir(target.path) if ".staging-" in e]
    orphan = f"{target.path}.staging-cafe0000"
    os.makedirs(f"{orphan}/{BUCKET_COL}=0")
    assert target.vacuum() == [orphan] and not os.path.isdir(orphan)
    assert (1, 1.0) in state(target)
