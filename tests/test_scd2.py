"""SCD Type 2 history sink (operators/scd2.py): full-batch derivation
semantics, incremental close-and-append equivalence to full rebuild,
in-order enforcement, Type-1/as-of views, and storage-lifecycle reuse
(bucket pruning, idempotent-by-rebuild, compaction)."""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.scd2 import (
    SCD_IS_CURRENT,
    SCD_VALID_TO,
    Scd2Target,
    scd2_history,
)
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

from test_merge_target_contract import BASE, changes


def make(spark, tmp_path, **cfg_kwargs):
    cfg = user_state_config(**cfg_kwargs)
    return Scd2Target(spark, str(tmp_path / "scd2"), cfg, USER_STATE_SCHEMA)


def versions(df):
    """(user_id, value, from_s, to_s, is_current) sorted — seconds offset
    from BASE for readability."""
    rows = df.select(
        "user_id",
        "value",
        F.unix_micros("source_ts_ns_order").alias("f"),
        F.unix_micros(SCD_VALID_TO).alias("t"),
        SCD_IS_CURRENT,
    ).collect()
    b = int(BASE.timestamp() * 1_000_000)
    return sorted(
        (
            r["user_id"],
            r["value"],
            (r["f"] - b) // 1_000_000,
            None if r["t"] is None else (r["t"] - b) // 1_000_000,
            r[SCD_IS_CURRENT],
        )
        for r in rows
    )


def test_scd2_history_full_batch_semantics(spark):
    """c → u → u: three versions chained by valid_to; d closes without a
    row; re-insert after delete opens a fresh version; a lone delete
    leaves no history."""
    ev = changes(
        spark,
        [
            ("c", 1, 1.0, 0, 1),
            ("u", 1, 2.0, 10, 2),
            ("u", 1, 3.0, 20, 3),
            ("c", 2, 9.0, 0, 4),
            ("d", 2, 0.0, 30, 5),
            ("c", 2, 10.0, 40, 6),
            ("d", 3, 0.0, 5, 7),  # delete of never-seen key: nothing
        ],
    )
    out = versions(scd2_history(ev, ["user_id"]))
    assert out == [
        (1, 1.0, 0, 10, False),
        (1, 2.0, 10, 20, False),
        (1, 3.0, 20, None, True),
        (2, 9.0, 0, 30, False),  # closed BY the delete, no successor row
        (2, 10.0, 40, None, True),  # re-insert opens fresh
    ]


def test_scd2_target_incremental_equals_full_rebuild(spark, tmp_path):
    rows = [
        ("c", 1, 1.0, 0, 1),
        ("c", 2, 5.0, 1, 2),
        ("u", 1, 2.0, 10, 3),
        ("d", 2, 0.0, 12, 4),
        ("u", 1, 3.0, 20, 5),
        ("c", 2, 7.0, 25, 6),
        ("u", 2, 8.0, 30, 7),
    ]
    t = make(spark, tmp_path)
    t.merge(changes(spark, rows[:4]))
    stats = t.merge(changes(spark, rows[4:]))
    assert stats == {
        "records_inserted": 3,
        "records_deleted": 0,
        "cdc_start_ts": BASE + datetime.timedelta(seconds=5),
        "cdc_end_ts": BASE + datetime.timedelta(seconds=7),
    }
    assert versions(t.read()) == versions(scd2_history(changes(spark, rows), ["user_id"]))
    assert t.pending_commit() is None


def test_scd2_views_current_and_as_of(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge(
        changes(
            spark,
            [
                ("c", 1, 1.0, 0, 1),
                ("u", 1, 2.0, 10, 2),
                ("c", 2, 5.0, 0, 3),
                ("d", 2, 0.0, 20, 4),
            ],
        )
    )
    cur = {(r["user_id"], r["value"]) for r in t.current().collect()}
    assert cur == {(1, 2.0)}  # key 2 deleted → no current row
    asof = {
        (r["user_id"], r["value"])
        for r in t.as_of(BASE + datetime.timedelta(seconds=5)).collect()
    }
    assert asof == {(1, 1.0), (2, 5.0)}  # state as of t=5s
    # boundary: as_of exactly at a version start picks the NEW version
    at10 = {
        (r["user_id"], r["value"])
        for r in t.as_of(BASE + datetime.timedelta(seconds=10)).collect()
    }
    assert at10 == {(1, 2.0), (2, 5.0)}


def test_scd2_out_of_order_batch_raises(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge(changes(spark, [("c", 1, 1.0, 10, 1)]))
    with pytest.raises(ValueError, match="out-of-order"):
        t.merge(changes(spark, [("u", 1, 2.0, 5, 2)]))  # before recorded ts
    with pytest.raises(ValueError, match="out-of-order"):
        t.merge(changes(spark, [("u", 1, 2.0, 10, 3)]))  # tie is also refused
    # the refused batches left no trace
    assert versions(t.read()) == [(1, 1.0, 10, None, True)]
    # other keys in a clean batch are unaffected by history elsewhere
    t.merge(changes(spark, [("c", 2, 9.0, 0, 4)]))
    assert (2, 9.0, 0, None, True) in versions(t.read())


def test_scd2_property_random_split_equivalence(spark):
    """Any in-order event stream split into two batches: incremental
    apply == full-batch derivation (the incremental path cannot drift)."""
    rng = random.Random(7)
    for trial in range(3):
        rows = []
        pos = 0
        for sec in range(0, 40, 2):
            for uid in range(1, 5):
                if rng.random() < 0.45:
                    pos += 1
                    op = rng.choice(["c", "u", "u", "d"])
                    rows.append((op, uid, float(pos), sec, pos))
        if not rows:
            continue
        split = rng.randrange(1, len(rows))
        # keep batches in-order per key: split on time, not row index
        cut = rows[split][3]
        b1 = [r for r in rows if r[3] <= cut]
        b2 = [r for r in rows if r[3] > cut]
        import tempfile

        t = Scd2Target(
            spark,
            tempfile.mkdtemp(prefix="scd2_prop_") + "/t",
            user_state_config(),
            USER_STATE_SCHEMA,
        )
        t.merge(changes(spark, b1))
        if b2:
            t.merge(changes(spark, b2))
        assert versions(t.read()) == versions(
            scd2_history(changes(spark, rows), ["user_id"])
        ), f"trial {trial}"


def test_scd2_refuses_type1_gates_and_prunes_buckets(spark, tmp_path):
    with pytest.raises(ValueError, match="Type-1"):
        make(spark, tmp_path, update_only_op_u=True)
    t = make(spark, tmp_path, n_buckets=8)
    t.merge(changes(spark, [("c", k, float(k), 0, k) for k in range(1, 30)]))
    from dataplatform_cdc_pipeline_spark.operators.merge_target import bucket_expr

    b7 = (
        spark.createDataFrame([(7,)], "user_id long")
        .select(bucket_expr(["user_id"], 8).alias("b"))
        .first()["b"]
    )
    pruned = t.read(buckets=[b7])
    assert (7, 7.0) in {(r["user_id"], r["value"]) for r in pruned.collect()}
    # compaction reuses the parent lifecycle over history rows
    assert t.compact() == 29
    assert len(versions(t.read())) == 29


def test_scd2_null_pk_versions(spark, tmp_path):
    """NULL-PK events form their own version chain (Window.partitionBy
    groups NULLs; close-join is eqNullSafe)."""
    t = make(spark, tmp_path)
    b1 = changes(spark, [("c", 1, 1.0, 0, 1)]).withColumn(
        "user_id", F.lit(None).cast("long")
    )
    b2 = changes(spark, [("u", 1, 2.0, 10, 2)]).withColumn(
        "user_id", F.lit(None).cast("long")
    )
    t.merge(b1)
    t.merge(b2)
    assert versions(t.read()) == [
        (None, 1.0, 0, 10, False),
        (None, 2.0, 10, None, True),
    ]


def test_snapshot_scd2_time_travel_and_atomic_commits(spark, tmp_path):
    """The SCD2 x snapshot composition: version 1 = history after batch
    1, version 2 = history after batch 2 (batch 2's close of batch 1's
    open rows is invisible at version 1) — time travel over the version
    CHAIN itself. Final history equals the swap-sink SCD2 and the
    full-batch derivation."""
    from dataplatform_cdc_pipeline_spark.operators.scd2 import snapshot_scd2_target

    cfg = user_state_config()
    t = snapshot_scd2_target(spark, str(tmp_path / "s2"), cfg, USER_STATE_SCHEMA)
    b1 = [("c", 1, 1.0, 0, 1), ("c", 2, 5.0, 1, 2)]
    b2 = [("u", 1, 2.0, 10, 3), ("d", 2, 0.0, 12, 4)]
    t.merge(changes(spark, b1))
    t.merge(changes(spark, b2))
    assert t._read_version() == 2

    def vers(df):
        return sorted(
            (r["user_id"], r["value"], r[SCD_VALID_TO] is None, r[SCD_IS_CURRENT])
            for r in df.collect()
        )

    # version 1: both keys open, nothing closed
    assert vers(t.read(version=1)) == [(1, 1.0, True, True), (2, 5.0, True, True)]
    # version 2 == full-batch derivation over b1+b2
    full = scd2_history(changes(spark, b1 + b2), ["user_id"])
    assert vers(t.read()) == vers(full.select(*[f.name for f in t.schema.fields]))
    # vacuum keeps the latest snapshot readable
    t.vacuum(retain_last=1)
    assert len(vers(t.read())) == 3


def test_scd2_asof_equals_type1_merge_state(spark, tmp_path):
    """Cross-sink invariant: the SCD2 table's as_of(T) view equals the
    Type-1 merge state built from only the events at or before T — the
    two sinks are projections of the same event stream."""
    import tempfile as _tf

    from dataplatform_cdc_pipeline_spark.operators.merge_target import (
        ParquetMergeTarget,
    )

    rows = [
        ("c", 1, 1.0, 0, 1), ("c", 2, 5.0, 1, 2), ("u", 1, 2.0, 10, 3),
        ("d", 2, 0.0, 12, 4), ("u", 1, 3.0, 20, 5), ("c", 2, 7.0, 25, 6),
    ]
    t2 = make(spark, tmp_path)
    t2.merge(changes(spark, rows))
    for cut_s in (0, 5, 12, 19, 25, 99):
        cut = BASE + datetime.timedelta(seconds=cut_s)
        t1 = ParquetMergeTarget(
            spark, _tf.mkdtemp(prefix="scd2_inv_") + "/t",
            user_state_config(), USER_STATE_SCHEMA,
        )
        upto = [r for r in rows if r[3] <= cut_s]
        if upto:
            # Type-1 contract wants a deduped change set: keep the latest
            # event per key
            latest = {}
            for r in sorted(upto, key=lambda r: (r[3], r[4])):
                latest[r[1]] = r
            t1.merge(changes(spark, list(latest.values())))
        want = sorted(
            (r["user_id"], r["value"]) for r in t1.read().collect()
        )
        got = sorted(
            (r["user_id"], r["value"]) for r in t2.as_of(cut).collect()
        )
        assert got == want, f"cut at {cut_s}s"


# ---------------------------------------------------------------------------
# point_in_time_join — temporal fact enrichment
# ---------------------------------------------------------------------------


def _facts(spark, rows):
    """rows: (user_id, fact_pos, ts_off_s)"""
    data = [
        (uid, pos, BASE + datetime.timedelta(seconds=off))
        for uid, pos, off in rows
    ]
    return spark.createDataFrame(data, "user_id long, fact_pos long, fact_ts timestamp")


def _enriched(spark, events, facts, how="inner"):
    from dataplatform_cdc_pipeline_spark.operators.scd2 import point_in_time_join

    hist = scd2_history(changes(spark, events), ["user_id"])
    j = point_in_time_join(
        _facts(spark, facts), hist, ["user_id"], "fact_ts", how=how
    )
    b = int(BASE.timestamp())
    return sorted(
        (
            r["user_id"],
            r["fact_pos"],
            r["dim_value"],
            None
            if r["dim_valid_from"] is None
            else int(r["dim_valid_from"].timestamp()) - b,
        )
        for r in j.select("user_id", "fact_pos", "dim_value", "dim_valid_from").collect()
    )


def test_pit_join_selects_covering_version(spark):
    ev = [("c", 1, 1.0, 0, 1), ("u", 1, 2.0, 10, 2), ("u", 1, 3.0, 20, 3)]
    # facts at t=5 (v1), t=10 (exactly at v2 open: half-open → v2),
    # t=25 (open version v3)
    got = _enriched(spark, ev, [(1, 100, 5), (1, 101, 10), (1, 102, 25)])
    assert got == [(1, 100, 1.0, 0), (1, 101, 2.0, 10), (1, 102, 3.0, 20)]


def test_pit_join_delete_gap_drops_fact(spark):
    ev = [("c", 1, 1.0, 0, 1), ("d", 1, None, 10, 2), ("c", 1, 5.0, 20, 3)]
    # t=15 falls in the deleted gap → inner drops it; t=5 and t=20 match
    got = _enriched(spark, ev, [(1, 100, 5), (1, 101, 15), (1, 102, 20)])
    assert got == [(1, 100, 1.0, 0), (1, 102, 5.0, 20)]


def test_pit_join_left_keeps_unmatched_fact(spark):
    ev = [("c", 1, 1.0, 10, 1)]
    # fact BEFORE the first version exists; left join keeps it with NULL dim
    got = _enriched(spark, ev, [(1, 100, 5)], how="left")
    assert got == [(1, 100, None, None)]


def test_pit_join_at_most_one_version_per_fact(spark):
    # same-instant tie: two events at t=10 → first version has an EMPTY
    # half-open interval; exactly one version covers any probe
    ev = [("c", 1, 1.0, 10, 1), ("u", 1, 2.0, 10, 2), ("u", 1, 3.0, 30, 3)]
    got = _enriched(spark, ev, [(1, 100, 10), (1, 101, 30), (1, 102, 40)])
    assert got == [(1, 100, 2.0, 10), (1, 101, 3.0, 30), (1, 102, 3.0, 30)]


def test_pit_join_plan_is_equi_join_no_cross_product(spark):
    from dataplatform_cdc_pipeline_spark.operators.scd2 import point_in_time_join

    ev = [("c", i, 1.0, 0, i) for i in range(1, 6)]
    hist = scd2_history(changes(spark, ev), ["user_id"])
    j = point_in_time_join(
        _facts(spark, [(1, 100, 5)]), hist, ["user_id"], "fact_ts"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
