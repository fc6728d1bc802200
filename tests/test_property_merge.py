"""Property-based differential test: the engine's merge vs a pure-Python
reference simulator, over randomized event sequences (hypothesis).

All scenarios are packed into ONE bronze frame (disjoint key spaces per
scenario) so a single Spark merge checks dozens of generated cases — the
per-example Spark overhead would otherwise dominate.
"""

import datetime
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from dataplatform_cdc_pipeline_spark.engine import run_merge
from tests.helpers import BASE_NS, pipeline

event_st = st.tuples(
    st.sampled_from(["c", "u", "d"]),  # op
    st.integers(min_value=0, max_value=5),  # key within scenario
    st.integers(min_value=0, max_value=20),  # event-ts (µs offset, small → ties)
    st.floats(min_value=0, max_value=100, allow_nan=False, width=32),
)

scenario_st = st.lists(event_st, min_size=1, max_size=12)


def simulate(events):
    """Reference semantics: latest (ts, pos) event per key wins; 'd' wins
    removal. Exactly merge.sql:310 ordering + §7 unified-plan semantics."""
    latest = {}
    for pos, (op, key, ts, value) in enumerate(events):
        cur = latest.get(key)
        if cur is None or (ts, pos) > (cur[0], cur[1]):
            latest[key] = (ts, pos, op, value)
    return {
        k: (v[3], v[1]) for k, v in latest.items() if v[2] != "d"
    }


@settings(max_examples=12, deadline=None)
@given(st.lists(scenario_st, min_size=1, max_size=10))
def test_merge_matches_python_simulator(spark_sess, scenarios):
    rows = []
    expected = {}
    for si, events in enumerate(scenarios):
        base_key = si * 1000
        for pos, (op, key, ts, value) in enumerate(events):
            uid = base_key + key
            gpos = si * 100 + pos  # globally unique, scenario-ordered pos
            payload = json.dumps(
                {
                    "__op": op,
                    "__ts_ns": str(BASE_NS + ts * 1000),
                    "__source_pos": str(gpos),
                    "user_id": uid,
                    "event_type": "t",
                    "value": round(float(value), 3),
                    "k": 1,
                }
            )
            rows.append((payload, datetime.datetime(2024, 1, 1)))
        for key, (value, _pos) in simulate(events).items():
            expected[base_key + key] = round(float(value), 3)

    raw = spark_sess.createDataFrame(rows, "data string, load_ts timestamp")
    cfg, target, audit = pipeline(spark_sess)
    run_merge(spark_sess, cfg, target, audit, raw=raw, window=(None, None),
              deterministic_audit=True)
    got = {
        r["user_id"]: round(r["value"], 3)
        for r in target.read().select("user_id", "value").collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(scenario_st, min_size=1, max_size=6),
    st.booleans(),  # update_only_op_u
    st.booleans(),  # strict_ts_guard
)
def test_ivm_view_matches_fresh_recompute(spark_sess, scenarios, op_u, guard):
    """Differential IVM property: a (count, Σ value-micros) view maintained
    through TWO windowed merges — under randomly drawn gate flags — always
    equals a fresh GROUP BY of the final target. This is the invariant the
    resolve-predicate sharing exists to guarantee: blocked updates, late
    replays, deletes of never-seen keys, ties — whatever hypothesis finds,
    maintenance and recomputation must agree."""
    from pyspark.sql import functions as F

    from dataplatform_cdc_pipeline_spark.operators.ivm import maintain_view_through_merge
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import build_changes, window_scan
    from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA

    rows = []
    for si, events in enumerate(scenarios):
        for pos, (op, key, ts, value) in enumerate(events):
            gpos = si * 100 + pos
            payload = json.dumps(
                {
                    "__op": op,
                    "__ts_ns": str(BASE_NS + ts * 1000),
                    "__source_pos": str(gpos),
                    "user_id": si * 1000 + key,
                    # two groups so the view has real group structure
                    "event_type": "a" if key % 2 == 0 else "b",
                    "value": round(float(value), 3),
                    "k": 1,
                }
            )
            # load_ts tracks gpos → a mid-stream window split is stable
            rows.append((payload, datetime.datetime(2024, 1, 1)
                         + datetime.timedelta(seconds=gpos)))

    raw = spark_sess.createDataFrame(rows, "data string, load_ts timestamp")
    cfg, target, audit = pipeline(
        spark_sess, update_only_op_u=op_u, strict_ts_guard=guard
    )
    sums = {"value_micros": F.floor(F.col("value") * 1e6).cast("long")}
    split = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=250)
    view = None
    for lo, hi in ((None, split), (split, None)):
        w = window_scan(raw, cfg, lo, hi)
        changes = build_changes(w, USER_STATE_SCHEMA, cfg, deterministic_audit=True)
        view, _ = maintain_view_through_merge(target, changes, view, "event_type", sums)

    maintained = {
        r["event_type"]: (r["n"], r["value_micros"]) for r in view.collect()
    }
    fresh = {
        r["event_type"]: (r["n"], r["value_micros"])
        for r in target.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.floor(F.col("value") * 1e6).cast("long")), F.lit(0)
            ).alias("value_micros"),
        )
        .collect()
    }
    assert maintained == fresh


# hypothesis needs a module-scope fixture handle; reuse the session fixture
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_sess(spark):
    return spark


@settings(max_examples=6, deadline=None)
@given(
    st.lists(scenario_st, min_size=1, max_size=6),
    st.booleans(),  # update_only_op_u
    st.booleans(),  # strict_ts_guard
)
def test_ivm_minmax_matches_fresh_recompute(spark_sess, scenarios, op_u, guard):
    """Differential property for the NON-invertible IVM path: a
    (count, min, max) view maintained via endangered-group bounded
    recompute through two windowed merges — under random gate flags —
    always equals a fresh GROUP BY of the final target. Hypothesis's job
    here is to find removals that tie extremes, groups that empty, keys
    that hop groups, and gate-blocked changes."""
    from pyspark.sql import functions as F

    from dataplatform_cdc_pipeline_spark.operators.ivm import (
        maintain_minmax_through_merge,
    )
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import build_changes, window_scan
    from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA

    rows = []
    for si, events in enumerate(scenarios):
        for pos, (op, key, ts, value) in enumerate(events):
            gpos = si * 100 + pos
            payload = json.dumps(
                {
                    "__op": op,
                    "__ts_ns": str(BASE_NS + ts * 1000),
                    "__source_pos": str(gpos),
                    "user_id": si * 1000 + key,
                    "event_type": "a" if key % 2 == 0 else "b",
                    "value": round(float(value), 3),
                    "k": 1,
                }
            )
            rows.append(
                (payload, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=gpos))
            )

    raw = spark_sess.createDataFrame(rows, "data string, load_ts timestamp")
    cfg, target, audit = pipeline(
        spark_sess, update_only_op_u=op_u, strict_ts_guard=guard
    )
    split = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=250)
    view = None
    for lo, hi in ((None, split), (split, None)):
        w = window_scan(raw, cfg, lo, hi)
        changes = build_changes(w, USER_STATE_SCHEMA, cfg, deterministic_audit=True)
        view, _ = maintain_minmax_through_merge(
            target, changes, view, "event_type", "value"
        )

    maintained = {
        r["event_type"]: (r["n"], r["min_v"], r["max_v"]) for r in view.collect()
    }
    fresh = {
        r["event_type"]: (r["n"], r["min_v"], r["max_v"])
        for r in target.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .collect()
    }
    assert maintained == fresh


# ---------------------------------------------------------------------------
# DLQ split (plans/quarantine.py) vs the same simulator on clean rows only
# ---------------------------------------------------------------------------

poisoned_event_st = st.tuples(event_st, st.booleans())


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(poisoned_event_st, min_size=1, max_size=12),
                min_size=1, max_size=8))
def test_dlq_split_matches_clean_only_simulation(spark_sess, scenarios):
    """Quarantine-mode merge == the reference simulator run on the CLEAN
    subsequence: a poisoned row (uncastable value) never merges — even a
    poisoned DELETE does not delete — and the DLQ holds exactly the
    poisoned positions, each tagged with the failing column."""
    from dataplatform_cdc_pipeline_spark.operators.merge_target import (
        ParquetMergeTarget,
    )
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import (
        build_changes,
        window_scan,
    )
    from dataplatform_cdc_pipeline_spark.plans.quarantine import quarantine_split
    from dataplatform_cdc_pipeline_spark.sources.cdc import (
        USER_STATE_SCHEMA,
        user_state_config,
    )
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    import tempfile
    import uuid

    rows, expected, expected_dlq = [], {}, set()
    for si, events in enumerate(scenarios):
        base_key = si * 1000
        clean_events = []
        for pos, ((op, key, ts, value), bad) in enumerate(events):
            gpos = si * 100 + pos
            payload = json.dumps(
                {
                    "__op": op,
                    "__ts_ns": str(BASE_NS + ts * 1000),
                    "__source_pos": str(gpos),
                    "user_id": base_key + key,
                    "event_type": "t",
                    "value": "oops" if bad else round(float(value), 3),
                    "k": 1,
                }
            )
            rows.append((payload, datetime.datetime(2024, 1, 1)))
            if bad:
                expected_dlq.add(gpos)
            else:
                clean_events.append((op, key, ts, pos, value))
        latest = {}
        for op, key, ts, pos, value in clean_events:
            cur = latest.get(key)
            if cur is None or (ts, pos) > (cur[0], cur[1]):
                latest[key] = (ts, pos, op, value)
        for k, v in latest.items():
            if v[2] != "d":
                expected[base_key + k] = round(float(v[3]), 3)

    raw = spark_sess.createDataFrame(rows, "data string, load_ts timestamp")
    cfg = user_state_config()
    cfg_q = user_state_config(target_table="q", pk="q_pos")
    q_schema = T.StructType(
        [
            T.StructField("q_pos", T.LongType()),
            T.StructField("qerror", T.StringType()),
            T.StructField("data", T.StringType()),
        ]
    )
    d = f"{tempfile.mkdtemp(prefix='dlq_prop_')}/{uuid.uuid4().hex[:6]}"
    target = ParquetMergeTarget(spark_sess, f"{d}/t", cfg, USER_STATE_SCHEMA)
    dlq = ParquetMergeTarget(spark_sess, f"{d}/q", cfg_q, q_schema)
    w = window_scan(raw, cfg, None, None)
    clean, quarantined = quarantine_split(w, USER_STATE_SCHEMA, cfg)
    target.merge(build_changes(clean, USER_STATE_SCHEMA, cfg, deterministic_audit=True))
    dlq.merge(
        quarantined.select(
            F.col("__pos").alias("q_pos"),
            F.concat_ws(",", "__qerrors").alias("qerror"),
            "data",
            F.lit(None).cast("timestamp").alias("source_ts_ns_order"),
            F.col("__pos").alias("pos"),
            F.lit("c").alias("__op"),
        )
    )
    got = {
        r["user_id"]: round(r["value"], 3)
        for r in target.read().select("user_id", "value").collect()
    }
    assert got == expected
    got_dlq = {
        (r["q_pos"], r["qerror"])
        for r in dlq.read().select("q_pos", "qerror").collect()
    }
    assert got_dlq == {(p, "value") for p in expected_dlq}
