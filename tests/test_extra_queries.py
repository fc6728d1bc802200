"""Hand-computed pins for the round-6 closing-wave queries
(queries_extra.py): LOCF time-weighted average, market-basket lift, KMV
set operations, and hashed features — tiny inputs with answers worked
out on paper, complementing the sf0.01 DuckDB-oracle gate."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us_offset, user_id, event_type, value, props)
    → a testdata-shaped dir holding just events.parquet (epoch base
    2024-01-01 UTC)."""
    base = datetime.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(microseconds=r[1]) for r in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_time_weighted_hand_computed(spark, tmp_path):
    """User 1 holds 10.0 for 2 s then 20.0 for 1 s → TWA = 40/3 =
    13.333333 (micro-floor 13_333_333), which a plain AVG over the three
    samples (10+20+99)/3 = 43 would get badly wrong; user 2 has one
    event → no span → absent; a tie-ts pair contributes a zero-length
    segment and cannot shift the answer."""
    from dataplatform_cdc_pipeline_spark.queries_extra import q_events_time_weighted

    s = 1_000_000  # 1 second in µs
    d = _write_events(
        tmp_path,
        [
            (1, 0 * s, 1, "a", 10.0, "{}"),
            (2, 2 * s, 1, "a", 20.0, "{}"),
            (3, 3 * s, 1, "a", 99.0, "{}"),  # terminal sample: weight 0
            (4, 5 * s, 2, "a", 7.0, "{}"),  # lone event: no segments
            (5, 0 * s, 3, "a", 5.0, "{}"),  # tie pair: zero-length
            (6, 0 * s, 3, "a", 6.0, "{}"),
            (7, 1 * s, 3, "a", 8.0, "{}"),
        ],
    )
    got = {
        r["user_id"]: (r["n_segments"], r["span_us"], r["twa_us"])
        for r in q_events_time_weighted(spark, d).collect()
    }
    assert got[1] == (2, 3 * s, 13_333_333)
    assert 2 not in got
    # user 3: segments (5→6, 0µs) and (6→8, 1s) → integral = 6.0 held 1s
    assert got[3] == (2, 1 * s, 6_000_000)


def test_basket_pair_lift_hand_computed(spark, tmp_path):
    """Baskets {1,2},{1,2},{1,2,3},{3}: only pair (1,2) clears support 3
    of 4 orders — support 750000 ppm, both confidences 1000000 ppm (2
    never appears without 1 and vice versa), lift 3·4/(3·3) = 1333333
    ppm > 1e6 (positively associated). Duplicate lineitems of the same
    part collapse before pairing."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataplatform_cdc_pipeline_spark.queries_extra import q_basket_pair_lift

    rows = [
        (1, 1), (1, 2), (1, 1),  # dup (1,1) must not double-count
        (2, 1), (2, 2),
        (3, 1), (3, 2), (3, 3),
        (4, 3),
    ]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_shipdate": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us", tz="UTC"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    got = [r.asDict() for r in q_basket_pair_lift(spark, str(tmp_path)).collect()]
    assert len(got) == 1
    r = got[0]
    assert (r["part_a"], r["part_b"], r["n_ab"], r["n_a"], r["n_b"]) == (1, 2, 3, 3, 3)
    assert r["n_orders"] == 4
    assert r["support_ppm"] == 750_000
    assert r["conf_a_b_ppm"] == 1_000_000 and r["conf_b_a_ppm"] == 1_000_000
    assert r["lift_ppm"] == 1_333_333


def test_kmv_set_estimate_degenerate_ends(spark):
    """Small-cardinality sketches (< k) are EXACT sets, so the set
    estimator must be exact at both degenerate ends: identical segments
    give Jaccard 1.0 and intersection == union; disjoint segments give
    Jaccard 0 and intersection 0; a half-overlap gives the literal
    counts."""
    from pyspark.sql import functions as F

    from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long
    from dataplatform_cdc_pipeline_spark.operators.sketches import kmv_set_estimate

    def sk(vals):
        df = spark.createDataFrame([(v,) for v in vals], "key string")
        return df.select(md5_long(F.col("key")).alias("hv"))

    same = kmv_set_estimate(sk(list("abcd")), sk(list("abcd")), k=32).first()
    assert same["n_union_sketch"] == 4 and same["n_both"] == 4
    assert same["jaccard_ppm"] == 1_000_000
    assert same["est_union"] == 4 and same["est_intersection"] == 4

    disj = kmv_set_estimate(sk(list("abcd")), sk(list("wxyz")), k=32).first()
    assert disj["n_union_sketch"] == 8 and disj["n_both"] == 0
    assert disj["jaccard_ppm"] == 0 and disj["est_intersection"] == 0

    half = kmv_set_estimate(sk(list("abcd")), sk(list("cdef")), k=32).first()
    assert half["n_union_sketch"] == 6 and half["n_both"] == 2
    assert half["est_intersection"] == 2


def test_feature_hashing_hand_computed(spark, tmp_path):
    """'a a b' → bucket(a) accumulates 2·sign(a), bucket(b) 1·sign(b),
    with bucket/sign recomputed here from first principles (hashlib MD5,
    60-bit prefix) — pinning the exact hash convention, not just
    self-consistency. Requires doc_id divisible by the verified-subset
    modulus."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataplatform_cdc_pipeline_spark.queries_extra import (
        FH_BUCKETS,
        FH_DOC_MOD,
        q_feature_hashing,
    )

    def hv(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def bucket(tok):
        return hv(tok) % FH_BUCKETS

    def sign(tok):
        return 1 if hv(f"sign|{tok}") % 2 == 0 else -1

    tbl = pa.table(
        {
            "doc_id": pa.array([FH_DOC_MOD], pa.int64()),
            "text": pa.array(["  A a   b "], pa.string()),  # lower+trim+\s+
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["t"], pa.string()),
            "n_chars": pa.array([10], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {
        (r["doc_id"], r["bucket"]): (r["feat"], r["n_tok"])
        for r in q_feature_hashing(spark, str(tmp_path)).collect()
    }
    expect = {}
    for tok, n in [("a", 2), ("b", 1)]:
        key = (FH_DOC_MOD, bucket(tok))
        f, c = expect.get(key, (0, 0))
        expect[key] = (f + sign(tok) * n, c + n)
    assert got == expect


def test_quarantine_split_validity_rules(spark):
    """A row quarantines only when a PRESENT value fails its cast:
    absent keys, JSON nulls, and the 'null' string (P16) all pass;
    multiple failing columns are all named; string targets never fail."""
    import datetime
    import json

    from dataplatform_cdc_pipeline_spark.plans.merge_plan import window_scan
    from dataplatform_cdc_pipeline_spark.plans.quarantine import quarantine_split
    from dataplatform_cdc_pipeline_spark.sources.cdc import (
        USER_STATE_SCHEMA,
        user_state_config,
    )

    def payload(pos, **fields):
        return json.dumps(
            {"__op": "c", "__ts_ns": "1704067200000000000", "__source_pos": str(pos),
             **fields}
        )

    rows = [
        payload(1, user_id=1, value=1.5, k=1),                 # clean
        payload(2, user_id=2, value="oops", k=1),              # bad value
        payload(3, user_id="x", value="oops", k="y"),          # 3 bad columns
        payload(4, user_id=4, value=None, k=None),             # JSON nulls pass
        payload(5, user_id=5, value="null", k="null"),         # 'null' string passes
        payload(6, user_id=6),                                 # absent keys pass
        payload(7, user_id=7, value="2.5", event_type=123),    # numeric string casts; int→string col fine
    ]
    base = datetime.datetime(2024, 1, 1)
    raw = spark.createDataFrame(
        [(p, base) for p in rows], "data string, load_ts timestamp"
    )
    cfg = user_state_config()
    w = window_scan(raw, cfg, None, None)
    clean, quarantined = quarantine_split(w, USER_STATE_SCHEMA, cfg)
    q = {
        int(r["__pos"]): sorted(r["__qerrors"])
        for r in quarantined.select("__pos", "__qerrors").collect()
    }
    assert q == {2: ["value"], 3: ["k", "user_id", "value"]}
    assert sorted(int(r["__pos"]) for r in clean.select("__pos").collect()) == [
        1, 4, 5, 6, 7,
    ]


def test_stream_dlq_replay_idempotent(spark, tmp_path):
    """Replaying the ENTIRE bronze source through a fresh checkpoint (the
    worst-case at-least-once outcome) changes neither the merged state
    nor the DLQ — both legs are idempotent upserts, which is the whole
    replay-safety argument of run_streaming_merge_dlq."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dataplatform_cdc_pipeline_spark.operators.merge_target import (
        ParquetMergeTarget,
    )
    from dataplatform_cdc_pipeline_spark.sources.cdc import (
        USER_STATE_SCHEMA,
        synthesize_cdc_from_events,
        user_state_config,
    )
    from dataplatform_cdc_pipeline_spark.streaming.stream_merge import (
        run_streaming_merge_dlq,
    )

    (tmp_path / "sf").mkdir()
    d = _write_events(
        tmp_path / "sf",
        [
            (1, 0, 1, "signup", 1.0, "{}"),
            (2, 1_000_000, 1, "click", 2.0, "{}"),
            (3, 2_000_000, 2, "signup", 3.0, "{}"),
        ],
    )
    from dataplatform_cdc_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, str(d), "events")
    # poison event 2's value
    poisoned = ev.withColumn(
        "value",
        F.when(F.col("event_id") == 2, F.lit("oops")).otherwise(
            F.col("value").cast("string")
        ),
    )
    raw = synthesize_cdc_from_events(poisoned)
    src = str(tmp_path / "bronze")
    raw.coalesce(1).write.parquet(src)

    cfg = user_state_config()
    cfg_q = user_state_config(target_table="q", pk="q_pos")
    q_schema = T.StructType(
        [
            T.StructField("q_pos", T.LongType()),
            T.StructField("qerror", T.StringType()),
            T.StructField("data", T.StringType()),
        ]
    )
    target = ParquetMergeTarget(spark, str(tmp_path / "t"), cfg, USER_STATE_SCHEMA)
    dlq = ParquetMergeTarget(spark, str(tmp_path / "q"), cfg_q, q_schema)
    for ckpt in ["ck1", "ck2"]:  # ck2 = fresh checkpoint → full replay
        run_streaming_merge_dlq(
            spark, cfg, target, dlq, USER_STATE_SCHEMA, src,
            str(tmp_path / ckpt),
        )
        state = sorted(
            (r["user_id"], r["value"])
            for r in target.read().select("user_id", "value").collect()
        )
        q = sorted(
            (r["q_pos"], r["qerror"])
            for r in dlq.read().select("q_pos", "qerror").collect()
        )
        # user 1's poisoned click quarantined → state falls back to signup
        assert state == [(1, 1.0), (2, 3.0)]
        assert q == [(2, "value")]
