"""Partial-image patch fold (plans/patch.py): absent-means-unchanged,
delete fences resurrection, latest-op/ts/pos survivorship."""

import datetime

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.plans.patch import patch_fold

BASE = datetime.datetime(2024, 1, 1)


def keyed(spark, rows):
    """rows: (user_id, op, event_type, value, k, sec, pos)."""
    data = [
        (u, op, et, v, k, BASE + datetime.timedelta(seconds=sec), pos)
        for u, op, et, v, k, sec, pos in rows
    ]
    return spark.createDataFrame(
        data,
        "user_id long, __op string, event_type string, value double, k int, "
        "source_ts_ns_order timestamp, pos long",
    )


def fold(spark, rows):
    out = patch_fold(keyed(spark, rows), ["user_id"], ["event_type", "value", "k"])
    return {
        r["user_id"]: (
            r["__op"], r["event_type"], r["value"], r["k"], r["pos"]
        )
        for r in out.collect()
    }


def test_absent_columns_mean_unchanged(spark):
    got = fold(spark, [
        (1, "c", "a", 1.0, 7, 0, 1),
        (1, "u", None, 2.0, None, 1, 2),   # only value present
        (1, "u", "b", None, None, 2, 3),   # only event_type present
    ])
    # event_type from pos 3, value from pos 2, k survives from the create
    assert got[1] == ("u", "b", 2.0, 7, 3)


def test_delete_fences_resurrection(spark):
    got = fold(spark, [
        (2, "c", "old", 9.0, 9, 0, 1),
        (2, "d", None, None, None, 1, 2),
        (2, "c", "new", None, None, 2, 3),  # re-insert, sparse
    ])
    # pre-delete value/k must NOT resurrect; latest op is the re-insert
    assert got[2] == ("c", "new", None, None, 3)


def test_trailing_delete_wins(spark):
    got = fold(spark, [
        (3, "c", "x", 1.0, 1, 0, 1),
        (3, "d", None, None, None, 1, 2),
    ])
    assert got[3] == ("d", None, None, None, 2)


def test_same_ts_pos_tiebreak(spark):
    got = fold(spark, [
        (4, "u", None, 1.0, None, 5, 1),
        (4, "u", None, 2.0, None, 5, 2),  # same second, higher pos wins
    ])
    assert got[4] == ("u", None, 2.0, None, 2)


# ---------------------------------------------------------------------------
# property: patch_fold ≡ a straightforward per-key python fold
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

event_st = st.tuples(
    st.integers(1, 3),                                  # user_id (few keys → collisions)
    st.sampled_from(["c", "u", "d"]),
    st.one_of(st.none(), st.sampled_from(["a", "b"])),  # event_type (sparse)
    st.one_of(st.none(), st.sampled_from([1.0, 2.0])),  # value (sparse)
    st.one_of(st.none(), st.integers(0, 3)),            # k (sparse)
    st.integers(0, 5),                                  # ts offset seconds (ties!)
)


def _python_fold(rows):
    """Reference implementation: literal spec of the docstring."""
    out = {}
    by_key = {}
    for i, (u, op, et, v, k, sec) in enumerate(rows):
        by_key.setdefault(u, []).append((sec, i + 1, op, et, v, k))
    for u, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        last = evs[-1]
        if last[2] == "d":
            out[u] = ("d", None, None, None, last[1])
            continue
        last_d = max(((e[0], e[1]) for e in evs if e[2] == "d"), default=None)
        vals = {}
        for c_idx, name in ((3, "et"), (4, "v"), (5, "k")):
            vals[name] = None
            for e in evs:
                if e[2] == "d":
                    continue
                if last_d is not None and (e[0], e[1]) <= last_d:
                    continue
                if e[c_idx] is not None:
                    vals[name] = e[c_idx]
        out[u] = (last[2], vals["et"], vals["v"], vals["k"], last[1])
    return out


@settings(max_examples=15, deadline=None)
@given(st.lists(event_st, min_size=1, max_size=14))
def test_patch_fold_matches_python_reference(spark, rows):
    got = fold(spark, [
        (u, op, et, v, k, sec, i + 1)
        for i, (u, op, et, v, k, sec) in enumerate(rows)
    ])
    assert got == _python_fold(rows)
