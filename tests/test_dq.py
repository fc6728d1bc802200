"""Data-quality expectations (operators/dq.py): rule semantics, NULL
discipline, single-scan compilation of row-level rules."""

from __future__ import annotations

import pytest

from dataplatform_cdc_pipeline_spark.operators.dq import (
    BoolExpr,
    ForeignKey,
    InRange,
    InSet,
    NotNull,
    Unique,
    run_expectations,
    violations,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 10.0, "A", 0.01),
        (2, None, "A", 0.02),  # null qty
        (3, 99.0, "R", None),  # out of range; bad flag; NULL predicate
        (1, 5.0, "N", 0.10),  # dup key 1; discount over cap
        (4, 20.0, None, 0.03),  # NULL flag: not an in_set violation
    ]
    return spark.createDataFrame(rows, "id long, qty double, flag string, disc double")


def _result(df, rules):
    return {r["rule"]: (r["n_violations"], r["n_checked"])
            for r in run_expectations(df, rules).collect()}


def test_row_level_rules(frame):
    res = _result(
        frame,
        [
            NotNull("qty"),
            InRange("qty", 1, 50),
            InSet("flag", ("A", "N")),
            BoolExpr("disc_cap", "disc <= 0.05"),
        ],
    )
    assert res["not_null:qty"] == (1, 5)
    # NULL qty is not an in_range violation (not_null's business)
    assert res["in_range:qty"] == (1, 5)
    # NULL flag is not an in_set violation
    assert res["in_set:flag"] == (1, 5)
    # NULL predicate counts as violation (three-valued logic must not pass)
    assert res["expr:disc_cap"] == (2, 5)


def test_unique_counts_duplicated_keys_not_rows(frame):
    res = _result(frame, [Unique(("id",))])
    # ids {1,2,3,4}: one key (1) duplicated → 1 violation over 4 keys
    assert res["unique:id"] == (1, 4)


def test_foreign_key_orphans(spark, frame):
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    res = _result(frame, [ForeignKey(("id",), ("k",), "dim", dim)])
    # id=4 has no dim row: 1 orphan row of 5
    assert res["foreign_key:id->dim"] == (1, 5)


def test_all_rules_union_shape(spark, frame):
    dim = spark.createDataFrame([(i,) for i in range(1, 5)], "k long")
    out = run_expectations(
        frame,
        [NotNull("qty"), Unique(("id",)), ForeignKey(("id",), ("k",), "dim", dim)],
    )
    assert out.columns == ["rule", "n_violations", "n_checked"]
    assert out.count() == 3


def test_violations_rows_pushdown(frame):
    v = violations(frame, InSet("flag", ("A", "N"))).collect()
    assert [r["id"] for r in v] == [3]
    with pytest.raises(TypeError, match="row-level"):
        violations(frame, Unique(("id",)))


def test_unknown_rule_raises(frame):
    with pytest.raises(TypeError, match="unknown expectation"):
        run_expectations(frame, [object()])


def test_row_rules_compile_to_one_scan(frame):
    """All row-level rules share a single aggregate over one scan."""
    out = run_expectations(
        frame,
        [NotNull("qty"), InRange("qty", 1, 50), InSet("flag", ("A", "N"))],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one logical scan of the input relation (unions of re-scans would
    # repeat it once per rule)
    assert plan.count("LogicalRDD") == 1


def test_empty_rules_empty_result(spark, frame):
    out = run_expectations(frame, [])
    assert out.count() == 0
    assert out.columns == ["rule", "n_violations", "n_checked"]
