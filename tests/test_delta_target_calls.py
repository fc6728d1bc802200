"""Execute DeltaMergeTarget's merge-builder path against a call-recording
double.

delta-spark is not installable in this sandbox (offline: ``pip download
delta-spark`` → "No matching distribution found"; no vendored wheel/jar on
disk — see NOTES_r5.md), so the 11 shared contract tests skip for the real
Delta sink. This suite closes the remaining gap honestly: it EXECUTES
``DeltaMergeTarget.merge`` (the only previously never-run code path) with
``DeltaTable`` replaced by a recorder, and pins the clause strings /
update-set maps / schema-evolution flag the builder receives — i.e. the
exact MERGE the production sink would submit (merge.sql:403-436). True
engine semantics remain covered by the shared suite the moment delta-spark
is installed; this pins that the submitted MERGE says what the contract
demands.
"""

from __future__ import annotations

import datetime

import pytest

import dataplatform_cdc_pipeline_spark.operators.delta_target as dt_mod
from dataplatform_cdc_pipeline_spark.operators.delta_target import DeltaMergeTarget
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config
from tests.test_merge_target_contract import changes

BASE = datetime.datetime(2024, 1, 1)


class _Recorder(dict):
    """One merge() invocation's builder calls."""


class _FakeBuilder:
    def __init__(self, rec: _Recorder):
        self.rec = rec

    def merge(self, source, cond):
        self.rec["join_cond"] = cond
        self.rec["source_cols"] = source.columns
        return self

    def withSchemaEvolution(self):
        self.rec["schema_evolution"] = True
        return self

    def whenMatchedDelete(self, condition):
        self.rec["delete_cond"] = condition
        return self

    def whenMatchedUpdate(self, condition, set):  # noqa: A002 — delta API name
        self.rec["update_cond"] = condition
        self.rec["update_set"] = set
        return self

    def whenNotMatchedInsert(self, condition, values):
        self.rec["insert_cond"] = condition
        self.rec["insert_values"] = values
        return self

    def execute(self):
        self.rec["executed"] = True


class _FakeDeltaTable:
    recs: list[_Recorder] = []

    @staticmethod
    def isDeltaTable(spark, path):
        return True  # force the merge-builder branch (not first-write)

    @staticmethod
    def forPath(spark, path):
        rec = _Recorder(path=path)
        _FakeDeltaTable.recs.append(rec)

        class _Aliased:
            def alias(self, name):
                rec["target_alias"] = name
                return _FakeBuilder(rec)

        return _Aliased()


@pytest.fixture()
def delta_double(monkeypatch):
    monkeypatch.setattr(dt_mod, "DeltaTable", _FakeDeltaTable)
    monkeypatch.setattr(dt_mod, "HAS_DELTA", True)
    _FakeDeltaTable.recs = []
    return _FakeDeltaTable


def _target(spark, **cfg_kwargs):
    cfg = user_state_config(**cfg_kwargs)
    return DeltaMergeTarget(spark, "/tmp/fake-delta", cfg, USER_STATE_SCHEMA)


DATA_COLS = ["user_id", "event_type", "value", "k", "source_ts_ns_order", "pos"]


def test_default_merge_submits_reference_clauses(spark, delta_double):
    t = _target(spark)
    stats = t.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("d", 9, 0.0, 0, 2)]))
    rec = delta_double.recs[-1]
    assert rec["executed"] and rec["target_alias"] == "t"
    # null-safe PK equality, like the parquet sink's resolve
    assert rec["join_cond"] == "s.`user_id` <=> t.`user_id`"
    # the three reference clauses (merge.sql:403-436)
    assert rec["delete_cond"] == "s.`__op` = 'd'"
    assert rec["update_cond"] == "s.`__op` != 'd'"
    assert rec["insert_cond"] == "s.`__op` != 'd'"
    # all data columns updated/inserted from the source, none invented
    assert rec["update_set"] == {c: f"s.`{c}`" for c in DATA_COLS}
    assert rec["insert_values"] == {c: f"s.`{c}`" for c in DATA_COLS}
    assert "schema_evolution" not in rec
    # stats accounting identical to the parquet sink (merge.sql:360-366)
    assert stats["records_inserted"] == 1 and stats["records_deleted"] == 1
    assert stats["cdc_start_ts"] == BASE + datetime.timedelta(seconds=1)
    assert stats["cdc_end_ts"] == BASE + datetime.timedelta(seconds=2)


def test_op_u_gate_and_strict_guard_conditions(spark, delta_double):
    t = _target(spark, update_only_op_u=True, strict_ts_guard=True)
    t.merge(changes(spark, [("u", 1, 1.0, 0, 1)]))
    rec = delta_double.recs[-1]
    # gate narrows the update clause to 'u' (step-6:431-438) and the guard
    # appends the recency predicate; delete stays unconditional
    assert rec["update_cond"] == (
        "s.`__op` = 'u' AND (s.source_ts_ns_order IS NULL"
        " OR s.source_ts_ns_order >= t.source_ts_ns_order)"
    )
    assert rec["delete_cond"] == "s.`__op` = 'd'"
    assert rec["insert_cond"] == "s.`__op` != 'd'"


def test_multi_pk_join_condition_chains_null_safe(spark, delta_double):
    cfg = user_state_config(pk="user_id,event_type")
    t = DeltaMergeTarget(spark, "/tmp/fake-delta", cfg, USER_STATE_SCHEMA)
    t.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    rec = delta_double.recs[-1]
    assert rec["join_cond"] == "s.`user_id` <=> t.`user_id` AND s.`event_type` <=> t.`event_type`"


def test_evolve_policy_requests_schema_evolution(spark, delta_double):
    t = _target(spark, schema_drift_policy="evolve")
    t.merge(changes(spark, [("u", 1, 1.0, 0, 1)]))
    assert delta_double.recs[-1].get("schema_evolution") is True
