"""Delta-style CLONE on the snapshot sink: deep independence, shallow
zero-copy semantics, and the documented shallow-vacuum hazard."""

import os

import pytest

from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
    SnapshotMergeTarget,
)
from dataplatform_cdc_pipeline_spark.sources.cdc import (
    USER_STATE_SCHEMA,
    user_state_config,
)

from test_merge_target_contract import changes


def make(spark, tmp_path, sub="t", **cfg_kwargs):
    cfg = user_state_config(**cfg_kwargs)
    return SnapshotMergeTarget(spark, str(tmp_path / sub), cfg, USER_STATE_SCHEMA)


def state(t, version=None):
    return sorted(
        (r["user_id"], r["value"]) for r in t.read(version=version).collect()
    )


def test_deep_clone_is_independent(spark, tmp_path):
    src = make(spark, tmp_path, "src")
    src.merge(changes(spark, [("c", 1, 1.0, 0, 1), ("c", 2, 2.0, 0, 2)]))
    src.merge(changes(spark, [("u", 1, 5.0, 1, 3)]))
    clone = src.clone_to(str(tmp_path / "clone"), deep=True)
    assert state(clone) == state(src)
    assert clone._manifest()["cloned_from"]["deep"] is True
    # both sides evolve independently
    clone.merge(changes(spark, [("u", 2, 9.0, 2, 4)]))
    src.merge(changes(spark, [("d", 1, 0.0, 2, 5)]))
    assert state(clone) == [(1, 5.0), (2, 9.0)]
    assert state(src) == [(2, 2.0)]
    # deep clone survives source vacuum (it owns copies)
    src.merge(changes(spark, [("u", 2, 7.0, 3, 6)]))
    src.vacuum(retain_last=1)
    assert state(clone) == [(1, 5.0), (2, 9.0)]


def test_clone_historic_version(spark, tmp_path):
    src = make(spark, tmp_path, "src")
    src.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    src.merge(changes(spark, [("u", 1, 2.0, 1, 2)]))
    clone = src.clone_to(str(tmp_path / "c1"), version=1)
    assert state(clone) == [(1, 1.0)]
    assert clone._manifest()["cloned_from"]["version"] == 1


def test_shallow_clone_zero_copy_and_vacuum_hazard(spark, tmp_path):
    src = make(spark, tmp_path, "src")
    src.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    clone = src.clone_to(str(tmp_path / "shallow"), deep=False)
    # zero copy: the clone root has NO data directory of its own
    assert not os.path.isdir(str(tmp_path / "shallow" / "data"))
    assert state(clone) == [(1, 1.0)]
    # Delta's documented hazard: source vacuum past the cloned version
    # reclaims files the shallow clone references
    src.merge(changes(spark, [("u", 1, 2.0, 1, 2)]))
    src.merge(changes(spark, [("u", 1, 3.0, 2, 3)]))
    src.vacuum(retain_last=1)
    with pytest.raises(Exception):  # noqa: B017 — path gone, any read error
        clone.read().collect()


def test_clone_errors(spark, tmp_path):
    src = make(spark, tmp_path, "src")
    with pytest.raises(ValueError, match="empty table"):
        src.clone_to(str(tmp_path / "x"))
    src.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))
    src.clone_to(str(tmp_path / "x"))
    with pytest.raises(ValueError, match="already has a log"):
        src.clone_to(str(tmp_path / "x"))
