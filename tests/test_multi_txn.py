"""Cross-table atomic transactions (operators/multi_txn.py): both-or-
neither commits across two snapshot tables, 2PC crash recovery, and
cross-table snapshot-isolated reads."""

import pytest

from dataplatform_cdc_pipeline_spark.operators.multi_txn import MultiTableTxn
from dataplatform_cdc_pipeline_spark.operators.snapshot_target import SnapshotMergeTarget
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config

from test_merge_target_contract import changes


def make_pair(spark, tmp_path):
    ta = SnapshotMergeTarget(
        spark, str(tmp_path / "a"), user_state_config(), USER_STATE_SCHEMA
    )
    tb = SnapshotMergeTarget(
        spark, str(tmp_path / "b"), user_state_config(), USER_STATE_SCHEMA
    )
    return ta, tb, MultiTableTxn(str(tmp_path / "txn"))


def state(t, version=None):
    return sorted(
        (r["user_id"], r["value"]) for r in t.read(version=version).collect()
    )


def test_both_tables_commit_atomically(spark, tmp_path):
    ta, tb, txn = make_pair(spark, tmp_path)
    tid = txn.commit(
        [
            (ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))),
            (tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 1)]))),
        ]
    )
    assert tid == 1
    assert state(ta) == [(1, 1.0)] and state(tb) == [(9, 9.0)]
    assert ta._read_version() == 1 and tb._read_version() == 1
    tid2 = txn.commit(
        [
            (ta, lambda: ta.merge(changes(spark, [("u", 1, 2.0, 5, 2)]))),
            (tb, lambda: tb.merge(changes(spark, [("d", 9, 0.0, 5, 2)]))),
        ]
    )
    assert tid2 == 2
    assert state(ta) == [(1, 2.0)] and state(tb) == []
    assert txn.read_versions() == {ta.path: 2, tb.path: 2}


def test_prepare_failure_publishes_nothing(spark, tmp_path):
    """Table A prepares fully (data tree written, manifest staged), then
    table B's thunk explodes — NEITHER table may advance: the staged
    manifest is unlinked, A still reads its old state, and the orphaned
    data tree never becomes reachable."""
    ta, tb, txn = make_pair(spark, tmp_path)
    txn.commit([(ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)])))])

    def boom():
        raise RuntimeError("poisoned table-B write")

    with pytest.raises(RuntimeError, match="poisoned"):
        txn.commit(
            [
                (ta, lambda: ta.merge(changes(spark, [("u", 1, 7.0, 5, 2)]))),
                (tb, boom),
            ]
        )
    assert ta._read_version() == 1 and state(ta) == [(1, 1.0)]
    assert tb._read_version() == 0
    assert txn._txn_ids() == [1]
    import os

    log = os.path.join(ta.path, SnapshotMergeTarget.LOG_DIR)
    assert not [e for e in os.listdir(log) if e.startswith(".staged-")]
    # the aborted txn does not wedge the tables: a clean retry commits
    txn.commit(
        [
            (ta, lambda: ta.merge(changes(spark, [("u", 1, 7.0, 5, 2)]))),
            (tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 2)]))),
        ]
    )
    assert state(ta) == [(1, 7.0)] and state(tb) == [(9, 9.0)]


def test_crash_between_decide_and_finalize_recovers(spark, tmp_path, monkeypatch):
    """Once the meta-manifest is linked the transaction IS committed even
    if the process dies before any table manifest is linked: a fresh
    coordinator's recover() (run implicitly by read_versions) finishes
    the finalize, and both tables then read the new state — presumed
    commit."""
    ta, tb, txn = make_pair(spark, tmp_path)

    def crash(meta):
        raise RuntimeError("simulated crash after decide")

    monkeypatch.setattr(txn, "_finalize", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit(
            [
                (ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))),
                (tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 1)]))),
            ]
        )
    # in-doubt window: decided on the meta log, invisible on the tables
    assert txn._txn_ids() == [1]
    assert ta._read_version() == 0 and tb._read_version() == 0

    fresh = MultiTableTxn(txn.path)
    assert fresh.read_versions() == {ta.path: 1, tb.path: 1}  # recovers first
    assert state(ta) == [(1, 1.0)] and state(tb) == [(9, 9.0)]
    assert fresh.recover() == 0  # idempotent: nothing left to repair


def test_cross_table_snapshot_pins_untouched_table(spark, tmp_path):
    """txn 2 touches only table A (B's thunk commits nothing): B's
    version is pinned unchanged in the meta-manifest, and reading AS OF
    txn 1 returns both tables' txn-1 states even after txn 2."""
    ta, tb, txn = make_pair(spark, tmp_path)
    txn.commit(
        [
            (ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))),
            (tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 1)]))),
        ]
    )
    txn.commit(
        [
            (ta, lambda: ta.merge(changes(spark, [("u", 1, 2.0, 5, 2)]))),
            (tb, lambda: None),  # no-op participant
        ]
    )
    v1 = txn.read_versions(txn_id=1)
    v2 = txn.read_versions()
    assert v1 == {ta.path: 1, tb.path: 1}
    assert v2 == {ta.path: 2, tb.path: 1}
    assert state(ta, version=v1[ta.path]) == [(1, 1.0)]
    assert state(ta, version=v2[ta.path]) == [(1, 2.0)]
    assert state(tb, version=v2[tb.path]) == [(9, 9.0)]
    with pytest.raises(ValueError, match="not in log"):
        txn.read_versions(txn_id=99)


# ---------------------------------------------------------------------------
# result cache (operators/result_cache.py)
# ---------------------------------------------------------------------------


def test_result_cache_hit_miss_and_invalidation(spark, tmp_path):
    """Same key + same versions serves WITHOUT recomputing (the compute
    thunk is poisoned); a bumped version recomputes; a second cache
    instance over the same directory shares entries (the cache is the
    filesystem, not the object)."""
    from dataplatform_cdc_pipeline_spark.operators.result_cache import ResultCache

    cache = ResultCache(spark, str(tmp_path / "rc"))
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([(1, "a")], "id long, v string")

    def poisoned():
        raise AssertionError("must not recompute")

    r1 = cache.get_or_compute("q", {"t": 1}, compute)
    assert [tuple(r) for r in r1.collect()] == [(1, "a")] and calls == [1]
    r2 = cache.get_or_compute("q", {"t": 1}, poisoned)
    assert [tuple(r) for r in r2.collect()] == [(1, "a")]
    assert (cache.hits, cache.misses) == (1, 1)
    # version bump → structurally a different key → recompute
    cache.get_or_compute("q", {"t": 2}, compute)
    assert calls == [1, 1] and cache.misses == 2
    # a fresh instance sees the same entries (shared, restart-safe)
    other = ResultCache(spark, str(tmp_path / "rc"))
    other.get_or_compute("q", {"t": 2}, poisoned)
    assert other.hits == 1


def test_result_cache_sweep(spark, tmp_path):
    """sweep() reclaims crash debris and version-superseded entries for
    keys it is told about, and leaves current entries and unrelated keys
    alone."""
    import os

    from dataplatform_cdc_pipeline_spark.operators.result_cache import ResultCache

    cache = ResultCache(spark, str(tmp_path / "rc"))

    def compute():
        return spark.createDataFrame([(1,)], "id long")

    cache.get_or_compute("q", {"t": 1}, compute)
    cache.get_or_compute("q", {"t": 2}, compute)
    cache.get_or_compute("other", {"t": 1}, compute)
    os.makedirs(os.path.join(cache.path, ".tmp-deadbeef"))
    removed = cache.sweep(live_versions={"q": {"t": 2}})
    assert any(e.startswith(".tmp-") for e in removed)
    assert sum(e.startswith("q-") for e in removed) == 1  # the v1 entry
    assert not any(e.startswith("other-") for e in removed)

    def poisoned():
        raise AssertionError("current entry must survive sweep")

    assert cache.get_or_compute("q", {"t": 2}, poisoned).count() == 1
    assert cache.get_or_compute("other", {"t": 1}, poisoned).count() == 1


def test_result_cache_sweep_does_not_claim_extending_key(spark, tmp_path):
    """ADVICE-r9 defect class: key "q" must not claim entries of key
    "q-sub" via a bare prefix match — sweeping with only "q" listed
    would delete a still-addressable entry of the UNLISTED "q-sub",
    breaking sweep()'s documented unlisted-keys-untouched contract."""
    from dataplatform_cdc_pipeline_spark.operators.result_cache import ResultCache

    cache = ResultCache(spark, str(tmp_path / "rc"))

    def compute():
        return spark.createDataFrame([(1,)], "id long")

    cache.get_or_compute("q", {"t": 1}, compute)
    cache.get_or_compute("q-sub", {"t": 1}, compute)
    removed = cache.sweep(live_versions={"q": {"t": 2}})
    assert sum(e.startswith("q-") for e in removed) == 1  # q's v1 entry only

    def poisoned():
        raise AssertionError("unlisted key's entry must survive sweep")

    assert cache.get_or_compute("q-sub", {"t": 1}, poisoned).count() == 1
    # exact-shape attribution both ways
    assert ResultCache._is_entry_of("q", "q-0123456789abcdef")
    assert not ResultCache._is_entry_of("q", "q-sub-0123456789abcdef")
    assert ResultCache._is_entry_of("q-sub", "q-sub-0123456789abcdef")
    assert not ResultCache._is_entry_of("q", "q-0123456789ABCDEF")  # not our hex
    assert not ResultCache._is_entry_of("q", "q-0123")  # wrong length


def test_result_cache_failed_compute_leaves_no_tmp_debris(spark, tmp_path):
    """A compute/write that fails mid-miss reclaims its .tmp- tree
    immediately (r9 hardening — same class as the staged-commit orphan
    fixes) instead of leaving crash debris for sweep(); the key stays a
    clean miss afterwards."""
    import os

    from pyspark.sql import functions as F

    from dataplatform_cdc_pipeline_spark.operators.result_cache import ResultCache

    cache = ResultCache(spark, str(tmp_path / "rc"))

    @F.udf("long")
    def boom(v):
        raise RuntimeError("poisoned compute")

    def failing():
        return spark.range(3).select(boom(F.col("id")).alias("id"))

    with pytest.raises(Exception, match="poisoned"):
        cache.get_or_compute("q", {"t": 1}, failing)
    assert not any(e.startswith(".tmp-") for e in os.listdir(cache.path))

    def compute():
        return spark.createDataFrame([(1,)], "id long")

    assert cache.get_or_compute("q", {"t": 1}, compute).count() == 1
    assert cache.misses == 2  # both attempts were misses; nothing cached the failure


def test_racing_coordinators_meta_cas(spark, tmp_path, monkeypatch):
    """Two coordinators race the same txn id: the loser's meta hard-link
    fails, its staged manifests are cleaned up, ConcurrentWriteError
    propagates, and the winner's transaction is untouched."""
    import os

    from dataplatform_cdc_pipeline_spark.operators.merge_target import (
        ConcurrentWriteError,
    )

    ta, tb, txn = make_pair(spark, tmp_path)
    rival = MultiTableTxn(txn.path)

    orig_ids = MultiTableTxn._txn_ids

    def sneak(self):
        ids = orig_ids(self)
        # after this coordinator reads the log, the rival decides txn 1
        if self is txn and not ids:
            rival.commit(
                [(tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 1)])))]
            )
        return ids

    monkeypatch.setattr(MultiTableTxn, "_txn_ids", sneak)
    with pytest.raises(ConcurrentWriteError, match="decided by another"):
        txn.commit([(ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)])))])
    monkeypatch.setattr(MultiTableTxn, "_txn_ids", orig_ids)
    # winner intact; loser published nothing and left no staged debris
    assert state(tb) == [(9, 9.0)]
    assert ta._read_version() == 0
    log = os.path.join(ta.path, SnapshotMergeTarget.LOG_DIR)
    assert not [e for e in os.listdir(log) if e.startswith(".staged-")]
    # the losing coordinator retries cleanly at the next id
    assert txn.commit(
        [(ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)])))]
    ) == 2
    assert state(ta) == [(1, 1.0)]


def test_independent_commit_between_prepare_and_finalize_is_torn(
    spark, tmp_path, monkeypatch
):
    """The documented misuse — a table takes an independent single-table
    commit between decide and finalize — must be a LOUD TornCommitError
    on recovery, not a silent pass: the published manifest at that
    version is different content, and dropping the transaction's staged
    manifest would tear the cross-table snapshot invisibly."""
    from dataplatform_cdc_pipeline_spark.operators.multi_txn import TornCommitError

    ta, tb, txn = make_pair(spark, tmp_path)

    def crash(meta):
        raise RuntimeError("simulated crash after decide")

    monkeypatch.setattr(txn, "_finalize", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit(
            [
                (ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))),
                (tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 1)]))),
            ]
        )
    monkeypatch.undo()
    # the misuse: table B commits independently while the txn is in-doubt;
    # it publishes version 1 with DIFFERENT content than the staged manifest
    tb.merge(changes(spark, [("c", 77, 7.0, 0, 2)]))
    assert tb._read_version() == 1
    fresh = MultiTableTxn(txn.path)
    with pytest.raises(TornCommitError, match="independent single-table"):
        fresh.recover()
    # the racing-recover() case stays idempotent: table A's finalize (same
    # content, re-run) already linked fine before the error surfaced — a
    # second recover over a repaired log with identical manifests is a no-op
    # (covered by test_crash_between_decide_and_finalize_recovers)


def test_racing_finalize_that_drops_staged_is_idempotent(
    spark, tmp_path, monkeypatch
):
    """A racing finalize/recover can link the final manifest AND unlink
    the staged one between this finalize's exists-check and its link
    call. The loser's FileExistsError handler then compares a VANISHED
    staged file — which must read as 'the racing finalize already
    published this transaction's manifest' (idempotent pass), not as a
    spurious TornCommitError (the pre-fix behavior: _same_manifest
    mapped the FileNotFoundError to False)."""
    import os

    ta, tb, txn = make_pair(spark, tmp_path)

    def crash(meta):
        raise RuntimeError("simulated crash after decide")

    monkeypatch.setattr(txn, "_finalize", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit(
            [
                (ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))),
                (tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 1)]))),
            ]
        )
    monkeypatch.undo()

    real_link = os.link

    def racing_link(src, dst, *a, **k):
        # the "other" recover wins: publishes the manifest, drops the
        # staged name, and this process's link observes File exists
        real_link(src, dst, *a, **k)
        os.unlink(src)
        raise FileExistsError(17, "File exists", dst)

    monkeypatch.setattr(
        "dataplatform_cdc_pipeline_spark.operators.multi_txn.os.link",
        racing_link,
    )
    fresh = MultiTableTxn(txn.path)
    fresh.recover()  # must NOT raise TornCommitError
    monkeypatch.undo()
    assert state(ta) == [(1, 1.0)] and state(tb) == [(9, 9.0)]
    assert MultiTableTxn(txn.path).recover() == 0


def test_same_manifest_io_error_is_not_a_torn_commit(tmp_path, monkeypatch):
    """_same_manifest must not conflate 'cannot read the file' with
    'different content': a transient IO error propagates (the caller
    retries / surfaces an IO failure), a vanished STAGED file is the
    idempotent racing-finalize pass, and a vanished FINAL (manifests are
    immutable once published) surfaces as the anomaly it is."""
    staged = tmp_path / "staged.json"
    final = tmp_path / "final.json"
    staged.write_text('{"v": 1}')
    final.write_text('{"v": 1}')
    assert MultiTableTxn._same_manifest(str(staged), str(final)) is True
    final.write_text('{"v": 2}')
    assert MultiTableTxn._same_manifest(str(staged), str(final)) is False

    # transient IO error (not ENOENT) propagates instead of reading False
    def denied(a, b):
        raise PermissionError(13, "Permission denied")

    monkeypatch.setattr(
        "dataplatform_cdc_pipeline_spark.operators.multi_txn.os.path.samefile",
        denied,
    )
    with pytest.raises(PermissionError):
        MultiTableTxn._same_manifest(str(staged), str(final))
    monkeypatch.undo()

    # vanished staged == racing finalize already published: same
    staged.unlink()
    assert MultiTableTxn._same_manifest(str(staged), str(final)) is True

    # vanished FINAL with staged present: an anomaly, not a quiet verdict
    staged.write_text('{"v": 1}')
    final.unlink()
    with pytest.raises(FileNotFoundError):
        MultiTableTxn._same_manifest(str(staged), str(final))


def test_refinalize_same_content_still_passes(spark, tmp_path):
    """recover() over an already-finalized log re-runs finalize for every
    txn; the existing manifests are the SAME content (often the same
    inode), so the FileExistsError path must stay a silent no-op."""
    ta, tb, txn = make_pair(spark, tmp_path)
    txn.commit(
        [
            (ta, lambda: ta.merge(changes(spark, [("c", 1, 1.0, 0, 1)]))),
            (tb, lambda: tb.merge(changes(spark, [("c", 9, 9.0, 0, 1)]))),
        ]
    )
    assert MultiTableTxn(txn.path).recover() == 0
