"""Cross-TABLE atomic transactions over the snapshot sink — two-phase
commit with presumed-commit recovery, the Nessie / Iceberg-multi-table
analog for pipelines whose batch must land in several tables at once
(fact + aggregate, data + DLQ, state + index).

The single-table sink (snapshot_target.py) is already table-atomic: one
hard-link CAS publishes data + audit + watermark. This coordinator
raises that to N tables:

1. **Prepare** — each table's merge runs normally EXCEPT that its final
   ``_publish`` stages the manifest to a dot-file instead of linking it
   (``SnapshotMergeTarget._prepare_capture``). Data trees are fully
   written; nothing is referenced. A failure anywhere in this phase
   aborts the whole transaction: staged manifests are unlinked, the
   orphaned data trees are ``vacuum()``-reclaimable, and every table
   still reads its previous version.
2. **Decide** — ONE hard-link CAS in the coordinator's own ``_txnlog``
   publishes the meta-manifest listing every (table, version, staged
   manifest). This link is the transaction's only atomic decision
   point: before it, no table commits; after it, every table WILL.
3. **Finalize** — each staged manifest is linked to its final name in
   its table's log. Idempotent (an existing identical link is skipped),
   so a crash between decide and finalize is repaired by
   :meth:`recover`, which re-runs finalize for every decided
   transaction — presumed commit, exactly 2PC's recovery rule.

Consistency contract: direct table reads between decide and finalize
can see a stale version (the classic 2PC in-doubt window); readers that
need cross-table consistency call :meth:`read_versions` /
:meth:`recover`, which repair first and then pin EVERY table to the
versions recorded in one meta-manifest — a cross-table snapshot-
isolated read, also usable against any PAST transaction id (multi-table
time travel). Tables enrolled here must not also take independent
single-table commits between prepare and finalize (the finalize link
would CAS-fail); that single-writer-per-branch rule is Nessie's too.

100 TB posture: the coordinator moves only manifests (KB-sized JSON);
all data I/O happens in the tables' own bucketed writes during prepare.
N tables cost N staged links + 1 CAS, independent of data volume.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable

from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
    ConcurrentWriteError,
    SnapshotMergeTarget,
)


class TornCommitError(RuntimeError):
    """Finalize found a DIFFERENT manifest already published at a staged
    version — a table took an independent single-table commit between
    prepare and finalize (the documented single-writer-per-branch
    violation). The cross-table transaction is torn at that table and
    must be replayed through the coordinator; passing silently here
    would hide the tear forever."""


class MultiTableTxn:
    LOG_DIR = "_txnlog"

    @staticmethod
    def _same_manifest(staged: str, final: str) -> bool:
        """True iff the two manifest files carry the same commit — same
        inode (a racing recover() hard-linked the staged file itself) or
        byte-identical content (KB-sized JSON; a full compare is cheap
        and immune to key-order/mtime differences a field compare could
        miss).

        A staged manifest that has VANISHED means a racing finalize
        already published this transaction's manifest and then unlinked
        the staged name — the idempotent same-content case, so report
        "same" rather than tearing. Any other OSError (permissions,
        transient IO, a vanished FINAL — manifests are immutable once
        published) propagates: an unreadable file is not evidence of a
        torn commit and must not be diagnosed as one."""
        try:
            if os.path.samefile(staged, final):
                return True
            with open(staged, "rb") as a:
                staged_bytes = a.read()
        except FileNotFoundError:
            if not os.path.exists(staged):
                return True  # racing finalize published + dropped staged
            raise  # the FINAL vanished — surface the anomaly, don't tear
        with open(final, "rb") as b:
            return staged_bytes == b.read()

    def __init__(self, path: str):
        self.path = path
        os.makedirs(self._log_path(), exist_ok=True)

    def _log_path(self) -> str:
        return os.path.join(self.path, self.LOG_DIR)

    def _txn_ids(self) -> list[int]:
        return sorted(
            int(e[: -len(".json")])
            for e in os.listdir(self._log_path())
            if e.endswith(".json") and e[: -len(".json")].isdigit()
        )

    def _meta(self, txn_id: int) -> dict:
        with open(os.path.join(self._log_path(), f"{txn_id:012d}.json")) as f:
            return json.load(f)

    # -- the transaction ----------------------------------------------------

    def commit(
        self, work: list[tuple[SnapshotMergeTarget, Callable[[], None]]]
    ) -> int:
        """Run every (table, thunk) pair as ONE cross-table transaction;
        returns the new txn id. Each thunk performs the table's writes
        (typically ``run_merge`` / ``target.merge``) and must produce at
        most one commit; a thunk that commits nothing (empty batch)
        participates as a no-op and its table's version is pinned
        unchanged in the meta-manifest."""
        token = uuid.uuid4().hex[:8]
        entries: list[dict] = []
        try:
            for target, thunk in work:
                cap: list = []
                target._prepare_capture = cap
                try:
                    thunk()
                finally:
                    target._prepare_capture = None
                if len(cap) > 1:
                    raise RuntimeError(
                        f"multi-table txn: thunk for {target.path} produced "
                        f"{len(cap)} commits; one atomic decision cannot cover "
                        "a multi-commit thunk"
                    )
                if cap:
                    version, staged = cap[0]
                    entries.append(
                        {"table": target.path, "version": version, "staged": staged}
                    )
                else:  # no-op table: pin its current version for readers
                    entries.append(
                        {"table": target.path, "version": target._read_version()}
                    )
        except BaseException:
            for e in entries:
                if "staged" in e:
                    try:
                        os.unlink(e["staged"])
                    except FileNotFoundError:
                        pass
            raise
        txn_id = (self._txn_ids() or [0])[-1] + 1
        meta = {"txn": txn_id, "token": token, "tables": entries}
        tmp = os.path.join(self._log_path(), f".tmp-{token}.json")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        final = os.path.join(self._log_path(), f"{txn_id:012d}.json")
        try:
            os.link(tmp, final)  # the transaction's single atomic decision
        except FileExistsError as e:
            for ent in entries:
                if "staged" in ent:
                    try:
                        os.unlink(ent["staged"])
                    except FileNotFoundError:
                        pass
            raise ConcurrentWriteError(
                f"txn {txn_id} at {self.path} was decided by another "
                "coordinator; re-read and re-merge"
            ) from e
        finally:
            os.unlink(tmp)
        self._finalize(meta)
        return txn_id

    def _finalize(self, meta: dict) -> None:
        for e in meta["tables"]:
            if "staged" not in e:
                continue
            final = os.path.join(
                e["table"],
                SnapshotMergeTarget.LOG_DIR,
                f"{e['version']:012d}.json",
            )
            if os.path.exists(final):
                # Two ways a manifest can already exist at this version:
                # a racing/earlier recover() finalized this transaction
                # (same content — idempotent no-op), or the table took an
                # independent single-table commit between prepare and
                # finalize (the documented misuse) — DIFFERENT content.
                # Passing silently on the latter would publish a torn
                # cross-table commit with no error anywhere, so compare
                # whenever the staged manifest is still around to compare
                # against (once finalize has unlinked it, the existing
                # final IS this transaction's — nothing left to check).
                if os.path.exists(e["staged"]) and not self._same_manifest(
                    e["staged"], final
                ):
                    raise TornCommitError(
                        f"multi-table txn {meta['txn']}: version "
                        f"{e['version']} of {e['table']} was published by "
                        "an independent single-table commit between "
                        "prepare and finalize — the transaction's staged "
                        f"manifest {e['staged']} conflicts with the "
                        "published one. The cross-table snapshot is torn "
                        "at this table; replay the window through the "
                        "coordinator."
                    )
            else:
                if not os.path.exists(e["staged"]):
                    raise RuntimeError(
                        f"multi-table txn {meta['txn']}: staged manifest "
                        f"{e['staged']} is gone but version {e['version']} of "
                        f"{e['table']} was never published — unrecoverable torn "
                        "commit (was the staged file vacuumed by hand?)"
                    )
                try:
                    os.link(e["staged"], final)
                except FileExistsError:
                    # the exists-check raced a concurrent finalize: same
                    # content passes (idempotent), different content is
                    # the same torn-commit misuse as above
                    if not self._same_manifest(e["staged"], final):
                        raise TornCommitError(
                            f"multi-table txn {meta['txn']}: version "
                            f"{e['version']} of {e['table']} was concurrently "
                            "published with different content during "
                            "finalize — torn cross-table commit; replay the "
                            "window through the coordinator."
                        )
            # the final link exists now; drop the staged name (hard links
            # share content, so this never orphans the manifest)
            try:
                os.unlink(e["staged"])
            except FileNotFoundError:
                pass

    # -- recovery + consistent reads ----------------------------------------

    def recover(self) -> int:
        """Presumed-commit repair: re-finalize every decided transaction.
        Returns the number of manifest links created. Safe to call any
        time; a no-op on a clean log."""
        n0 = 0
        for txn_id in self._txn_ids():
            meta = self._meta(txn_id)
            for e in meta["tables"]:
                if "staged" not in e:
                    continue
                final = os.path.join(
                    e["table"],
                    SnapshotMergeTarget.LOG_DIR,
                    f"{e['version']:012d}.json",
                )
                if not os.path.exists(final):
                    n0 += 1
            self._finalize(meta)
        return n0

    def read_versions(self, txn_id: int | None = None) -> dict[str, int]:
        """table path → version AS OF the given transaction (latest when
        None) — the cross-table snapshot. Runs :meth:`recover` first so
        the in-doubt window can never be observed through this API."""
        self.recover()
        ids = self._txn_ids()
        if not ids:
            return {}
        if txn_id is None:
            txn_id = ids[-1]
        if txn_id not in ids:
            raise ValueError(f"txn {txn_id} not in log (have {ids})")
        # a table keeps its last-pinned version from earlier txns when a
        # later txn didn't touch it — fold forward
        out: dict[str, int] = {}
        for t in ids:
            if t > txn_id:
                break
            for e in self._meta(t)["tables"]:
                out[e["table"]] = e["version"]
        return out
