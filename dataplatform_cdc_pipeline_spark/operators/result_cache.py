"""Version-keyed query result cache — the BigQuery-results-cache /
Databricks-result-cache primitive for the snapshot sink: a cached result
is valid exactly as long as every input TABLE VERSION it was computed
from is still current, so correctness needs no TTL guesswork and no
manual invalidation.

Key design: cache key = (query name, sorted {table: version}) hashed;
the versions come from the snapshot sink's manifest counter (or
MultiTableTxn.read_versions() for cross-table consistency), which is
bumped by every commit — any write to any input table changes the key
and the stale entry is simply never addressed again (garbage, reclaimed
by sweep()). Entries are immutable parquet directories published by
atomic rename, so concurrent readers/writers follow the same
write-once-then-link discipline as the snapshot sink itself:

- racing computes of the same key both write; the rename loser deletes
  its tree and READS the winner's (first-writer-wins, both correct);
- a crash mid-write leaves only an unpublished ``.tmp-`` tree, which
  sweep() reclaims.

100 TB posture: the cache stores RESULTS (aggregate-sized), not inputs;
serving a hit is a bare parquet scan with zero recompute — the win is
proportional to the query's cost, and the version key makes stale
serves structurally impossible rather than "unlikely".
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class ResultCache:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.hits = 0
        self.misses = 0
        os.makedirs(path, exist_ok=True)

    #: hex chars in an entry's version fingerprint — entry dirs are
    #: exactly ``f"{key}-{16-hex-fp}"``, which _is_entry_of relies on
    _FP_LEN = 16

    def _entry_dir(self, key: str, versions: dict[str, int]) -> str:
        canon = json.dumps({"key": key, "versions": dict(sorted(versions.items()))})
        fp = hashlib.md5(canon.encode()).hexdigest()[: self._FP_LEN]
        return os.path.join(self.path, f"{key}-{fp}")

    @classmethod
    def _is_entry_of(cls, key: str, e: str) -> bool:
        """True when directory name ``e`` is an entry of exactly ``key``.

        Shape-exact, not prefix-based (same defect class as the snapshot
        sink's tree check, ADVICE r9): key "q" must NOT claim entries of
        key "q-sub" — ``"q-sub-<fp>".startswith("q-")`` is true, and a
        bare prefix match would let sweep() delete a still-addressable
        entry of an UNLISTED key, breaking its documented contract. An
        entry of ``key`` is ``key`` + "-" + exactly _FP_LEN lowercase
        hex chars; no other key's entries can take that shape."""
        suffix = e[len(key) + 1 :]
        return (
            e.startswith(key + "-")
            and len(suffix) == cls._FP_LEN
            and all(c in "0123456789abcdef" for c in suffix)
        )

    def get_or_compute(
        self,
        key: str,
        versions: dict[str, int],
        compute: Callable[[], DataFrame],
    ) -> DataFrame:
        """Return the result for ``key`` as of ``versions`` — from the
        cache when a prior call stored it under the SAME versions,
        otherwise by running ``compute()`` and publishing its result.
        The returned frame always reads the immutable cached copy, so
        downstream consumers see identical bytes on hit and miss."""
        entry = self._entry_dir(key, versions)
        if os.path.isdir(entry):
            self.hits += 1
            return self.spark.read.parquet(entry)
        self.misses += 1
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex[:8]}")
        try:
            compute().write.mode("errorifexists").parquet(tmp)
        except BaseException:
            # a failed compute/write leaves a partial, never-published
            # tree — reclaim now rather than waiting for sweep()
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            os.rename(tmp, entry)
        except OSError:
            # rename loser: another compute published first — same key,
            # same versions, same deterministic result; serve theirs
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(entry):
                raise
        return self.spark.read.parquet(entry)

    def sweep(self, live_versions: dict[str, dict[str, int]] | None = None) -> list[str]:
        """Reclaim crash debris (unpublished ``.tmp-`` trees) and, when
        ``live_versions`` is given ({key: current versions}), every entry
        whose key is listed but whose version fingerprint is no longer
        the current one — superseded results that can never be addressed
        again. Unlisted keys are left alone (another pipeline may still
        be at an older version legitimately)."""
        removed = []
        keep = (
            {os.path.basename(self._entry_dir(k, v)) for k, v in live_versions.items()}
            if live_versions
            else set()
        )
        for e in os.listdir(self.path):
            full = os.path.join(self.path, e)
            if e.startswith(".tmp-"):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(e)
            elif (
                keep
                and e not in keep
                and any(self._is_entry_of(k, e) for k in (live_versions or {}))
            ):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(e)
        return removed
