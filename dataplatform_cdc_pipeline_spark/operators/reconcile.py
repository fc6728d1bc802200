"""Merkle-style table reconciliation — diff two bucketed tables without
shuffling full rows.

The CDC engine's correctness story needs an anti-entropy primitive: two
replicas of a merge target (a rebuilt table vs the incrementally
maintained one, a DR copy vs primary, this engine vs the reference's
output) must be comparable at 100 TB without a full-table join. The
classic answer (Cassandra repair, DynamoDB anti-entropy) is a Merkle
sweep:

1. **Fingerprint stage** — each side computes, per storage bucket, a
   ``(row_count, fingerprint)`` pair where the fingerprint is the SUM of
   per-row MD5 hashes (mod 2^60). Sum is commutative/associative, so the
   fingerprint is independent of row order and partitioning, mergeable
   map-side, and exactly the kind of statistic the snapshot sink could
   harvest at commit time next to its zone maps (footer-stat shaped).
   This stage is one column-pruned scan per side producing ≤ n_buckets
   rows.
2. **Descend stage** — only buckets whose (count, fingerprint) pairs
   differ are read back (bucket-pruned reads on BOTH sides) and joined
   full-outer on the PK; per-row hashes classify each key as ``added``
   (only in A), ``removed`` (only in B), or ``changed``. Matching rows
   inside a differing bucket drop out — the join output is proportional
   to the actual drift, not the bucket size.

With B buckets and d differing ones, the cost is two scans + a join over
d/B of the data — against a full-table join for the naive diff. The
standard Merkle caveat applies: two drifted rows in one bucket cancel
only if their hash DELTAS collide mod 2^60 (≈2^-60 per pair); the row
count catches all add/remove imbalances.

Reference anchor: the reference validates merges by recomputing counts
into etl_watermark (merge.sql:482-501); this operator is the
content-level generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long
from dataplatform_cdc_pipeline_spark.operators.merge_target import bucket_expr

_FP_MOD = 1 << 60


def row_hash(cols: list[str]) -> F.Column:
    """Deterministic per-row hash over ``cols`` (fixed order). NULLs get
    an explicit sentinel — ``concat_ws`` silently DROPS nulls, which
    would make (x, NULL) and (NULL, x) rows collide and hide drift."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x02null\x03")) for c in cols
    ]
    return md5_long(F.concat_ws("\x1f", *parts))


def bucket_fingerprints(
    df: DataFrame, pk: list[str], cols: list[str], n_buckets: int
) -> DataFrame:
    """Per-bucket ``(bucket, n_rows, fp)`` where fp = sum(row_hash) mod
    2^60. One scan, map-side combinable, ≤ n_buckets output rows."""
    h = row_hash(cols)
    return (
        df.select(bucket_expr(pk, n_buckets).alias("bucket"), h.alias("__h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("__h").cast("decimal(38,0)")) % F.lit(_FP_MOD))
            .cast("long")
            .alias("fp"),
        )
    )


def _differing_buckets(fp_a: DataFrame, fp_b: DataFrame) -> list[int]:
    a = fp_a.alias("a")
    b = fp_b.alias("b")
    j = a.join(b, F.col("a.bucket") == F.col("b.bucket"), "full_outer")
    diff = j.filter(
        ~(
            F.col("a.n_rows").eqNullSafe(F.col("b.n_rows"))
            & F.col("a.fp").eqNullSafe(F.col("b.fp"))
        )
    ).select(F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"))
    # bounded collect: ≤ n_buckets ints (the same bound as the merge's
    # affected-bucket list)
    return sorted(r["bucket"] for r in diff.collect())


def reconcile_frames(
    a: DataFrame,
    b: DataFrame,
    pk: list[str],
    cols: list[str],
) -> DataFrame:
    """Row-level diff of two pre-pruned frames: full-outer join on PK,
    classify by per-row hash. Output: pk cols + ``status`` + every
    compare col twice (``a_<col>`` / ``b_<col>``, NULL on the absent
    side)."""
    ha = a.select(*pk, *[F.col(c).alias(f"a_{c}") for c in cols]).withColumn(
        "__ha", row_hash([f"a_{c}" for c in cols])
    )
    hb = b.select(*pk, *[F.col(c).alias(f"b_{c}") for c in cols]).withColumn(
        "__hb", row_hash([f"b_{c}" for c in cols])
    )
    cond = None
    for c in pk:
        eq = ha[c].eqNullSafe(hb[c])
        cond = eq if cond is None else (cond & eq)
    j = ha.join(hb, cond, "full_outer")
    status = (
        F.when(F.col("__hb").isNull(), F.lit("added"))
        .when(F.col("__ha").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
    )
    out = j.withColumn("status", status).filter(F.col("status").isNotNull())
    key_cols = [F.coalesce(ha[c], hb[c]).alias(c) for c in pk]
    return out.select(
        *key_cols,
        "status",
        *[f"a_{c}" for c in cols],
        *[f"b_{c}" for c in cols],
    )


def reconcile_targets(
    target_a, target_b, cols: list[str]
) -> tuple[DataFrame, dict]:
    """Merkle reconcile of two bucketed merge targets sharing a
    MergeConfig shape (same pk / n_buckets — asserted). Returns
    ``(diff_df, stats)``; the descend stage reads ONLY the buckets whose
    fingerprints differ, through each target's bucket-pruned ``read``.
    """
    _check_shapes(target_a, target_b)
    pk = list(target_a.cfg.pk)
    n = target_a.cfg.n_buckets
    fp_a = bucket_fingerprints(target_a.read(), pk, cols, n)
    fp_b = bucket_fingerprints(target_b.read(), pk, cols, n)
    diff_buckets = _differing_buckets(fp_a, fp_b)
    stats = {"n_buckets": n, "n_buckets_differing": len(diff_buckets)}
    # buckets=[] prunes everything but keeps the exact output schema
    a = target_a.read(buckets=diff_buckets)
    b = target_b.read(buckets=diff_buckets)
    return reconcile_frames(a, b, pk, cols), stats


def _check_shapes(target_a, target_b):
    cfg_a, cfg_b = target_a.cfg, target_b.cfg
    if list(cfg_a.pk) != list(cfg_b.pk) or cfg_a.n_buckets != cfg_b.n_buckets:
        raise ValueError(
            "reconcile: targets must share pk and n_buckets "
            f"(got pk {cfg_a.pk}/{cfg_b.pk}, buckets "
            f"{cfg_a.n_buckets}/{cfg_b.n_buckets})"
        )


def reconcile_snapshots(target_a, target_b) -> tuple[DataFrame, dict]:
    """Scan-free Merkle reconcile of two SnapshotMergeTargets with
    ``harvest_fingerprints`` enabled: the fingerprint stage reads ONLY
    the two manifests (commit-time per-bucket (count, fp) entries — zero
    data I/O, the steady-state anti-entropy check at 100 TB), then
    descends into buckets whose entries differ. Buckets MISSING a
    fingerprint on either side (committed before harvesting was enabled,
    or present on only one table) descend conservatively and are counted
    separately in the stats. Raises if the two manifests fingerprinted
    different column sets (not comparable)."""
    _check_shapes(target_a, target_b)
    pk = list(target_a.cfg.pk)
    ma = target_a._manifest() or {}
    mb = target_b._manifest() or {}
    ca, cb = ma.get("fp_cols"), mb.get("fp_cols")
    if ca is None or cb is None:
        raise ValueError(
            "reconcile_snapshots: no commit-time fingerprints in the "
            "manifest — enable harvest_fingerprints on both targets (or "
            "use reconcile_targets for the scan-based path)"
        )
    if ca != cb:
        raise ValueError(
            f"reconcile_snapshots: fingerprint column sets differ "
            f"({ca} vs {cb}) — fingerprints are not comparable"
        )
    fa, fb = ma.get("fps", {}), mb.get("fps", {})
    ba, bb = ma.get("buckets", {}), mb.get("buckets", {})
    live = set(ba) | set(bb)
    # a harvesting HOLE is a bucket that exists on a side but has no
    # fingerprint there (committed while the flag was off / manifest
    # damage) — distinct from a bucket absent on one side, which is just
    # drift the normal compare catches (entry vs None)
    missing = sorted(
        int(b)
        for b in live
        if (b in ba and fa.get(b) is None) or (b in bb and fb.get(b) is None)
    )
    differing = sorted(
        int(b)
        for b in live
        if fa.get(b) != fb.get(b) or int(b) in set(missing)
    )
    stats = {
        "n_buckets": target_a.cfg.n_buckets,
        "n_buckets_differing": len(differing),
        "n_buckets_missing_fp": len(missing),
    }
    cols = [c for c in ca if c not in set(pk)]
    a = target_a.read(buckets=differing)
    b = target_b.read(buckets=differing)
    return reconcile_frames(a, b, pk, cols), stats
