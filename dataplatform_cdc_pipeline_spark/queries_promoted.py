"""The three r10-promoted registry queries (registry 240 -> 243).

Staged during the r7-r9 registry freeze (the freeze barred new entries
until the never-driver-verified backlog drained; the r10 window drains
it to zero) and promoted in r10 per the r9 verdict, task 2: these are
the backlog ideas the r8 verdict named for promotion, in its priority
order, each oracle-gated at sf0.001 AND sf0.01 for two rounds before
registration (tests/test_promoted_queries.py). They sit at the registry
TAIL (_PRIORITY positions 241-243) and lead the r11 driver window as
its never-driver-verified head.

1. ``ivf_refit_lifecycle`` — registry twin of the r8 refit path
   (operators/ivf_index.py): drift fires ``needs_refit``, ``refit``
   rebuilds the frozen artifacts from the accumulated corpus, and the
   post-refit probes are reproduced bit-exactly by the oracle's
   re-learned artifact chain. The only r8 feature with no oracle-gated
   query until now.
2. ``txn_recover_torn`` — oracle-visible 2PC recovery
   (operators/multi_txn.MultiTableTxn.recover, previously
   unit-test-only): a transaction decided but not finalized leaves
   direct reads on the OLD versions (the documented in-doubt window,
   captured as ``*_pre`` rows), and ``recover()`` re-finalizes it —
   presumed commit — bringing both tables to the transactional state.
3. ``dv_fold_crossover`` — the DV sink's fold lifecycle
   (operators/dv_target.py), whose economics scripts/dv_read_bench.py
   measured (SCALE.md "DV mask read tax"): the mask accumulates (count
   oracle-checked), the masked read equals the folded read (both row
   sets hash-gated), ``compact()`` clears every tombstone, and the
   auto-fold threshold fires on the next delete batch.

Reference parity: the reference has none of these surfaces (no vector
index, no cross-table transaction, no merge-on-read deletes) — all
three are beyond-reference platform operators (SURVEY.md §2 flank).
"""

from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark import bench_phases
from dataplatform_cdc_pipeline_spark.sources.tables import load_table, spread_scan

_SPLIT = "2024-01-15 00:00:00"
_ROW_SCHEMA = "tbl string, key string, val long"


# ---------------------------------------------------------------------------
# 1. IVF refit lifecycle (drift -> needs_refit -> refit -> probes)
# ---------------------------------------------------------------------------


def q_ivf_refit_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refit escape hatch of the persisted IVF,SQ8 index as one
    oracle-gated lifecycle: bootstrap on the base corpus (vec_id % 10 ∉
    {3,7}) → probe → a DRIFTED batch (b1 scaled ×3, exceeding the frozen
    per-dimension range) makes ``needs_refit`` fire (signal row) and, if
    added anyway, produces the documented unclamped |codes| > 127 probe
    scores (phase 2) → ``refit`` re-learns centroids + scales over the
    accumulated corpus and re-encodes every row (batch tag 'refit1') →
    the drift signal clears (signal row) and phase-3 probes rank by the
    re-learned artifacts. The oracle rebuilds BOTH artifact sets
    relationally — a refit that forgot to re-encode old rows, kept stale
    scales, or lost the drifted batch diverges the hash."""
    from dataplatform_cdc_pipeline_spark.operators.ivf_index import (
        IncrementalIvfIndex,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter((F.col("vec_id") % 10 != 3) & (F.col("vec_id") % 10 != 7))
    drifted = emb.filter(F.col("vec_id") % 10 == 3).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
        "label",
    )
    queries = emb.filter(F.col("vec_id") < 5)
    idx = IncrementalIvfIndex(spark, tempfile.mkdtemp(prefix="ivf_refit_q_") + "/ix")
    idx.bootstrap("base", base)
    bench_phases.mark("bootstrap")

    def probe(phase: int) -> DataFrame:
        return (
            idx.probe(queries, k=5, nprobe=2)
            .select(
                F.lit(phase).alias("phase"),
                F.lit("probe").alias("kind"),
                "query_id",
                "rk",
                "nbr_id",
                "nbr_batch",
                "score",
            )
            .localCheckpoint(eager=True)
        )

    p1 = probe(1)
    bench_phases.mark("probe")
    sig_drift_pre = int(idx.needs_refit(drifted))  # 1: out of frozen range
    sig_base_pre = int(idx.needs_refit(base))  # 0: in range by construction
    bench_phases.mark("drift_check")
    idx.add_batch("b1", drifted)  # unclamped honesty: |codes| > 127
    bench_phases.mark("delta_add")
    p2 = probe(2)
    bench_phases.mark("probe")
    idx.refit("refit1", base.unionByName(drifted))
    bench_phases.mark("refit")
    sig_drift_post = int(idx.needs_refit(drifted))  # 0: scales re-learned
    bench_phases.mark("drift_check")
    p3 = probe(3)
    signals = spark.createDataFrame(
        [
            (2, "needs_refit_drifted", sig_drift_pre),
            (2, "needs_refit_base", sig_base_pre),
            (3, "needs_refit_drifted_post", sig_drift_post),
        ],
        "phase int, kind string, score long",
    ).select(
        "phase",
        "kind",
        F.lit(None).cast("long").alias("query_id"),
        F.lit(None).cast("int").alias("rk"),
        F.lit(None).cast("long").alias("nbr_id"),
        F.lit(None).cast("string").alias("nbr_batch"),
        "score",
    )
    return p1.unionByName(p2).unionByName(p3).unionByName(signals)


#: Oracle: the SQL_INCREMENTAL_IVF_BATCH machinery with TWO artifact
#: sets — A learned over the bootstrap rows, B re-learned over the full
#: corpus (the refit) — and the drift signal as max-per-dimension range
#: comparisons against each scale set (frozen_mx > 0 matches
#: scale_drift's null-ratio convention for zero dimensions).
SQL_IVF_REFIT_LIFECYCLE = """
WITH v AS (
  SELECT vec_id, label,
         CASE WHEN vec_id % 10 = 3
              THEN list_transform(embedding, x -> x::DOUBLE * 3.0)
              ELSE list_transform(embedding, x -> x::DOUBLE) END AS vec,
         CASE WHEN vec_id % 10 = 3 THEN 1 ELSE 0 END AS bord
  FROM embeddings WHERE vec_id % 10 != 7),
m AS (
  SELECT vec_id, pos, CAST(round(x * 1000000.0) AS BIGINT) AS mv
  FROM (SELECT vec_id, unnest(vec) AS x,
               generate_subscripts(vec, 1) AS pos FROM v)),
-- artifacts A: frozen at bootstrap (bord = 0 rows only)
cma AS (
  SELECT b.label AS cell, m.pos, CAST(floor(sum(m.mv) / count(*)) AS DOUBLE) AS c
  FROM m JOIN (SELECT vec_id, label FROM v WHERE bord = 0) b USING (vec_id)
  GROUP BY 1, 2),
centa AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM cma GROUP BY cell),
scalea AS (
  SELECT pos, max(abs(mv)) AS mx
  FROM m JOIN (SELECT vec_id FROM v WHERE bord = 0) b USING (vec_id)
  GROUP BY pos),
codesa AS (
  SELECT vec_id, m.pos,
         CASE WHEN s.mx = 0 THEN 0
              ELSE (CASE WHEN mv < 0 THEN -1 ELSE 1 END)
                   * CAST(floor(abs(mv) * 127.0 / s.mx) AS BIGINT) END AS code
  FROM m JOIN scalea s ON m.pos = s.pos),
-- artifacts B: the refit re-learns BOTH over the accumulated corpus
cmb AS (
  SELECT b.label AS cell, m.pos, CAST(floor(sum(m.mv) / count(*)) AS DOUBLE) AS c
  FROM m JOIN (SELECT vec_id, label FROM v) b USING (vec_id)
  GROUP BY 1, 2),
centb AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM cmb GROUP BY cell),
scaleb AS (SELECT pos, max(abs(mv)) AS mx FROM m GROUP BY pos),
codesb AS (
  SELECT vec_id, m.pos,
         CASE WHEN s.mx = 0 THEN 0
              ELSE (CASE WHEN mv < 0 THEN -1 ELSE 1 END)
                   * CAST(floor(abs(mv) * 127.0 / s.mx) AS BIGINT) END AS code
  FROM m JOIN scaleb s ON m.pos = s.pos),
acella AS (
  SELECT vec_id, bord, cell FROM (
    SELECT r.vec_id, r.bord, c.cell,
           row_number() OVER (
             PARTITION BY r.vec_id
             ORDER BY list_dot_product(r.vec, c.centroid) /
                      (sqrt(list_dot_product(r.vec, r.vec)) *
                       sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                      c.cell ASC) AS rk
    FROM v r CROSS JOIN centa c) WHERE rk = 1),
acellb AS (
  SELECT vec_id, bord, cell FROM (
    SELECT r.vec_id, r.bord, c.cell,
           row_number() OVER (
             PARTITION BY r.vec_id
             ORDER BY list_dot_product(r.vec, c.centroid) /
                      (sqrt(list_dot_product(r.vec, r.vec)) *
                       sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                      c.cell ASC) AS rk
    FROM v r CROSS JOIN centb c) WHERE rk = 1),
-- queries are UNSCALED (the probe frame comes from the raw table)
qv AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> x::DOUBLE) AS vec
  FROM embeddings WHERE vec_id < 5),
qm AS (
  SELECT vec_id AS query_id, pos, CAST(round(x::DOUBLE * 1000000.0) AS BIGINT) AS mv
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings WHERE vec_id < 5)),
routeda AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.vec, c.centroid) /
                      (sqrt(list_dot_product(q.vec, q.vec)) *
                       sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                      c.cell ASC) AS rk
    FROM qv q CROSS JOIN centa c) WHERE rk <= 2),
routedb AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.vec, c.centroid) /
                      (sqrt(list_dot_product(q.vec, q.vec)) *
                       sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                      c.cell ASC) AS rk
    FROM qv q CROSS JOIN centb c) WHERE rk <= 2),
-- phase 1: base rows only; phase 2: base + drifted; both artifacts A
cand12 AS (
  SELECT ph.phase, r.query_id, a.vec_id AS nbr_id, a.bord
  FROM (SELECT unnest([1, 2]) AS phase) ph
  CROSS JOIN routeda r
  JOIN acella a ON r.cell = a.cell AND a.vec_id <> r.query_id
  WHERE a.bord <= ph.phase - 1),
s12 AS (
  SELECT c12.phase, c12.query_id, c12.nbr_id,
         CASE c12.bord WHEN 1 THEN 'b1' ELSE 'base' END AS nbr_batch,
         CAST(SUM(c.code * qm.mv) AS BIGINT) AS score
  FROM cand12 c12
  JOIN codesa c ON c.vec_id = c12.nbr_id
  JOIN qm ON qm.query_id = c12.query_id AND qm.pos = c.pos
  GROUP BY 1, 2, 3, 4),
-- phase 3: the refit re-encoded everything under one batch tag
cand3 AS (
  SELECT r.query_id, a.vec_id AS nbr_id
  FROM routedb r JOIN acellb a ON r.cell = a.cell AND a.vec_id <> r.query_id),
s3 AS (
  SELECT 3 AS phase, cand3.query_id, cand3.nbr_id, 'refit1' AS nbr_batch,
         CAST(SUM(c.code * qm.mv) AS BIGINT) AS score
  FROM cand3
  JOIN codesb c ON c.vec_id = cand3.nbr_id
  JOIN qm ON qm.query_id = cand3.query_id AND qm.pos = c.pos
  GROUP BY 1, 2, 3, 4),
probes AS (
  SELECT phase, 'probe' AS kind, query_id, rk, nbr_id, nbr_batch, score FROM (
    SELECT *, row_number() OVER (PARTITION BY phase, query_id
                                 ORDER BY score DESC, nbr_id) AS rk
    FROM (SELECT * FROM s12 UNION ALL SELECT * FROM s3))
  WHERE rk <= 5),
driftm AS (
  SELECT pos, max(abs(mv)) AS dmx
  FROM m JOIN (SELECT vec_id FROM v WHERE bord = 1) d USING (vec_id)
  GROUP BY pos),
basem AS (
  SELECT pos, max(abs(mv)) AS bmx
  FROM m JOIN (SELECT vec_id FROM v WHERE bord = 0) d USING (vec_id)
  GROUP BY pos),
signals AS (
  SELECT 2 AS phase, 'needs_refit_drifted' AS kind,
         CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS INT) AS rk,
         CAST(NULL AS BIGINT) AS nbr_id, CAST(NULL AS VARCHAR) AS nbr_batch,
         (CASE WHEN EXISTS (SELECT 1 FROM driftm d JOIN scalea s USING (pos)
                            WHERE s.mx > 0 AND d.dmx > s.mx)
               THEN 1 ELSE 0 END)::BIGINT AS score
  UNION ALL
  SELECT 2, 'needs_refit_base', NULL, NULL, NULL, NULL,
         (CASE WHEN EXISTS (SELECT 1 FROM basem b JOIN scalea s USING (pos)
                            WHERE s.mx > 0 AND b.bmx > s.mx)
               THEN 1 ELSE 0 END)::BIGINT
  UNION ALL
  SELECT 3, 'needs_refit_drifted_post', NULL, NULL, NULL, NULL,
         (CASE WHEN EXISTS (SELECT 1 FROM driftm d JOIN scaleb s USING (pos)
                            WHERE s.mx > 0 AND d.dmx > s.mx)
               THEN 1 ELSE 0 END)::BIGINT)
SELECT * FROM probes
UNION ALL
SELECT phase, kind, query_id, rk, nbr_id, nbr_batch, score FROM signals
ORDER BY phase, kind, query_id, rk
"""


# ---------------------------------------------------------------------------
# 2. 2PC recovery (decide-but-not-finalize -> stale reads -> recover)
# ---------------------------------------------------------------------------


def q_txn_recover_torn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presumed-commit recovery made oracle-visible (multi_txn.py:244):
    window 1 commits normally through the two-table coordinator; window
    2's transaction is DECIDED (the meta-manifest CAS landed) but the
    coordinator 'crashes' before finalize — simulated by suppressing
    ``_finalize`` for exactly that commit, which leaves both staged
    manifests unlinked. Direct table reads in the in-doubt window still
    see the window-1 versions (the ``*_pre`` rows — 2PC's documented
    stale-read window). ``recover()`` then re-finalizes every decided
    transaction: it must link exactly the 2 staged manifests
    (``recover_links`` row) and bring both tables to the full
    transactional state. A recovery that lost a table, double-applied a
    window, or re-ran thunks diverges the hash (table B accumulates
    across windows, so any replay shifts its totals)."""
    from pyspark.sql import types as T

    from dataplatform_cdc_pipeline_spark.operators.multi_txn import MultiTableTxn
    from dataplatform_cdc_pipeline_spark.operators.snapshot_target import (
        SnapshotMergeTarget,
    )
    from dataplatform_cdc_pipeline_spark.plans.merge_plan import (
        build_changes,
        window_scan,
    )
    from dataplatform_cdc_pipeline_spark.queries import cdc_feed
    from dataplatform_cdc_pipeline_spark.sources.cdc import (
        USER_STATE_SCHEMA,
        user_state_config,
    )

    raw = cdc_feed(spark, sf_dir)
    cfg_a = user_state_config()
    cfg_b = user_state_config(target_table="type_totals", pk="event_type")
    b_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="txn_recover_q_")
    ta = SnapshotMergeTarget(spark, f"{tmp}/a", cfg_a, USER_STATE_SCHEMA)
    tb = SnapshotMergeTarget(spark, f"{tmp}/b", cfg_b, b_schema)
    txn = MultiTableTxn(f"{tmp}/txn")
    split = datetime.datetime(2024, 1, 15)

    def commit_window(lo, hi) -> None:
        w = window_scan(raw, cfg_a, lo, hi)
        changes_a = build_changes(w, USER_STATE_SCHEMA, cfg_a, deterministic_audit=True)
        delta = (
            w.select(F.get_json_object("data", "$.event_type").alias("event_type"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("__d"))
        )
        prev = tb.read().select("event_type", F.col("n_rows").alias("__prev"))
        changes_b = delta.join(prev, "event_type", "left").select(
            "event_type",
            (F.col("__d") + F.coalesce(F.col("__prev"), F.lit(0)))
            .cast("long")
            .alias("n_rows"),
            F.lit(None).cast("timestamp").alias("source_ts_ns_order"),
            F.lit(0).cast("long").alias("pos"),
            F.lit("c").alias("__op"),
        )
        txn.commit(
            [
                (ta, lambda ca=changes_a: ta.merge(ca)),
                (tb, lambda cb=changes_b: tb.merge(cb)),
            ]
        )

    commit_window(None, split)
    bench_phases.mark("txn_w1")
    # window 2: crash immediately AFTER the decide CAS, BEFORE finalize —
    # the staged manifests stay unlinked, exactly the in-doubt state
    # recover() exists for (presumed commit: decided => will finalize)
    orig_finalize = txn._finalize
    txn._finalize = lambda meta: None
    try:
        commit_window(split, None)
    finally:
        txn._finalize = orig_finalize
    bench_phases.mark("txn_w2_decided_not_finalized")

    def rows(tag_a: str, tag_b: str) -> DataFrame:
        a = ta.read().select(
            F.lit(tag_a).alias("tbl"),
            F.col("user_id").cast("string").alias("key"),
            F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("val"),
        )
        b = tb.read().select(
            F.lit(tag_b).alias("tbl"),
            F.col("event_type").alias("key"),
            F.col("n_rows").alias("val"),
        )
        return a.unionByName(b)

    # the in-doubt window IS observable through direct reads: pin it
    # eagerly before recovery flips the manifests underneath the plan
    pre = rows("state_pre", "totals_pre").localCheckpoint(eager=True)
    n_links = txn.recover()
    bench_phases.mark("recover")
    post = rows("state", "totals")
    links = spark.createDataFrame(
        [("recover_links", "n", n_links)], _ROW_SCHEMA
    )
    return pre.unionByName(post).unionByName(links)


SQL_TXN_RECOVER_TORN = f"""
WITH r1 AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'd'
              WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS op,
         value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts::TIMESTAMP) DESC,
                                     event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_SPLIT}'),
r2 AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'd'
              WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS op,
         value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts::TIMESTAMP) DESC,
                                     event_id DESC) AS rn
  FROM events)
SELECT 'state_pre' AS tbl, user_id::VARCHAR AS key,
       floor(value * 1000000.0)::BIGINT AS val
FROM r1 WHERE rn = 1 AND op != 'd'
UNION ALL
SELECT 'totals_pre', event_type, count(*)::BIGINT
FROM events WHERE ts <= TIMESTAMP '{_SPLIT}' GROUP BY event_type
UNION ALL
SELECT 'state', user_id::VARCHAR, floor(value * 1000000.0)::BIGINT
FROM r2 WHERE rn = 1 AND op != 'd'
UNION ALL
SELECT 'totals', event_type, count(*)::BIGINT FROM events GROUP BY event_type
UNION ALL
SELECT 'recover_links', 'n', 2::BIGINT
ORDER BY tbl, key
"""


# ---------------------------------------------------------------------------
# 3. DV fold lifecycle (mask accumulates -> fold clears -> auto-fold)
# ---------------------------------------------------------------------------

FOLD_DEL_MOD = 7  # post-fold delete batch: survivors with user_id % 7 == 0


def q_dv_fold_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-on-read fold lifecycle whose read-tax economics
    scripts/dv_read_bench.py measured (SCALE.md "DV mask read tax"),
    semantics now hash-gated end to end: one full-window merge leaves
    the final-op-'d' keys as TOMBSTONES (``mask_before_fold`` row counts
    them); the masked read and the post-``compact()`` folded read must
    produce identical row sets (both returned, both oracle-recomputed);
    the fold clears every tombstone (``mask_after_fold`` = 0) and
    reports the surviving row count (``rows_folded``); a subsequent
    delete batch over ``auto_fold_max = 0`` must trigger the
    fold-on-threshold path inside ``merge`` itself (``mask_after_autofold``
    = 0, final state short the deleted keys). A mask that leaked through
    a read, survived a fold, or missed the auto-fold threshold diverges
    the hash."""
    from dataplatform_cdc_pipeline_spark.engine import run_merge
    from dataplatform_cdc_pipeline_spark.operators.dv_target import DvMergeTarget
    from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
    from dataplatform_cdc_pipeline_spark.queries import cdc_feed
    from dataplatform_cdc_pipeline_spark.sources.cdc import (
        USER_STATE_SCHEMA,
        user_state_config,
    )

    raw = cdc_feed(spark, sf_dir)
    cfg = user_state_config()
    tmp = tempfile.mkdtemp(prefix="dv_fold_q_")
    target = DvMergeTarget(spark, f"{tmp}/t", cfg, USER_STATE_SCHEMA)
    audit = WatermarkStore(spark, f"{tmp}/a")
    run_merge(
        spark, cfg, target, audit, raw=raw, window=(None, None),
        deterministic_audit=True,
    )
    bench_phases.mark("merge")

    def state_rows(tag: str) -> DataFrame:
        return target.read().select(
            F.lit(tag).alias("tbl"),
            F.col("user_id").cast("string").alias("key"),
            F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("val"),
        )

    mask_before = target.mask_size()
    masked = state_rows("masked").localCheckpoint(eager=True)
    bench_phases.mark("masked_read")
    rows_folded = target.compact()
    bench_phases.mark("fold")
    mask_after = target.mask_size()
    folded = state_rows("folded").localCheckpoint(eager=True)
    bench_phases.mark("folded_read")

    # delete batch over a zero threshold: merge() itself must fold
    target.auto_fold_max = 0
    dels = (
        target.read()
        .filter(F.col("user_id") % FOLD_DEL_MOD == 0)
        .select(
            "user_id",
            "event_type",
            "value",
            "k",
            F.lit(None).cast("timestamp").alias("source_ts_ns_order"),
            F.col("user_id").cast("long").alias("pos"),
            F.lit("d").alias("__op"),
        )
    )
    target.merge(dels)
    bench_phases.mark("autofold_merge")
    mask_autofold = target.mask_size()
    final = state_rows("after_autofold")
    counters = spark.createDataFrame(
        [
            ("mask_before_fold", "n", mask_before),
            ("mask_after_fold", "n", mask_after),
            ("rows_folded", "n", rows_folded),
            ("mask_after_autofold", "n", mask_autofold),
        ],
        _ROW_SCHEMA,
    )
    return (
        masked.unionByName(folded).unionByName(final).unionByName(counters)
    )


SQL_DV_FOLD_CROSSOVER = f"""
WITH ranked AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'd'
              WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS op,
         value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts::TIMESTAMP) DESC,
                                     event_id DESC) AS rn
  FROM events),
survivors AS (
  SELECT user_id, floor(value * 1000000.0)::BIGINT AS val
  FROM ranked WHERE rn = 1 AND op != 'd'),
tombstoned AS (SELECT user_id FROM ranked WHERE rn = 1 AND op = 'd')
SELECT 'masked' AS tbl, user_id::VARCHAR AS key, val FROM survivors
UNION ALL
SELECT 'folded', user_id::VARCHAR, val FROM survivors
UNION ALL
SELECT 'after_autofold', user_id::VARCHAR, val
FROM survivors WHERE user_id % {FOLD_DEL_MOD} != 0
UNION ALL
SELECT 'mask_before_fold', 'n', count(*)::BIGINT FROM tombstoned
UNION ALL
SELECT 'mask_after_fold', 'n', 0::BIGINT
UNION ALL
SELECT 'rows_folded', 'n', count(*)::BIGINT FROM survivors
UNION ALL
SELECT 'mask_after_autofold', 'n', 0::BIGINT
ORDER BY tbl, key
"""


PROMOTED_QUERIES = {
    "ivf_refit_lifecycle": q_ivf_refit_lifecycle,
    "txn_recover_torn": q_txn_recover_torn,
    "dv_fold_crossover": q_dv_fold_crossover,
}

PROMOTED_ORACLES = {
    "ivf_refit_lifecycle": SQL_IVF_REFIT_LIFECYCLE,
    "txn_recover_torn": SQL_TXN_RECOVER_TORN,
    "dv_fold_crossover": SQL_DV_FOLD_CROSSOVER,
}
