"""Incremental view maintenance (IVM) over CDC merges.

The reference recomputes downstream aggregates from the silver table after
each merge; at 100 TB a grouped aggregate should instead be MAINTAINED
from the change set — classic delta-based IVM:

    new_counts(g) = old_counts(g)
                  − |old target rows for changed keys in group g|
                  + |post-merge rows for changed keys in group g|

Both correction terms are computed from the (small) change batch and the
(bucket-pruned) pre-merge state of the affected keys — never from a full
table scan. COUNT per group is shown here; any abelian-group aggregate
(SUM, signed counts) maintains the same way.

Scale shape: one semi-join of the affected buckets against change keys
(both sides pruned), two tiny group-by-G aggs, one full-outer merge of
(≤|G|)-row frames. The maintained view never scans the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_counts(rows: DataFrame, group_col: str, count_col: str = "n") -> DataFrame:
    """Bootstrap: (group, count) of the current state."""
    return rows.groupBy(group_col).agg(F.count(F.lit(1)).alias(count_col))


def apply_count_delta(
    counts: DataFrame,
    removed: DataFrame,
    added: DataFrame,
    group_col: str,
    count_col: str = "n",
) -> DataFrame:
    """counts − removed-per-group + added-per-group (rows with count 0
    drop out, so the view matches a fresh GROUP BY exactly)."""
    minus = removed.groupBy(group_col).agg((-F.count(F.lit(1))).alias("__d_minus"))
    plus = added.groupBy(group_col).agg(F.count(F.lit(1)).alias("__d_plus"))
    delta = (
        minus.join(plus, group_col, "full_outer")
        .select(
            group_col,
            (F.coalesce("__d_minus", F.lit(0)) + F.coalesce("__d_plus", F.lit(0))).alias(
                "__delta"
            ),
        )
    )
    return (
        counts.join(delta, group_col, "full_outer")
        .select(
            group_col,
            (F.coalesce(count_col, F.lit(0)) + F.coalesce("__delta", F.lit(0))).alias(
                count_col
            ),
        )
        .filter(F.col(count_col) != 0)
    )


def maintain_counts_through_merge(
    target,
    changes: DataFrame,
    counts: DataFrame | None,
    group_col: str,
) -> tuple[DataFrame, dict]:
    """Run ``target.merge(changes)`` while maintaining a (group, n) view
    from the delta; returns (new_counts, merge_stats).

    ``changes``: deduped change set (build_changes output). The pre-merge
    contribution of the changed keys is read bucket-pruned BEFORE the
    merge; the post-merge contribution is the non-delete change rows
    (matched updates replace, inserts add, deletes remove — exactly the
    rows the merge writes for those keys).
    """
    if target.cfg.update_only_op_u or target.cfg.strict_ts_guard:
        # with gated updates a blocked change keeps the OLD row — the
        # "post-merge rows = non-delete winners" identity breaks; the view
        # would need the merge's own take_s predicate. Fail loudly.
        raise ValueError(
            "maintain_counts_through_merge requires default merge semantics"
        )
    pk = list(target.cfg.pk)
    if counts is None:
        counts = group_counts(target.read(), group_col) if target.exists() else (
            changes.sparkSession.createDataFrame([], f"{group_col} string, n long")
        )
    # pre-merge rows for the changed keys only (bucket-pruned read +
    # broadcast-able key set: the change batch is small by construction)
    keys = changes.select(*pk).distinct()
    from dataplatform_cdc_pipeline_spark.operators.merge_target import bucket_expr

    buckets = [
        r["b"]
        for r in keys.select(bucket_expr(pk, target.cfg.n_buckets).alias("b"))
        .distinct()
        .collect()
    ]
    old = target.read(buckets=buckets).join(keys, pk, "left_semi")
    new = changes.filter(F.col("__op") != "d")
    # evaluate the view delta BEFORE the merge mutates the directories the
    # bucket-pruned read is lazily reading from
    new_counts = apply_count_delta(
        counts, old.select(group_col), new.select(group_col), group_col
    ).localCheckpoint(eager=True)
    stats = target.merge(changes)
    return new_counts, stats
