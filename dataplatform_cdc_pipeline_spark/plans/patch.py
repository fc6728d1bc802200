"""Partial-image (patch) CDC updates: per-column last-non-null fold.

The reference assumes FULL row images — every update carries every
column (merge.sql:403-418 overwrites all columns on match). Real CDC
streams often ship SPARSE updates (only the changed columns present;
Maxwell's ``old``/partial ``data``, Debezium with ``column.mask`` /
lob-exclusion configs), and merging those through a full-image engine
nulls out the untouched columns — the classic silent-corruption bug
this module exists to prevent.

``patch_fold`` collapses a key's windowed sparse events into ONE
full-image change row the ordinary merge can apply:

- per data column, the value is the LAST NON-NULL in (ts, pos) order —
  an absent column in an update means "unchanged", not "set to NULL";
- a DELETE RESETS the fold: columns from before the latest delete never
  resurrect into a later re-insert (only rows strictly after the last
  'd' contribute values);
- the emitted op/ts/pos are the key's LATEST event's — so survivorship,
  late-replay and audit semantics stay identical to the full-image path.

Shape (the 100 TB part): ONE shuffle on the PK. The last-delete marker
is a window MAX over the key partition; the fold itself is a groupBy on
the SAME key — Catalyst reuses the partitioning, and every per-column
``MAX(struct(ts, pos, value))`` aggregate is map-side combinable
(struct comparison is lexicographic, so the max IS the last non-null;
no sort, no collect_list). A per-key collect_list+UDF formulation would
buffer whole key histories — this one carries one struct per column.

Known semantic limit, stated: NULL cannot be explicitly assigned through
a patch stream (absent and NULL are indistinguishable in a flat image).
Debezium solves this wire-side with explicit ``__set_null`` markers;
ingesting those would map to a sentinel before the fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def patch_fold(
    keyed: DataFrame,
    pk: list[str],
    data_cols: list[str],
    op_col: str = "__op",
    ts_col: str = "source_ts_ns_order",
    pos_col: str = "pos",
) -> DataFrame:
    """Sparse per-key event rows → one full-image change row per key.

    ``keyed``: one row per CDC event with ``pk`` columns, ``op_col``
    ('c'/'u'/'d'), ``ts_col``/``pos_col`` ordering, and ``data_cols``
    where absent-in-this-event columns are NULL.
    """
    seq = F.struct(F.col(ts_col), F.col(pos_col))
    w = Window.partitionBy(*pk)
    df = keyed.withColumn(
        "__last_d", F.max(F.when(F.col(op_col) == "d", seq)).over(w)
    )
    contributes = (F.col(op_col) != "d") & (
        F.col("__last_d").isNull() | (seq > F.col("__last_d"))
    )
    aggs = [
        F.max(F.struct(F.col(ts_col), F.col(pos_col), F.col(op_col))).alias("__latest"),
    ]
    for c in data_cols:
        aggs.append(
            F.max(
                F.when(contributes & F.col(c).isNotNull(), F.struct(seq.alias("s"), F.col(c).alias("v")))
            ).alias(f"__f_{c}")
        )
    folded = df.groupBy(*pk).agg(*aggs)
    is_delete = folded["__latest"][op_col] == "d"
    out_cols = [F.col(c) for c in pk]
    for c in data_cols:
        out_cols.append(
            F.when(is_delete, F.lit(None)).otherwise(F.col(f"__f_{c}")["v"]).alias(c)
        )
    out_cols += [
        F.col("__latest")[ts_col].alias(ts_col),
        F.col("__latest")[pos_col].alias(pos_col),
        F.when(is_delete, F.lit("d")).otherwise(F.col("__latest")[op_col]).alias(op_col),
    ]
    return folded.select(*out_cols)
