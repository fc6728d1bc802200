"""Record linkage: blocked fuzzy matching — approximate string joins
without the cross product.

A fuzzy join (edit distance ≤ k) is a cross join if expressed naively —
O(|L|·|R|) levenshtein calls kill any engine at scale. The standard
answer is BLOCKING (Fellegi-Sunter linkage; Christen's "Data Matching"):
generate cheap candidate keys per record, join on the keys (one ordinary
shuffle), verify only the candidates with the exact distance.

Block keys here: the lowercased ``block_len``-char PREFIX and SUFFIX.
Completeness: for a SINGLE edit (substitute/insert/delete) on strings of
length ≥ 2·block_len + 1, the edit either lies after the first
``block_len`` chars (prefix key survives) or before the last
``block_len`` (suffix key survives — inserts/deletes shift positions but
the last chars remain the last chars), so every true pair shares ≥ 1
key. For k > 1 this blocking is a recall/cost lever, not a guarantee —
use overlapping q-gram keys (the containment_pairs machinery) when
multi-edit recall must be complete.

Everything is native Columns: ``F.levenshtein`` is a JVM builtin (and a
DuckDB builtin with identical classic-edit-distance semantics, so the
whole operator is hash-oracle-able).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_keys_expr(col: Column | str, block_len: int = 4) -> Column:
    """[prefix key, suffix key] of the lowercased string."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.array(
        F.concat(F.lit("p:"), F.substring(c, 1, block_len)),
        F.concat(F.lit("s:"), F.substring(c, -block_len, block_len)),
    )


def blocked_fuzzy_pairs(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_edit: int = 1,
    block_len: int = 4,
) -> DataFrame:
    """(left value, right value, edit_dist ≤ max_edit) candidate-verified
    pairs. One shuffle on the block key; levenshtein runs only on
    same-block candidates (bounded by block selectivity, never |L|·|R|).
    """
    lite_l = left.select(F.col(left_col).alias("l_val")).distinct()
    lite_r = right.select(F.col(right_col).alias("r_val")).distinct()
    lb = lite_l.select("l_val", F.explode(block_keys_expr("l_val", block_len)).alias("bk"))
    rb = lite_r.select("r_val", F.explode(block_keys_expr("r_val", block_len)).alias("bk"))
    cand = lb.join(rb, "bk").select("l_val", "r_val").distinct()
    return cand.select(
        "l_val", "r_val", F.levenshtein("l_val", "r_val").alias("edit_dist")
    ).filter(F.col("edit_dist") <= max_edit)
