"""Z-order (Morton-curve) layout keys — multi-dimensional clustering for
the maintenance path.

``bq_clustering_field``'s linear sort (merge_target.py) narrows parquet
min/max stats on the LEADING sort column only: a filter on the second
clustering column still overlaps every row group. Interleaving the bits
of per-column quantile bins produces a key whose sort order keeps BOTH
columns locally bounded — each contiguous run of rows covers a small
hyper-rectangle of the value space, so scans filtered on ANY clustered
column skip most row groups / files. This is what Delta/Iceberg's
``OPTIMIZE ... ZORDER BY`` does; like there, it belongs in maintenance
(:meth:`ParquetMergeTarget.compact`), not the per-merge hot path.

Mechanics (all native Columns):
- **bins**: each column maps to ``#{boundaries ≤ x}`` over its own
  ``2^bits − 1`` quantile boundaries (computed once via
  ``approxQuantile`` — a driver-side index artifact of ≤ 63 numbers per
  column at the default 6 bits, exactly how Delta's range-bin sampling
  works). Quantile bins, not min/max scaling, so skewed columns still
  fill all bins. NULLs sort first (bin −1 → key −1 handled by nulls-
  first ordering of the key itself).
- **interleave**: bit i of column j lands at position ``i·n_cols + j``
  — a chain of ``bits · n_cols`` shift/or ops, whole-stage-codegen'd.
- The key is an ORDERING artifact only — it is never written to the
  table (sort expressions, not materialized columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 6  # 64 bins/dim; 2 dims -> 4096 cells, plenty for rg-skipping


def quantile_boundaries(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS, relative_error: float = 0.001
) -> dict[str, list[float]]:
    """Per-column quantile boundaries (2^bits − 1 values each) — the
    driver-side index artifact the binning expressions inline. One pass
    over the data for all columns (Greenwald-Khanna sketch)."""
    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    res = df.stat.approxQuantile(cols, probs, relative_error)
    return {c: bounds for c, bounds in zip(cols, res)}


def bin_expr(col: Column | str, boundaries: list[float]) -> Column:
    """#{boundaries ≤ x} as a long in [0, len(boundaries)] — an O(bins)
    fold over a literal array, JVM-side. NULL input → NULL bin (the fold
    alone would count a NULL comparison as 'below every boundary' and
    land NULLs in bin 0 with a non-NULL key — the explicit isNull guard
    keeps the documented nulls-first placement honest)."""
    c = F.col(col) if isinstance(col, str) else col
    bounds = F.array(*[F.lit(float(b)) for b in boundaries])
    fold = F.aggregate(
        bounds,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(c.cast("double") >= b, 1).otherwise(0),
    )
    return F.when(c.isNull(), F.lit(None).cast("long")).otherwise(fold)


def zorder_key_expr(bin_cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of pre-binned columns: bit i of column j →
    position i·n + j of the key. NULL in any column → NULL key (a NULL
    bin propagates through the ``+`` chain), sorting first under Spark's
    nulls-first ascending default."""
    n = len(bin_cols)
    if n == 0:
        raise ValueError("zorder_key_expr: need at least one column")
    key = F.lit(0).cast("long")
    for j, b in enumerate(bin_cols):
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j
            )
    return key


def zorder_sort_exprs(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> list[Column]:
    """The sort expressions ``compact(zorder_by=...)`` feeds the staged
    write: one Morton key over quantile bins of ``cols``. Computed fresh
    per call (boundaries reflect the CURRENT data)."""
    bounds = quantile_boundaries(df, cols, bits)
    return [zorder_key_expr([bin_expr(c, bounds[c]) for c in cols], bits)]
