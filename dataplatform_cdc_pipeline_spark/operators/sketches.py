"""Mergeable distinct-count sketches — the KMV (k-minimum-values)
estimator, a bottom-k theta sketch.

Why not HyperLogLog: Spark's `approx_count_distinct` is an HLL whose
register layout is engine-private — its estimate can't be verified
against another engine, and two systems' HLLs don't merge. KMV keeps the
k SMALLEST distinct hash values of the key; that set is

- **deterministic**: hashes come from the shared 60-bit MD5 primitive
  (functions/hashing.py), identical in Spark and DuckDB — the sketch AND
  its estimate are hash-oracle-able, bit for bit;
- **mergeable**: the union's bottom-k is the bottom-k of the union of
  per-part bottom-k sets (each global minimum lives in some part's
  bottom-k), so per-partition/per-group sketches combine by "union, keep
  k smallest" — the property that makes a sketch usable at 100 TB (build
  per partition, merge tiny states up a tree; same algebra as
  DataSketches' theta sketch);
- **tiny**: k int64s per group, independent of data size.

Estimator (Bar-Yossef et al. 2002; Beyer et al. "Distinct-value
estimation" SIGMOD'07): with U = kth smallest hash / 2^60 an estimate of
the k-th order statistic of n uniform draws, n̂ = (k-1)/U. When fewer
than k distinct hashes exist the sketch IS the distinct set and the
count is exact. Relative std error ≈ 1/sqrt(k-2) (~18% at k=32) —
bounded by a differential test, and exact twins ride along in the query
output so the error is visible, not asserted.

Scale shape: distinct-by-(group, hash) is one map-side-combining
shuffle; the per-group bottom-k window runs with a WindowGroupLimit
partial top-k BEFORE its exchange (same plan shape as dedup-latest), so
only ≤ k rows per group per partition shuffle. The merged-total row
re-ranks the ≤ k·|groups| retained hashes — driver-free throughout.

Reference parity: the reference has no sketch surface (its audit counts
are exact COUNTs) — beyond-reference operator for corpus analytics where
exact DISTINCT over 100 TB is its own shuffle-heavy job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long

#: 16^15 — the size of the 60-bit MD5 hash space (functions/hashing.py).
HASH_SPACE = 1 << 60


def _estimate(n_sketch: Column, kth: Column, k: int) -> Column:
    """(k-1)/U scaled to the integer hash space; exact when the sketch
    holds every distinct hash. The bigint→double casts and the one
    division are identical IEEE ops in Spark and DuckDB, so the floor is
    engine-stable (result magnitude ~n̂, error ~1e-13 absolute)."""
    return (
        F.when(n_sketch < F.lit(k), n_sketch.cast("long"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / kth.cast("double")
            ).cast("long")
        )
        .alias("est_distinct")
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 32,
) -> DataFrame:
    """Per-group KMV sketch rows: (…group_cols, hv, rk) — the k smallest
    distinct 60-bit hashes of ``key_col``, ranked ascending.

    This is the sketch STATE (what a sink would persist / a coordinator
    would merge); :func:`kmv_estimate` folds it to counts.
    """
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2 (estimator divides by k-1), got {k}")
    from pyspark.sql import Window

    groups = group_cols or []
    hashed = df.select(
        *groups, md5_long(F.col(key_col).cast("string")).alias("hv")
    ).distinct()
    if not groups:
        # GLOBAL sketch: a bare ORDER BY window is a single-partition sort
        # of every distinct hash — the classic global-window scale trap.
        # Two-phase instead (the sketch's own merge algebra): bottom-k per
        # hash-salt shard (the per-shard window gets the WindowGroupLimit
        # partial top-k before its exchange), then re-rank the ≤ 64·k
        # survivors — exactly kmv_merge over the shard sketches.
        shards = hashed.withColumn("__shard", F.pmod(F.col("hv"), F.lit(64)))
        ws = Window.partitionBy("__shard").orderBy(F.col("hv").asc())
        survivors = (
            shards.withColumn("rk", F.row_number().over(ws))
            .filter(F.col("rk") <= k)
            .select("hv")
        )
        return kmv_merge(survivors, [], k)
    w = Window.partitionBy(*groups).orderBy(F.col("hv").asc())
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*groups, "hv", "rk")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str] | None, k: int = 32) -> DataFrame:
    """Fold sketch rows to (…group_cols, n_sketch, kth_hash, est_distinct)."""
    groups = group_cols or []
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("kth_hash")
    )
    return agg.select(
        *groups,
        "n_sketch",
        "kth_hash",
        _estimate(F.col("n_sketch"), F.col("kth_hash"), k),
    )


def kmv_merge(sketch: DataFrame, group_cols: list[str] | None = None, k: int = 32) -> DataFrame:
    """Merge ALL sketch rows into ONE sketch over the union of their
    inputs: distinct retained hashes, re-ranked, bottom k. Exactly the
    sketch :func:`kmv_sketch` would build over the concatenated data when
    the groups partition it (each global bottom-k hash is in its own
    group's bottom-k). ``group_cols`` is accepted for call-site symmetry
    with :func:`kmv_sketch` but ignored — the merge always collapses
    every retained hash (the input is ≤ k·|groups| rows, so the single
    global window here is over sketch state, not data)."""
    from pyspark.sql import Window

    merged = sketch.select("hv").distinct()
    w = Window.orderBy(F.col("hv").asc())
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("hv", "rk")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_hash(item: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-i counter index for an item: the shared 60-bit MD5 primitive
    over a row-salted key, mod width — identical constants in any engine."""
    return F.pmod(md5_long(F.concat(F.lit(f"cms{row}|"), item.cast("string"))), F.lit(width))


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch state: (row, col, c) counter cells (Cormode &
    Muthukrishnan 2005). ``c[row][col] = #items hashing to col under the
    row's hash``; an item's estimate is ``min over rows`` of its cells —
    always ≥ the true count (collisions only ADD), within εN with
    probability 1−δ for width ≥ e/ε, depth ≥ ln(1/δ).

    Why this sketch here: counters are SUMS, so the state is
    deterministic, partition-order-independent, hash-oracle-able, and
    mergeable by plain cell-wise addition (two corpora's sketches add;
    pinned by the halves-vs-whole test) — the same algebra that lets a
    1000-executor build aggregate d·w-sized partials instead of
    shuffling items. One explode(depth) over the item stream feeding a
    map-side-combined groupBy; the state is depth·width cells regardless
    of data size.
    """
    rows = df.select(F.col(item_col).alias("__item")).filter(F.col("__item").isNotNull())
    # one struct per (row, col) pair, exploded — the per-row hash columns
    # are computed side by side in a single projection
    cells = rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_hash(F.col("__item"), i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc")
    ).select("rc.row", "rc.col")
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each item: (item, cms_n) with
    ``cms_n = min over rows of c[row][h_row(item)]`` — the sketch
    broadcast (d·w cells), one narrow join per item row."""
    probes = items.select(F.col(item_col).alias("item")).distinct()
    keyed = probes.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_hash(F.col("item"), i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("item", "rc.row", "rc.col")
    joined = keyed.join(F.broadcast(sketch), ["row", "col"], "left").select(
        "item", F.coalesce("c", F.lit(0)).alias("c")
    )
    return joined.groupBy("item").agg(F.min("c").alias("cms_n"))


# ---------------------------------------------------------------------------
# log2 histogram — a mergeable quantile sketch in exact integer space
# ---------------------------------------------------------------------------


def log2_bucket(value_us: Column) -> Column:
    """Power-of-two bucket of a non-negative integer (micro-space) value:
    bucket b covers [2^(b-1), 2^b − 1] (bucket 0 = zero/negative), i.e.
    the value's BIT LENGTH — computed as ``length(bin(v))``, exact and
    identical in Spark and DuckDB. The HdrHistogram/DDSketch idea with
    the coarsest (2×) relative-error bound, chosen because it needs no
    floats anywhere: a log-scale histogram whose buckets, counts, and
    quantile answers are all hash-oracle-able."""
    return (
        F.when(value_us <= 0, F.lit(0))
        .otherwise(F.length(F.bin(value_us)))
        .cast("int")
    )


def log2_histogram(
    df: DataFrame, value_us_col: str, group_cols: list[str]
) -> DataFrame:
    """(group…, bucket, cnt): one map-side-combined groupBy. MERGEABLE by
    plain count addition — the property that lets per-partition /
    per-day histograms roll up to the global one without rescanning
    (unit-pinned: halves sum to the whole)."""
    return df.groupBy(
        *group_cols, log2_bucket(F.col(value_us_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_quantiles(
    hist: DataFrame, group_cols: list[str], pcts: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Quantile UPPER BOUNDS from a log2 histogram: per group and percent
    p, the smallest bucket whose cumulative count reaches rank
    ``ceil(n·p/100)`` (= ``(n·p + 99) div 100``, pure integer), and its
    inclusive upper bound ``2^bucket − 1`` micro-units. The true p-th
    value lies in (ub/2, ub] — the 2× guarantee of power-of-two buckets."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    c = hist.withColumn("__cum", F.sum("cnt").over(w_cum)).withColumn(
        "__n", F.sum("cnt").over(w_all)
    )
    aggs = [F.max("__n").cast("long").alias("n_total")]
    for p in pcts:
        rank = F.expr(f"(__n * {p} + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("__cum") >= rank, F.col("bucket"))).alias(
                f"p{p}_bucket"
            )
        )
    out = c.groupBy(*group_cols).agg(*aggs)
    for p in pcts:
        out = out.withColumn(
            f"p{p}_ub_us", F.expr(f"shiftleft(1L, p{p}_bucket) - 1")
        )
    return out


def kmv_set_estimate(sk_a: DataFrame, sk_b: DataFrame, k: int = 32) -> DataFrame:
    """One-row SET-OPERATION estimates from two KMV sketches (Beyer et
    al. SIGMOD'07 §5): build the union sketch L = bottom-k of
    ``sk_a ∪ sk_b``, count the members of L that appear in BOTH input
    sketches (valid because every h ∈ L is below both sketches' kth
    thresholds whenever it is in both key sets), and scale:

    - ``est_union``       = (k-1)/U over L (the plain KMV estimator);
    - ``jaccard_ppm``     = n_both·1e6 div |L|  (ρ̂, exact integers);
    - ``est_intersection``= n_both·est_union div |L| (ρ̂ · n̂_∪).

    When |L| < k the union sketch holds EVERY distinct hash of A ∪ B, so
    n_both and the estimates are exact, not approximate — the same
    small-cardinality degeneracy the base estimator has, preserved here.

    Input frames are sketch STATE (≤ k rows each), so every join below
    is sketch-sized — this is coordinator algebra, not a data-plane
    shuffle; at 100 TB the per-segment sketches are built by
    :func:`kmv_sketch`'s two-phase shard merge and only their k-row
    results meet here."""
    a = sk_a.select("hv").distinct().withColumn("__in_a", F.lit(1))
    b = sk_b.select("hv").distinct().withColumn("__in_b", F.lit(1))
    union_sk = kmv_merge(a.select("hv").unionByName(b.select("hv")), [], k)
    l = union_sk.join(a, "hv", "left").join(b, "hv", "left")
    agg = l.agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.max("hv").alias("kth_union"),
        F.sum(
            F.when(F.col("__in_a").isNotNull() & F.col("__in_b").isNotNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_both"),
    )
    return (
        agg.select(
            "n_union_sketch",
            "kth_union",
            "n_both",
            _estimate(F.col("n_union_sketch"), F.col("kth_union"), k).alias(
                "est_union"
            ),
        )
        .withColumn("jaccard_ppm", F.expr("n_both * 1000000 div n_union_sketch"))
        .withColumn(
            "est_intersection", F.expr("n_both * est_union div n_union_sketch")
        )
    )
