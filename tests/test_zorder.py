"""Z-order layout (operators/zorder.py + compact(zorder_by=...)):
interleave math, measured multi-column pruning benefit, and lossless
maintenance through the staged commit."""

import glob

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.zorder import (
    bin_expr,
    quantile_boundaries,
    zorder_key_expr,
)


def test_morton_interleave_exact(spark):
    """bit i of column j lands at position i*n + j: bins (5, 3) at 3 bits
    -> key 0b011011 = 27; single column degenerates to identity."""
    df = spark.createDataFrame([(5, 3)], "a long, b long")
    out = df.select(
        zorder_key_expr([F.col("a"), F.col("b")], bits=3).alias("k2"),
        zorder_key_expr([F.col("a")], bits=3).alias("k1"),
    ).collect()[0]
    # a=101: bit0->pos0, bit2->pos4 ; b=011: bit0->pos1, bit1->pos3
    assert out["k2"] == 1 + 2 + 8 + 16
    assert out["k1"] == 5


def test_bin_expr_quantiles_fill_bins(spark):
    """Quantile bins spread a skewed column across the full bin range
    (min/max scaling would collapse the long tail into one bin)."""
    df = spark.range(0, 4096).select((F.col("id") * F.col("id")).alias("x"))
    bounds = quantile_boundaries(df, ["x"], bits=4, relative_error=0.0)
    bins = df.select(bin_expr("x", bounds["x"]).alias("b"))
    counts = {r["b"]: r["n"] for r in bins.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 16  # every bin populated despite quadratic skew
    assert max(counts.values()) <= 2 * min(counts.values())


def _file_spans(path, col):
    """[(min, max)] of `col` across every parquet data file's row groups."""
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    return spans


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """The measured claim: with rows range-laid-out by the Morton key,
    a slab query on EITHER dimension overlaps a small fraction of files;
    a linear (x, y) sort bounds x but leaves y's spans full-width."""
    n = 40_000
    # two INDEPENDENT uniform dims (hash-derived; linear-congruential
    # pairs would be perfectly correlated and void the geometry)
    df = spark.range(0, n).select(
        F.pmod(F.xxhash64("id"), F.lit(65536)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(65536)).alias("y"),
    )
    from dataplatform_cdc_pipeline_spark.operators.zorder import zorder_sort_exprs

    zkey = zorder_sort_exprs(df, ["x", "y"], bits=6)[0]
    df.repartitionByRange(16, zkey).write.parquet(str(tmp_path / "zorder"))
    df.repartitionByRange(16, F.col("x"), F.col("y")).write.parquet(str(tmp_path / "linear"))

    def overlap_frac(path, col, lo, hi):
        spans = _file_spans(path, col)
        return sum(1 for mn, mx in spans if mx >= lo and mn <= hi) / len(spans)

    # ~1/16-wide slabs at several offsets (averaging over positions — a
    # slab crossing the curve's top-bit boundary is its local worst case)
    slabs = [(30_000, 34_095), (36_000, 40_095), (8_000, 12_095), (52_000, 56_095)]

    def avg(path, col):
        return sum(overlap_frac(path, col, *s) for s in slabs) / len(slabs)

    lin_x, lin_y = avg(str(tmp_path / "linear"), "x"), avg(str(tmp_path / "linear"), "y")
    z_x, z_y = avg(str(tmp_path / "zorder"), "x"), avg(str(tmp_path / "zorder"), "y")
    # linear layout: x prunes hard, y not at all
    assert lin_x <= 0.25 and lin_y >= 0.9, (lin_x, lin_y)
    # zorder layout: BOTH dimensions prune — y goes from no-skip to
    # strong skip at the cost of some leading-column selectivity
    assert z_y <= 0.5 and z_x <= 0.6, (z_x, z_y)
    assert z_y <= 0.5 * lin_y


def test_compact_zorder_is_lossless_and_mergeable(spark, tmp_path):
    """compact(zorder_by=...) through the staged commit: identical row
    set, version bumped, bad column refused, follow-up reads fine."""
    from pyspark.sql import types as T

    from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
    from dataplatform_cdc_pipeline_spark.sources.cdc import user_state_config

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("k", T.IntegerType()),
        ]
    )
    cfg = user_state_config(n_buckets=4)
    target = ParquetMergeTarget(spark, str(tmp_path / "t"), cfg, schema)
    changes = spark.range(0, 500).select(
        F.col("id").alias("user_id"),
        F.lit("e").alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
        F.pmod(F.col("id") * 7, F.lit(100)).cast("int").alias("k"),
        F.timestamp_micros(F.col("id") * 1000).alias("source_ts_ns_order"),
        F.col("id").alias("pos"),
        F.lit("c").alias("__op"),
        F.timestamp_micros(F.col("id") * 1000).alias("__load_ts"),
    )
    target.merge(changes)
    before = {tuple(r) for r in target.read().select("user_id", "value", "k").collect()}
    v0 = target._read_version()

    with pytest.raises(ValueError, match="not target columns"):
        target.compact(zorder_by=("nope",))

    n = target.compact(zorder_by=("k", "value"))
    assert n == 500
    after = {tuple(r) for r in target.read().select("user_id", "value", "k").collect()}
    assert after == before
    assert target._read_version() > v0
    # schema unchanged: the Morton key was an ordering artifact only
    assert "k" in target.read().columns and len(target.read().columns) == len(
        target.read().columns
    )


def test_null_values_get_null_bin_and_null_key(spark):
    """NULL input → NULL bin → NULL Morton key (the documented nulls-first
    placement): the fold alone would land NULLs in bin 0 with a non-NULL
    key; the isNull guard plus NULL-propagating '+' keeps docs and
    behavior aligned."""
    from pyspark.sql import functions as F

    from dataplatform_cdc_pipeline_spark.operators.zorder import (
        bin_expr,
        zorder_key_expr,
    )

    df = spark.createDataFrame([(None, 5.0), (1.0, None), (1.0, 5.0)], "x double, y double")
    bounds = [0.5, 1.5]
    out = df.select(
        bin_expr("x", bounds).alias("bx"),
        zorder_key_expr([bin_expr("x", bounds), bin_expr("y", bounds)], bits=2).alias("k"),
    ).collect()
    assert out[0]["bx"] is None and out[0]["k"] is None  # NULL x
    assert out[1]["bx"] == 1 and out[1]["k"] is None  # NULL y poisons the key
    assert out[2]["bx"] == 1 and out[2]["k"] is not None
