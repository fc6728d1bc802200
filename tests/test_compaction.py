"""Small-file compaction (operators/compaction.py + the streaming run
consolidation): plan math, content invariance, the zero-I/O carried
path, checkpoint-loss replay idempotence, and the r12-promoted queries'
driver-style DuckDB parity gate plus their registration contract."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entrymod
from check_parity import dtype_mismatches, normalize
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.compaction import (
    compact,
    file_profile,
    plan_compaction,
    sort_pack_bins,
)
from dataplatform_cdc_pipeline_spark.queries_promoted_r12 import (
    PROMOTED_R12_ORACLES,
    PROMOTED_R12_QUERIES,
)
from dataplatform_cdc_pipeline_spark.sources.tables import TABLES, load_table


def test_binpack_plan_math(spark):
    """Sequential row-budget packing: a new bin starts once the running
    total crosses the target; the rewrite flag spares exactly the
    already-compact bins (one file with >= target rows)."""
    profile = spark.createDataFrame(
        [("a", 60), ("b", 60), ("c", 200), ("d", 10), ("e", 10)],
        "file string, n_rows long",
    )
    rows = {
        r["file"]: (r["bin"], r["n_files"], r["bin_rows"], r["rewrite"])
        for r in plan_compaction(profile, 100).collect()
    }
    # a(0..59) bin 0; b(60..119) bin 0 (starts before 100); c(120..319)
    # bin 1 alone with 200 >= 100 -> carried; d(320) bin 3; e(330) bin 3
    assert rows["a"] == (0, 2, 120, True)
    assert rows["b"] == (0, 2, 120, True)
    assert rows["c"] == (1, 1, 200, False)
    assert rows["d"] == (3, 2, 20, True)
    assert rows["e"] == (3, 2, 20, True)


def _stage(spark, sf_dir, dest, n=8):
    import glob
    import shutil

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    os.makedirs(dest, exist_ok=True)
    for g in range(n):
        d = f"{dest}_stage{g}"
        events.filter(F.col("event_id") % n == g).coalesce(1).write.parquet(d)
        part = glob.glob(f"{d}/part-*.parquet")[0]
        shutil.move(part, f"{dest}/g{g:02d}.parquet")
    return events


def test_compact_invariance_and_one_file_per_rewritten_bin(
    spark, sf_dir, tmp_path
):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    events = _stage(spark, sf_dir, src)
    n = events.count()
    target = -(-n // 4)
    compact(spark, src, dst, target)
    out = spark.read.parquet(dst)
    assert out.count() == n
    assert (
        out.agg(F.sum("event_id")).collect()[0][0]
        == events.agg(F.sum("event_id")).collect()[0][0]
    )
    # every rewritten bin is exactly one physical file
    per_bin_files = (
        out.select("bin", F.col("_metadata.file_path").alias("f"))
        .groupBy("bin")
        .agg(F.count_distinct("f").alias("nf"))
        .collect()
    )
    assert all(r["nf"] == 1 for r in per_bin_files)


def test_compact_carries_full_files_via_hard_link(spark, sf_dir, tmp_path):
    """A bin that is already one file holding >= target rows is NOT
    rewritten — it is hard-linked into the new layout (same inode,
    zero rewrite I/O) and its rows still read back identically."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    events = _stage(spark, sf_dir, src, n=4)
    n = events.count()
    target = n // 8  # every staged file (~n/4 rows) is alone and full
    plan = compact(spark, src, dst, target)
    assert plan.filter("rewrite").count() == 0
    for g in range(4):
        orig = os.path.join(src, f"g{g:02d}.parquet")
        linked = [
            os.path.join(r, f)
            for r, _, fs in os.walk(dst)
            for f in fs
            if f == f"g{g:02d}.parquet"
        ]
        assert len(linked) == 1
        assert os.stat(linked[0]).st_ino == os.stat(orig).st_ino
    assert spark.read.parquet(dst).count() == n


def test_sort_pack_bins_clusters_key_ranges(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    packed = sort_pack_bins(df, "k", 40)
    rows = packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()
    got = {r["bin"]: (r["n"], r["lo"], r["hi"]) for r in rows}
    assert got == {0: (40, 0, 39), 1: (40, 40, 79), 2: (20, 80, 99)}


def test_sort_pack_bins_deterministic_with_duplicate_keys(spark):
    """Bin assignment must be deterministic when the sort key is
    non-unique — the documented byte-identical replay of run
    consolidation depends on it. Full-row tiebreakers pin the order:
    shuffling the input partitioning must not move any (k, v) pair to a
    different bin (r11 ADVICE; row_number over the key alone let Spark
    break ties by arrival order)."""
    rows = [(i // 10, float(i % 7)) for i in range(200)]  # heavy dup keys
    df = spark.createDataFrame(rows, "k long, v double")

    def packing(frame):
        return sorted(
            map(tuple, sort_pack_bins(frame, "k", 30).collect())
        )

    assert packing(df.repartition(13)) == packing(df.repartition(3, "v"))


def test_file_profile_counts_match(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    events = _stage(spark, sf_dir, src, n=4)
    prof = {
        os.path.basename(r["file"]): r["n_rows"]
        for r in file_profile(spark, src).collect()
    }
    expect = {
        f"g{r['g']:02d}.parquet": r["n"]
        for r in events.groupBy((F.col("event_id") % 4).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert prof == expect


def _ranked(df):
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_stream_replay_after_checkpoint_loss_is_idempotent(
    spark, sf_dir, tmp_path
):
    """Checkpoint loss replays batch ids from 0 against a work dir that
    already holds every batch's future — landing partitions and run
    partitions must be reconstructed byte-identically."""
    import shutil

    q = PROMOTED_R12_QUERIES["stream_compact_runs"]
    # run the query once, capture, then replay its stream with the same
    # work dir minus the checkpoint — easiest through the module's own
    # primitives so the work dir is under our control
    import glob as _glob

    from dataplatform_cdc_pipeline_spark.streaming.compaction_stream import (
        run_stats,
        stream_compact_runs,
    )

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for g in range(5):
        d = str(tmp_path / f"stage_{g}")
        events.filter(F.col("event_id") % 5 == g).coalesce(1).write.parquet(d)
        part = _glob.glob(f"{d}/part-*.parquet")[0]
        dest = f"{src}/batch_{g}.parquet"
        shutil.move(part, dest)
        os.utime(dest, (1_000_000_000 + g * 100,) * 2)
    work = str(tmp_path / "work")
    args = (spark, src, "event_id long, value double", work)
    stream_compact_runs(*args)
    before = _ranked(
        run_stats(spark, work, "event_id", "event_id long, value double", 5)
    )
    shutil.rmtree(f"{work}/ckpt")  # simulated checkpoint loss
    stream_compact_runs(*args)
    after = _ranked(
        run_stats(spark, work, "event_id", "event_id long, value double", 5)
    )
    assert after == before
    assert q is PROMOTED_R12_QUERIES["stream_compact_runs"]  # sanity


def test_promoted_r12_registered_at_tail():
    """Promoted WITH the r12 rotation (r11 verdict task 3): the trio is
    registered, its oracles travel with it, and it sits at the registry
    tail so it leads the r13 window as the never-verified head."""
    q = entrymod.queries()
    assert len(q) == 248
    assert set(PROMOTED_R12_QUERIES) <= set(q)
    assert set(PROMOTED_R12_QUERIES) == set(PROMOTED_R12_ORACLES)
    assert list(q)[-3:] == [
        "cdc_compact_binpack", "stream_compact_runs", "bm25_index_erasure",
    ]
    o = entrymod.oracle_sql()
    assert all(o[n] == PROMOTED_R12_ORACLES[n] for n in PROMOTED_R12_ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PROMOTED_R12_QUERIES))
def test_promoted_r12_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = PROMOTED_R12_QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(PROMOTED_R12_ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert not dtype_mismatches(sdf, odf)  # driver hash is dtype-sensitive
    assert len(sdf) == len(odf) > 0
    assert normalize(sdf) == normalize(odf)
