"""Exact-substring span dedup (operators/substring_dedup.py): span
boundary exactness, window merging, within-doc repeats, survivor-text
rebuild, and the short-doc guard."""

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.substring_dedup import (
    duplicate_spans,
    duplicate_window_hits,
    strip_duplicate_spans,
    window_hashes,
)

W = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def shared_run(spark):
    """Docs 1 and 2 share the 6-token run 'p q r s t u' at different
    offsets; doc 3 is unique; doc 4 is shorter than the window."""
    return _docs(
        spark,
        [
            (1, "a b c p q r s t u d e f"),
            (2, "x y p q r s t u z w v k"),
            (3, "m n o g h i j l aa bb cc dd"),
            (4, "p q r"),
        ],
    )


def test_window_count_and_short_doc_guard(spark, shared_run):
    g = window_hashes(shared_run, W)
    per_doc = {r["doc_id"]: r["n"] for r in g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # len-W+1 windows per doc; doc 4 (3 tokens < W) emits none
    assert per_doc == {1: 9, 2: 9, 3: 9}


def test_hits_and_span_boundaries(spark, shared_run):
    # shared run 'p q r s t u' = 3 duplicated 4-token windows per doc,
    # merging into ONE maximal span covering exactly the run
    spans = {
        r["doc_id"]: (r["s"], r["e"])
        for r in duplicate_spans(shared_run, W).collect()
    }
    assert spans == {1: (3, 8), 2: (2, 7)}
    hits = duplicate_window_hits(shared_run, W)
    assert hits.filter(F.col("doc_id") == 3).count() == 0


def test_strip_rebuilds_survivor_text(spark, shared_run):
    out = {r["doc_id"]: r.asDict() for r in strip_duplicate_spans(
        shared_run, W).collect()}
    assert out[1]["kept_text"] == "a b c d e f"
    assert out[2]["kept_text"] == "x y z w v k"
    assert out[1]["dup_tokens"] == 6 and out[1]["n_spans"] == 1
    assert out[3]["dup_tokens"] == 0 and out[3]["kept_text"].startswith("m n o")
    # short doc passes through intact
    assert out[4] == {
        "doc_id": 4, "n_tokens": 3, "dup_tokens": 0, "n_spans": 0,
        "dup_ppm": 0, "kept_text": "p q r",
    }


def test_within_doc_repeat_is_duplicated(spark):
    # the paper's rule: ANY second occurrence corpus-wide counts,
    # including within the same document
    docs = _docs(spark, [(1, "a b c d x y z w a b c d")])
    out = strip_duplicate_spans(docs, W).collect()[0]
    assert out["dup_tokens"] == 8 and out["n_spans"] == 2
    assert out["kept_text"] == "x y z w"


def test_fully_covered_doc_empties(spark):
    docs = _docs(spark, [(1, "a b c d e"), (2, "a b c d e")])
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, W).collect()}
    assert out[1]["kept_text"] == "" and out[1]["dup_tokens"] == 5
    assert out[1]["dup_ppm"] == 1_000_000


def test_adjacent_spans_merge(spark):
    # two duplicated regions with a 1-token gap stay SEPARATE spans;
    # back-to-back regions merge into one
    docs = _docs(
        spark,
        [
            (1, "a b c d GAP e f g h"),
            (2, "a b c d XXX e f g h"),
        ],
    )
    spans = duplicate_spans(docs, W).filter(F.col("doc_id") == 1).collect()
    assert sorted((r["s"], r["e"]) for r in spans) == [(0, 3), (5, 8)]


def test_decontaminate_against_reference(spark):
    from dataplatform_cdc_pipeline_spark.operators.substring_dedup import (
        decontaminate_against,
    )

    # train doc 1 quotes the eval doc's 6-token run; train doc 2 is clean.
    # Span-level: doc 1 loses exactly the quote, not the doc.
    train = _docs(
        spark,
        [
            (1, "intro words p q r s t u closing words"),
            (2, "完 different content with no overlap at all here"),
        ],
    )
    bench = _docs(spark, [(100, "header p q r s t u footer")])
    out = {r["doc_id"]: r.asDict() for r in decontaminate_against(
        train, bench, W).collect()}
    assert out[1]["kept_text"] == "intro words closing words"
    assert out[1]["dup_tokens"] == 6 and out[1]["n_spans"] == 1
    assert out[2]["dup_tokens"] == 0
    # duplication WITHIN train alone never triggers: the predicate is
    # membership in the reference's window set
    train_dup = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    clean = decontaminate_against(
        train_dup, _docs(spark, [(100, "x y z w v u")]), W
    ).collect()
    assert all(r["dup_tokens"] == 0 for r in clean)


def test_hits_plan_tokenizes_once(spark, shared_run):
    # the window-hash frame is checkpointed before feeding both the
    # frequency agg and the probe join: the executed plan downstream
    # must contain NO split/md5 (tokenize+hash ran once, upstream)
    hits = duplicate_window_hits(shared_run, W)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "split(" not in plan and "md5(" not in plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
