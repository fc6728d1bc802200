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


# ---------------------------------------------------------------------------
# BPE-token-space composition (operators/bpe.bpe_tokens_expr through the
# tokens parameter — the paper-faithful w=50 variant's machinery)
# ---------------------------------------------------------------------------


def test_bpe_token_space_spans(spark):
    """Spans measured in BPE symbols, not words: with the merge table
    [('a','b')→'ab'], the word 'ab' is ONE symbol while 'cd' stays two
    ('c','d'). Docs 1 and 2 share a run that is 6 words but 8 BPE
    symbols; at w=8 the whitespace machinery finds nothing (6 < 8) while
    the BPE-space machinery flags the full run — the token space IS the
    semantics."""
    from dataplatform_cdc_pipeline_spark.operators.bpe import bpe_tokens_expr

    merges = [{"rank": 1, "left": "a", "right": "b", "merged": "ab", "cnt": 9}]
    shared = "ab cd ab cd ab cd"  # 6 words -> 8 BPE symbols? compute:
    # per word: 'ab' -> ['ab'] (merged), 'cd' -> ['c','d']
    # so 6 words -> 3*1 + 3*2 = 9 BPE symbols
    docs = _docs(
        spark,
        [
            (1, f"{shared} k l m n o p q r s"),
            (2, f"z y x w v {shared} u t"),
            (3, "unrelated words only here nothing repeats at all today"),
        ],
    )
    toks = docs.select(
        "doc_id", bpe_tokens_expr(merges).alias("__toks")
    ).localCheckpoint(eager=True)
    # whitespace space at w=8: the shared run is only 6 words -> no hits
    assert duplicate_window_hits(docs, 8).count() == 0
    # BPE space at w=9: the 9-symbol shared run is exactly one window
    hits = duplicate_window_hits(toks, 9, tokens=F.col("__toks"))
    got = {(r["doc_id"], r["pos"]) for r in hits.collect()}
    assert got == {(1, 0), (2, 5)}  # doc2 prefix = 5 single-char syms
    out = strip_duplicate_spans(toks, 9, tokens=F.col("__toks"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["dup_tokens"] == 9 and rows[2]["dup_tokens"] == 9
    assert rows[1]["n_spans"] == 1 and rows[3]["n_spans"] == 0
    # survivor text is the remaining BPE symbol stream
    assert rows[1]["kept_text"] == "k l m n o p q r s"
    assert rows[2]["kept_text"] == "z y x w v u t"


def test_bpe_tokens_expr_matches_apply_bpe_counts(spark):
    """bpe_tokens_expr (the sequence) and apply_bpe (the counts) must
    agree: size(tokens) == n_bpe_tokens for every doc — encoder/sequence
    symmetry, same two-pass replace semantics."""
    from dataplatform_cdc_pipeline_spark.operators.bpe import (
        apply_bpe,
        bpe_tokens_expr,
        learn_bpe_merges,
    )

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "pack my box with five dozen liquor jugs today ok"),
            (3, "the the the quick quick brown brown brown fox fox"),
        ],
    )
    merges = learn_bpe_merges(docs, n_merges=3)
    seq_counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(bpe_tokens_expr(merges)).alias("n")
        ).collect()
    }
    enc_counts = {
        r["doc_id"]: r["n_bpe_tokens"] for r in apply_bpe(docs, merges).collect()
    }
    assert seq_counts == enc_counts
