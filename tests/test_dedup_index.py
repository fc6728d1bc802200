"""Incremental LSH dedup index (operators/dedup_index.py): the index —
not the corpus — decides old-side candidates; replay idempotency;
equivalence with from-scratch minhash_dedup_pairs."""

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.operators.dedup_index import IncrementalLshIndex
from dataplatform_cdc_pipeline_spark.operators.text_dedup import minhash_dedup_pairs

TEXT_A = "the quick brown fox jumps over the lazy dog again and again"
TEXT_B = "an entirely different document about spark shuffles and joins here"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def idx(spark, tmp_path):
    return IncrementalLshIndex(spark, str(tmp_path / "ix"))


def test_index_is_the_corpus_memory(spark, idx):
    # doc 1 (old) and doc 10 (new) are identical, but doc 1 was never
    # added to the index -> invisible, no pair. After adding it, the
    # SAME dedup call finds the pair: candidates come from the index.
    corpus = _docs(spark, [(1, TEXT_A), (2, TEXT_B), (10, TEXT_A)])
    new = corpus.filter(F.col("doc_id") == 10)
    idx.add_batch("base", corpus.filter(F.col("doc_id") == 2))
    assert idx.dedup_batch(new, corpus).count() == 0
    idx.add_batch("base2", corpus.filter(F.col("doc_id") == 1))
    got = idx.dedup_batch(new, corpus).collect()
    assert [(r["new_id"], r["other_id"], r["kind"]) for r in got] == [
        (10, 1, "cross")
    ]
    assert got[0]["jaccard"] == 1.0


def test_replay_is_idempotent(spark, idx):
    docs = _docs(spark, [(1, TEXT_A), (2, TEXT_B)])
    idx.add_batch("b1", docs)
    first = sorted(
        (r["band_key"], r["doc_id"], r["batch"])
        for r in idx.index_bands().collect()
    )
    idx.add_batch("b1", docs)  # replay
    second = sorted(
        (r["band_key"], r["doc_id"], r["batch"])
        for r in idx.index_bands().collect()
    )
    assert first == second and len(first) == 8  # 2 docs x 4 bands


def test_dynamic_overwrite_keeps_other_batches(spark, idx):
    idx.add_batch("b1", _docs(spark, [(1, TEXT_A)]))
    idx.add_batch("b2", _docs(spark, [(2, TEXT_B)]))
    idx.add_batch("b1", _docs(spark, [(1, TEXT_A)]))  # replay b1 only
    per_batch = {
        r["batch"]: r["n"]
        for r in idx.index_bands().groupBy("batch").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_batch == {"b1": 4, "b2": 4}


def test_exclude_batches_masks_partition(spark, idx):
    corpus = _docs(spark, [(1, TEXT_A), (10, TEXT_A)])
    idx.add_batch("self", corpus.filter(F.col("doc_id") == 10))
    idx.add_batch("base", corpus.filter(F.col("doc_id") == 1))
    new = corpus.filter(F.col("doc_id") == 10)
    # without the mask the batch collides with its own published rows
    # (kind would still be cross since index rows are "old") — the mask
    # removes them, leaving only the genuine base pair
    got = idx.dedup_batch(new, corpus, exclude_batches=("self",)).collect()
    assert [(r["new_id"], r["other_id"]) for r in got] == [(10, 1)]


def test_incremental_equals_from_scratch(spark, idx, sf_dir):
    from dataplatform_cdc_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 3)
    delta = docs.filter(F.col("doc_id") % 10 == 3)
    idx.add_batch("base", base)
    inc = {
        (min(r["new_id"], r["other_id"]), max(r["new_id"], r["other_id"]),
         r["jaccard"])
        for r in idx.dedup_batch(delta, docs, threshold=0.5).collect()
    }
    scratch = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
        if r["id_a"] % 10 == 3 or r["id_b"] % 10 == 3
    }
    assert inc == scratch
