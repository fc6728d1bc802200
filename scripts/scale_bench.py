"""Measured scaling sweep: sf0.01 → sf0.1 → sf1-synthetic (10× sf0.1).

Builds a synthetic sf1 directory by replicating the sf0.1 events /
documents / embeddings tables 10× with shifted ids (key cardinality grows
WITH the data — users/docs/vectors ×10, so per-key work stays constant and
the expected growth is ~linear in rows), then times representative
operators at all three scales in ONE session (warm codegen, like the
measured-scaling table in SCALE.md).

Run: python3 scripts/scale_bench.py
Prints one JSON line {query: {sf: sec}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1synth"
REPL = 10

#: queries touching only events/documents/embeddings (the replicated tables)
QUERIES = [
    "cdc_dedup_latest", "cdc_cast_projection", "cdc_merge_full",
    "dedup_exact", "dedup_minhash_lsh", "text_quality", "gopher_repetition",
    "doc_chunks", "bm25_search", "embedding_ivf_topk", "training_mix",
    "embedding_kmeans",
    # r5 second-half operators. dedup_containment is EXCLUDED by design:
    # the replica construction gives every document 9 near-copies, so
    # every shingle's df lands at ~10x its sf0.1 value (~96, just under
    # the posting cap) and the pair join measures the synthetic corpus's
    # pathological density, not the operator's scaling — a real 10x
    # corpus adds documents, not copies. Its scale lever is the posting
    # cap (df > cap drops the shingle), already exercised by tests.
    "embedding_sq8_topk", "events_distinct_sketch", "heavy_hitters_cms",
    "bigram_perplexity", "bpe_encode",
    "cdc_debezium_ingest", "events_value_percentiles",
    # r6 fourth-session operators. media_phash_dedup is EXCLUDED (fixed
    # n=128 synthetic asset table — scale-independent by construction);
    # hybrid_search_rrf's scaling legs are measured via bm25_search and
    # the cosine family.
    "boilerplate_strip", "tfidf_keywords", "corpus_weighted_sample",
    "domain_temperature_sample", "phrase_search", "events_psi_drift",
    "hard_negatives", "embedding_pq_topk", "training_batches",
    # r6 fifth-session operators. dedup_substring_spans: the replica
    # construction makes ~every window duplicated (docs repeat 10x minus
    # the unique tail token), but the operator never forms pairs — hits,
    # span-merge, and rebuild all stay linear in tokens, which is exactly
    # the property worth measuring. incremental_dedup_batch measures the
    # per-batch cost (delta signatures + index join); stream_dedup_index
    # is the same math behind a drain loop and is excluded like the other
    # streaming queries. orc_events_ingest = write+scan, linear.
    "dedup_substring_spans", "incremental_dedup_batch", "orc_events_ingest",
    "cdc_merge_dv",
    # r7 operators. dedup_substring_bpe: same no-pair-join property as
    # dedup_substring_spans, measured in BPE token space (the encode
    # pass is linear in characters and runs ONCE — tokenize-once
    # materialization); incremental_ivf_batch: per-batch delta encode +
    # cell-pruned probes against the persisted index.
    "dedup_substring_bpe", "incremental_ivf_batch",
]


def build_sf1(spark) -> None:
    if os.path.isdir(SF1):
        shutil.rmtree(SF1)
    os.makedirs(SF1)
    rep = spark.range(REPL).select(F.col("id").alias("__rep"))

    ev = load_table(spark, SF01, "events")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    n_events = ev.agg(F.max("event_id")).first()[0] + 1
    (
        ev.crossJoin(rep)
        .select(
            (F.col("event_id") + F.col("__rep") * n_events).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__rep") * n_users).alias("user_id"),
            "event_type", "value", "props",
        )
        .repartition(32)
        .write.parquet(f"{SF1}/events.parquet")
    )

    docs = load_table(spark, SF01, "documents")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("__rep") * n_docs).alias("doc_id"),
            # perturb the tail so replicas aren't exact duplicates (dedup
            # queries would otherwise produce 10x clusters of size 10):
            # append a replica-unique token
            F.concat(F.col("text"), F.lit(" rep"), F.col("__rep").cast("string")).alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(32)
        .write.parquet(f"{SF1}/documents.parquet")
    )

    emb = load_table(spark, SF01, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    cols = [c for c in emb.columns if c not in ("vec_id",)]
    (
        emb.crossJoin(rep)
        .select((F.col("vec_id") + F.col("__rep") * n_vec).alias("vec_id"), *cols)
        .repartition(32)
        .write.parquet(f"{SF1}/embeddings.parquet")
    )
    # small tables: symlink from sf0.1 so load_table works if ever touched
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        os.symlink(f"{SF01}/{t}.parquet", f"{SF1}/{t}.parquet")


def main() -> None:
    only = sys.argv[1:] or None
    spark = get_spark("scale-bench")
    build_sf1(spark)
    queries = entrymod.queries()
    out: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in (("sf0.01", SF001), ("sf0.1", SF01), ("sf1x", SF1)):
        for name in QUERIES if only is None else [q for q in QUERIES if q in only]:
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                out.setdefault(name, {})[sf_label] = round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001
                out.setdefault(name, {})[sf_label] = -1.0
                print(f"# {name}@{sf_label}: {type(e).__name__}: {str(e)[:160]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
