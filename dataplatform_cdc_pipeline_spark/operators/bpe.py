"""BPE merge learning — the tokenizer-training step of an LLM data
pipeline, as a distributed relational computation.

Byte-pair encoding training is an iterative argmax: count adjacent
symbol pairs over the (word, frequency) table, merge the most frequent
pair everywhere, repeat. Like the k-means operator (clustering.py), the
loop is driver-side over flat lineage and each round's learned artifact
is tiny (ONE pair per round); unlike most BPE trainers, every step here
is engine-portable and therefore hash-oracle-able:

- a word's symbol sequence is a SPACED STRING (``' h e l l o '`` via
  ``regexp_replace(word, '(.)', '$1 ')``) — the merge step is
  ``replace(' a b ' → ' ab ')`` applied TWICE. One pass is greedy
  left-to-right like BPE, but a match consumes the space that the NEXT
  occurrence needs as its leading delimiter, so in a run of consecutive
  occurrences pass 1 merges the 1st, 3rd, 5th…; the survivors are then
  isolated by merged symbols, so a second pass catches every remaining
  occurrence (two passes always suffice — two adjacent unmerged
  occurrences cannot survive pass 1). What the two-pass replace
  GUARANTEES is saturation (no mergeable adjacency survives) and the
  merged-token MULTISET — not greedy positional order: for an odd run
  ≥ 5 of a self-pair, merging (a,a) over 'aaaaa' yields [aa, a, aa]
  (pass 1 takes occurrences 1 and 3, stranding the middle 'a') where a
  greedy left-to-right scan gives [aa, aa, a]. Token counts, budgets,
  and saturation — everything this module's consumers read — are
  unaffected, but later rounds' pair counts can diverge from a
  HuggingFace-style trainer on such corpora. Both engines' ``replace``
  share the continue-after-replacement semantics, so the step is
  bit-portable across Spark and the DuckDB oracle;
- pair counts are ``Σ word_freq`` over adjacent pairs from the split
  sequence — one explode + map-side-combined groupBy per round;
- the argmax tie-breaks lexicographically on the pair (total order, both
  engines); the chosen pair (2 strings + a count) is the only thing the
  driver ever holds.

Scale shape per round: one scan of the (distinct words, freq) frame —
which is VOCABULARY-sized, not corpus-sized (the word-frequency
aggregation runs once up front; HuggingFace's trainer makes the same
reduction) — one shuffle of pair partials, a 1-row argmax. n_merges
rounds stack no lineage (the sequence column is recomputed from the
last round's strings, not re-derived through the plan).

This simplified variant learns over raw words without the end-of-word
sentinel (consistent across both engines and the oracle; adding '</w>'
is a one-line change to the seed expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spaced_seq_expr(word: Column | str) -> Column:
    """word → ' c h a r s ' (leading/trailing space so every adjacent
    pair, including at the edges, matches as ``' a b '``)."""
    c = F.col(word) if isinstance(word, str) else word
    return F.concat(F.lit(" "), F.regexp_replace(c, "(.)", "$1 "))


def pair_counts(vocab: DataFrame, seq_col: str = "seq", freq_col: str = "freq") -> DataFrame:
    """(a, b, cnt): frequency-weighted adjacent-pair counts over the
    current symbol sequences."""
    syms = F.split(F.trim(F.col(seq_col)), " ")
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        vocab.select(F.col(freq_col), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum(freq_col).alias("cnt"))
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a learned merge table: per word, apply every
    merge in rank order (each via the same two-pass replace as training —
    encoder/trainer symmetry is what makes BPE round-trip), then count
    the remaining symbols. Returns (id, n_words, n_bpe_tokens) — the
    token-budget accounting a data pipeline runs before packing.

    The merge table is a literal chain of ``replace`` calls (2·n_merges
    string ops per word, whole-stage codegen'd) — the learned artifact is
    baked into the expression exactly like the k-means centroids."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    seq = spaced_seq_expr("w")
    for m in merges:
        pat = F.lit(f" {m['left']} {m['right']} ")
        rep = F.lit(f" {m['merged']} ")
        seq = F.replace(F.replace(seq, pat, rep), pat, rep)
    return (
        words.select(F.col(id_col), F.size(F.split(F.trim(seq), " ")).alias("n"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_tokens_expr(merges: list[dict], text_col: Column | str = "text") -> Column:
    """Document → array<string> of its BPE symbols in document order:
    whitespace-split words, each encoded with the learned merge table
    (same two-pass replace as training), flattened. This is the token
    space the exact-substring dedup runs in at paper-faithful window
    sizes (Lee et al. 2022 use 50 BPE tokens; substring_dedup's
    ``tokens`` parameter takes this expression).

    Word boundaries are not marked (no '</w>' sentinel — consistent
    with :func:`learn_bpe_merges`), so a symbol window can span words;
    that matches how token-id sequences behave in the paper's setup.
    The whole expression is built-in Columns (regexp_replace + a
    literal replace chain + split/flatten) — whole-stage codegen, no
    Python in the hot path. Callers running BOTH a hash leg and a
    token-rows leg over the same corpus should materialize the token
    arrays once (``docs.select(id, expr.alias('toks')).localCheckpoint``)
    — the tokenize-once invariant that keeps the 100 TB cost at one
    encode pass."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda w: w != F.lit("")
    )

    def encode_word(w: Column) -> Column:
        seq = F.concat(F.lit(" "), F.regexp_replace(w, "(.)", "$1 "))
        for m in merges:
            pat = F.lit(f" {m['left']} {m['right']} ")
            rep = F.lit(f" {m['merged']} ")
            seq = F.replace(F.replace(seq, pat, rep), pat, rep)
        return F.split(F.trim(seq), " ")

    return F.flatten(F.transform(words, encode_word))


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> list[dict]:
    """Learn ``n_merges`` BPE merges over the corpus; returns
    [{rank, left, right, merged, cnt}] — the merge table a tokenizer
    ships. Deterministic: argmax ties break on (left, right) ascending.
    """
    if n_merges < 1:
        raise ValueError("learn_bpe_merges: n_merges must be >= 1")
    vocab = (
        docs.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(spaced_seq_expr("w").alias("seq"), "freq")
        # vocabulary-sized; eagerly materialized once so per-round scans
        # don't re-tokenize the corpus
        .localCheckpoint(eager=True)
    )
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "cnt": cnt}
        )
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        vocab = vocab.select(
            F.replace(F.replace(F.col("seq"), pat, rep), pat, rep).alias("seq"),
            "freq",
        ).localCheckpoint(eager=True)
    return merges
