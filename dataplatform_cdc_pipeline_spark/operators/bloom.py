"""Bloom-filter semi-join pruning — map-side pre-filtering of a huge
fact side by a compact summary of the dim side's join keys.

At 100 TB the expensive part of ``fact SEMI JOIN dim`` is shuffling the
fact side; when the dim side is selective, most fact rows shuffle only
to be dropped. The standard fix (Spark's own runtime bloom-filter join,
Trino's dynamic filtering) is to build a Bloom filter over the dim keys
and apply it AT THE FACT SCAN, before any exchange. This module is that
technique as an explicit, engine-portable relational computation:

- **hash family**: position_i = ``md5_long(key, salt='bloom<i>') %
  m_bits`` — the repo's shared MD5 primitive (functions/hashing.py), so
  the filter's exact bit pattern and pass/fail decisions reproduce in
  DuckDB and the whole mechanism is hash-oracle-able (a bit is set iff
  some inserted key hashes to it, so the probe's bit test ⟺ "every one
  of the key's k positions is in the dim side's position set" — the
  formulation the oracle uses);
- **build**: one distinct over k·|dim| positions, folded into
  ``m_bits/64`` words with ``bit_or`` — the words (a few KiB) collect to
  the driver as an index artifact (same shape as k-means centroids) and
  inline into the probe expression;
- **probe**: k bit-tests per fact row, all native Column arithmetic
  (literal word + bit-mask array lookups — no shifts by column, no
  UDFs) — whole-stage codegen, zero shuffle. No false negatives ever
  (unit-pinned); false positives only cost wasted rows in the exact
  join that follows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.functions.hashing import md5_long

DEFAULT_M_BITS = 1 << 16  # 8 KiB of filter; fp ~2e-6 at 1k keys / k=5
DEFAULT_K = 5

def _position(key: Column, i: int, m_bits: int) -> Column:
    return md5_long(key.cast("string"), salt=f"bloom{i}") % m_bits


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int | None = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> tuple[list[int], int]:
    """Bloom filter words (``m_bits/64`` signed longs) over the distinct
    values of ``keys[key_col]``, returned as ``(words, m_bits)``. One
    distinct + one word-indexed groupBy; the driver holds only the words.

    ``m_bits=None`` auto-sizes to the next power of two ≥ 16 bits per
    distinct key (fp ≈ 0.1% at k=5) — an under-sized filter silently
    degrades to a pass-through (measured: 21k keys in the 64 Ki-bit
    default saturate to a 33% fp rate, scripts/prune_bench.py), so
    production callers with unknown dim cardinality should auto-size;
    the count it costs is over the (small) dim side only."""
    if m_bits is None:
        n = keys.select(key_col).distinct().count()
        m_bits = max(1 << 13, 1 << (max(n, 1) * 16 - 1).bit_length())
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = reduce(
        lambda a, b: a.unionByName(b),
        [
            keys.select(_position(F.col(key_col), i, m_bits).alias("p"))
            for i in range(k_hashes)
        ],
    ).distinct()
    words = (
        pos.select(
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[int(r["w"])] = int(r["word"])
    return arr, m_bits


#: mask[j] = 1 << j as a signed 64-bit long (j=63 wraps to the sign bit)
_BIT_MASKS = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]


def bloom_might_contain(
    key: Column | str,
    words: list[int],
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> Column:
    """Membership predicate: true iff every one of the key's k bits is
    set. Inlines the word array as a literal — a pure scan-side filter
    expression (no join, no shuffle). Probe cost measured at sf0.1
    (600k cached rows, scripts/prune_bench.py micro variant): ~2.8 s
    over the 5×md5 baseline even at 512 Ki bits; a hex-string-literal
    + substring/conv formulation was built, raced, and rejected (~9×
    slower — conv leaves codegen). NULL keys probe like any value (md5
    of the cast string is NULL → predicate NULL → filtered), which is
    semi-join-consistent: NULL never equi-matches."""
    if m_bits % 64 or len(words) != m_bits // 64:
        raise ValueError("words length must be m_bits/64")
    key_c = F.col(key) if isinstance(key, str) else key
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    lit_masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    cond = F.lit(True)
    for i in range(k_hashes):
        p = _position(key_c, i, m_bits)
        word = F.element_at(lit_words, F.floor(p / 64).cast("int") + 1)
        mask = F.element_at(lit_masks, (p % 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond
