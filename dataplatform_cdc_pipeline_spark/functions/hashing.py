"""Deterministic, engine-portable hashing primitives.

The LLM-data operators (MinHash, SimHash, LSH, fingerprinting) need hash
functions that are (a) cheap and JVM-native in Spark and (b) reproducible
bit-for-bit in any other engine, so test oracles (DuckDB) can verify results
by value. Spark's ``hash()``/``xxhash64()`` seeds differ across engines, so
we standardize on **MD5** — identical everywhere — and derive integers from
its hex form:

Spark:  ``conv(substring(md5(x), 1, 15), 16, 10) :: long``
DuckDB: ``('0x' || substring(md5(x), 1, 15))::bigint``

15 hex chars = 60 bits → always fits a signed 64-bit int, never negative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Number of leading hex chars of the MD5 digest used for integer hashes.
MD5_HEX_CHARS = 15  # 60 bits, non-negative in a signed long


def md5_long(col: Column | str, salt: str | None = None) -> Column:
    """Uniform non-negative 60-bit integer hash of a string column.

    ``salt`` prepends a constant so k independent hash families can be
    derived from one digest function (MinHash signatures).
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt), F.lit("|"), c)
    return F.conv(F.substring(F.md5(c), 1, MD5_HEX_CHARS), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB SQL text computing the identical value as :func:`md5_long`."""
    inner = f"concat('{salt}', '|', {expr})" if salt is not None else expr
    return f"('0x' || substring(md5({inner}), 1, {MD5_HEX_CHARS}))::BIGINT"


def stable_long_hash(*cols: Column | str) -> Column:
    """Multi-column stable hash (for bucketing / fingerprints)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return md5_long(F.concat_ws("\x1f", *[p.cast("string") for p in parts]))
