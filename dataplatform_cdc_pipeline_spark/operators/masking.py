"""Column-masking policies — governance layer for reading PII-bearing
tables (the release-side complement of curation.redact_pii, which
rewrites stored text).

A policy maps column → one of five masks, applied as a pure projection
(zero shuffles, zero UDFs — masking must not change a query's plan
shape, only its expressions):

- ``keep``          — pass through;
- ``null``          — suppress entirely (typed NULL);
- ``hash``          — md5 of the string form: joinable/groupable
                      pseudonym, value unrecoverable;
- ``partial``       — first 2 chars + '***' (human-recognizable prefix,
                      rest hidden) — string columns;
- ``bucket:<N>``    — floor to a multiple of N (numeric generalization,
                      the k-anonymity coarsening move).

Unknown policies and masks that don't fit the column's type fail
loudly at plan-build time — a silently unmasked column is the one
failure mode a governance layer may never have.

Reference parity: none (the reference has no governance surface) —
beyond-reference, pairs with pii_k_anonymity as the audit/enforce pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mask_expr(col: str, policy: str, dtype: str) -> Column:
    c = F.col(col)
    if policy == "keep":
        return c
    if policy == "null":
        return F.lit(None).cast(dtype).alias(col)
    if policy == "hash":
        return F.md5(c.cast("string")).alias(col)
    if policy == "partial":
        if not dtype.startswith("string"):
            raise ValueError(f"partial mask needs a string column; {col} is {dtype}")
        return F.concat(F.substring(c, 1, 2), F.lit("***")).alias(col)
    if policy.startswith("bucket:"):
        n = int(policy.split(":", 1)[1])
        if n <= 0:
            raise ValueError(f"bucket size must be positive: {policy}")
        return (F.floor(c / n) * n).cast(dtype).alias(col)
    raise ValueError(f"unknown masking policy {policy!r} for column {col}")


def masked_view(df: DataFrame, policy: dict[str, str]) -> DataFrame:
    """Apply a column→policy map; columns absent from the map are DROPPED
    (deny-by-default — forgetting a column must not leak it)."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    unknown = set(policy) - set(fields)
    if unknown:
        raise ValueError(f"policy names missing columns: {sorted(unknown)}")
    return df.select(
        *[
            _mask_expr(name, policy[name], fields[name]).alias(name)
            for name in df.columns
            if name in policy
        ]
    )
