"""File-format ingestion beyond parquet: JSONL and CSV landing readers
with an explicit schema contract and a corrupt-record policy.

The reference pipeline's landing zone is loaded from files the CDC
publisher drops (SURVEY.md §1 — the load step precedes every merge);
these readers are the engine's equivalent for the two text formats that
dominate real landing zones. Both enforce the same contract as
``sources/tables.load_table``: the schema is DECLARED, never inferred
(inference is a full extra pass over the data and non-deterministic
under drift), so the scan stays single-pass and the plan is stable.

Corrupt-record policy mirrors Spark's three modes, surfaced explicitly:

- ``PERMISSIVE`` (default): malformed lines land in a
  ``_corrupt_record`` column, well-formed fields of partial rows are
  kept (missing fields → NULL — schema drift absorbs, it doesn't
  corrupt); the caller decides quarantine-vs-fail downstream.
- ``DROPMALFORMED``: malformed lines silently vanish — allowed but the
  caller must opt in (silent loss violates the repo's fail-loud
  default).
- ``FAILFAST``: the batch dies on the first malformed line — the
  CAST-error → ROLLBACK posture of the merge path (cast_rules.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"

_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def _check_mode(mode: str) -> str:
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    return mode


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Newline-delimited JSON under a declared schema. In PERMISSIVE
    mode the returned frame carries ``_corrupt_record`` (NULL for clean
    rows); other modes return exactly the declared columns."""
    reader = (
        spark.read.schema(
            f"{schema}, {CORRUPT_COL} string"
            if _check_mode(mode) == "PERMISSIVE"
            else schema
        )
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
) -> DataFrame:
    """ORC under an optionally declared schema. ORC is self-describing
    (no corrupt-record mode — a damaged stripe fails the read, which is
    the fail-loud default anyway); declaring the schema still pins the
    scan contract: extra file columns are pruned, a declared column
    missing from every file reads as NULL, and an UNCONVERTIBLE declared
    type also reads as NULL (measured: a string file column declared
    double yields NULLs — Spark's ORC reader absorbs type drift the way
    the JSONL reader absorbs missing fields; callers needing fail-loud
    typing add an isNotNull assertion downstream). Column pruning and
    predicate pushdown work as for parquet (orc-core ships in Spark's
    jars)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV under a declared schema (RFC-4180 quoting — embedded commas,
    quotes, escaped quotes — handled by Spark's parser; pass
    ``multiLine=true`` for embedded newlines). Same corrupt-record
    policy as :func:`read_jsonl`."""
    reader = (
        spark.read.schema(
            f"{schema}, {CORRUPT_COL} string"
            if _check_mode(mode) == "PERMISSIVE"
            else schema
        )
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)
