"""Dead-letter-queue split for CDC batches — the opt-in alternative to
the engine's default fail-the-batch posture on malformed payloads.

Default (reference fidelity): ANSI mode ON, a CAST_INVALID_INPUT aborts
the merge and writes the FAILED audit row — exactly the reference's
CAST-error → ROLLBACK (merge.sql error handler). That is the right
default for a CDC silver table, where a malformed row usually means an
upstream contract break that should page someone.

This module is the managed-pipeline alternative (Delta/DLT's
"expectations with quarantine", Kafka Connect's DLQ): split the batch
BEFORE the ANSI casts into rows whose every typed envelope value will
cast, and rows where some present value cannot — the clean rows merge,
the poisoned rows land in a quarantine table WITH the column names that
failed, and (via operators/multi_txn.MultiTableTxn) both tables commit
in ONE atomic transaction, so replay after a crash can't drop or double
either side.

The validity predicate mirrors the cast rules' conventions: a value is
bad only if it is PRESENT (JSON key exists, not JSON null, not the
'null' string — P16) and ``try_cast`` to the declared type fails.
Absent/null values are legitimate (they cast to NULL by design) and
never quarantine. String target columns cannot fail a cast and are
skipped.

100 TB posture: the split is two filters over one projection — the
``try_cast`` probes ride the same scan as the envelope extraction, no
extra pass, no shuffle; the quarantine leg is usually ~empty and costs
its own row count only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataplatform_cdc_pipeline_spark.config import MergeConfig

#: types whose casts can fail on a present value (string targets can't)
_CASTABLE = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.DecimalType,
    T.TimestampType, T.DateType, T.BooleanType,
)


def quarantine_split(
    windowed: DataFrame, schema: T.StructType, cfg: MergeConfig
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) over a window-scanned batch. ``quarantined``
    carries the scan's columns plus ``__qerrors`` (array of failing
    column names, deterministic field order)."""
    checks = []
    for f in schema.fields:
        if not isinstance(f.dataType, _CASTABLE):
            continue
        key = cfg.json_key_overrides.get(f.name, f.name)
        raw = F.get_json_object("data", f"$.{key}")
        typ = f.dataType.simpleString()
        bad = (
            raw.isNotNull()
            & (raw != F.lit("null"))
            & F.expr(f"try_cast(get_json_object(data, '$.{key}') as {typ})").isNull()
        )
        checks.append(F.when(bad, F.lit(f.name)))
    if not checks:
        flagged = windowed.withColumn(
            "__qerrors", F.array().cast("array<string>")
        )
    else:
        flagged = windowed.withColumn(
            "__qerrors", F.array_compact(F.array(*checks))
        )
    clean = flagged.filter(F.size("__qerrors") == 0).drop("__qerrors")
    quarantined = flagged.filter(F.size("__qerrors") > 0)
    return clean, quarantined
