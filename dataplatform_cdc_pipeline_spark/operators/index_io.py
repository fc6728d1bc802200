"""Shared IO primitives for the persisted incremental indexes
(bm25_index.py, dedup_index.py, ivf_index.py).

Extracted after an r12 review found the erase() twins drifting: the
BM25 index guarded the "every partition erased, only commit markers
left" read state while the LSH and IVF copies did not — reading a
file-less tree throws UNABLE_TO_INFER_SCHEMA instead of returning the
legitimate empty-index state. Single-siting the guard keeps the three
indexes' empty-state contract identical by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_index_table(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a persisted index table, treating BOTH a missing directory
    and one whose every partition was erased (only commit markers left)
    as the legitimate empty-index state; any other read error
    propagates (fail-loud). The file-walk probe is coordinator metadata
    work; a cluster deployment would consult a table manifest instead."""
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    ):
        return spark.createDataFrame([], schema)
    return spark.read.parquet(path)


def coerce_id_frame(spark: SparkSession, ids, col: str) -> DataFrame:
    """Normalize an erase id argument (DataFrame or sequence of ints)
    to a deduplicated single-column frame named ``col``. distinct() up
    front keeps the audit counts exact under caller-supplied duplicate
    ids (r11 ADVICE) while the anti-join erasure itself is insensitive."""
    if not isinstance(ids, DataFrame):
        frame = spark.createDataFrame([(int(i),) for i in ids], f"{col} long")
    else:
        frame = ids.select(F.col(ids.columns[0]).alias(col))
    return frame.distinct()
