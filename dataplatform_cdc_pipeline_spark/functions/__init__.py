"""Scalar-function building blocks shared across the engine.

Everything here returns native ``pyspark.sql.Column`` expressions — JVM-side,
Catalyst-optimizable, whole-stage-codegen friendly. No Python UDFs.
"""

from dataplatform_cdc_pipeline_spark.functions.envelope import (
    envelope_columns,
    event_ts_expr,
    json_scalar,
)
from dataplatform_cdc_pipeline_spark.functions.hashing import (
    md5_long,
    stable_long_hash,
)

__all__ = [
    "envelope_columns",
    "event_ts_expr",
    "json_scalar",
    "md5_long",
    "stable_long_hash",
]
