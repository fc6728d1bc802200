"""Logical-plan builders: config + target schema → Column expression trees.

The reference's "compiler" is dynamic SQL string assembly from
INFORMATION_SCHEMA (merge.sql:165-304; step-5.sql:282-327). Here the same
role is played by plain Python functions that build ``pyspark.sql.Column``
trees — Catalyst then does real codegen, predicate pushdown, and join
planning on the result.
"""

from dataplatform_cdc_pipeline_spark.plans.cast_rules import cast_expr, typed_projection
from dataplatform_cdc_pipeline_spark.plans.merge_plan import (
    build_changes,
    build_two_stream,
    window_scan,
)

__all__ = [
    "cast_expr",
    "typed_projection",
    "build_changes",
    "build_two_stream",
    "window_scan",
]
