"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC merge on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator inventory from
SURVEY.md §2 plus the beyond-reference LLM-data operators, each verified
against a DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full CDC merge lifecycle on /root/testdata/sf0.001."""
    from dataplatform_cdc_pipeline_spark.queries import q_cdc_merge_full

    return q_cdc_merge_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataplatform_cdc_pipeline_spark.queries import QUERIES
    from dataplatform_cdc_pipeline_spark.queries_analytic import ANALYTIC_QUERIES
    from dataplatform_cdc_pipeline_spark.queries_curation import CURATION_QUERIES
    from dataplatform_cdc_pipeline_spark.queries_ext import EXT_QUERIES
    from dataplatform_cdc_pipeline_spark.queries_llm import LLM_QUERIES

    return {**QUERIES, **LLM_QUERIES, **CURATION_QUERIES, **ANALYTIC_QUERIES, **EXT_QUERIES}


def oracle_sql() -> dict[str, str]:
    from dataplatform_cdc_pipeline_spark.queries import ORACLES
    from dataplatform_cdc_pipeline_spark.queries_analytic import ANALYTIC_ORACLES
    from dataplatform_cdc_pipeline_spark.queries_curation import CURATION_ORACLES
    from dataplatform_cdc_pipeline_spark.queries_ext import EXT_ORACLES
    from dataplatform_cdc_pipeline_spark.queries_llm import LLM_ORACLES

    return {**ORACLES, **LLM_ORACLES, **CURATION_ORACLES, **ANALYTIC_ORACLES, **EXT_ORACLES}
