"""Data-plane operators: dedup, merge target, watermarks, LLM-data ops."""

from dataplatform_cdc_pipeline_spark.operators.dedup import latest_per_key

__all__ = ["latest_per_key"]
