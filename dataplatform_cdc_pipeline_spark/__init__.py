"""dataplatform_cdc_pipeline_spark — a PySpark-native incremental CDC merge engine.

A brand-new engine with the query and data-processing capabilities of
``praveensaras/dataplatform-cdc-pipeline`` (see SURVEY.md), re-expressed
idiomatically on Spark DataFrames / Spark SQL / Structured Streaming:

- Debezium-style JSON change events (``__op`` / ``__ts_ns`` / ``__source_pos``
  envelope) are deduped to the latest event per primary key with a window
  function (reference: merge.sql:307-326).
- A config-driven JSON→typed-column cast-rule engine (epoch seconds/nanos/days,
  bit-to-int, ISO datetimes, base64 row keys, IST clock columns, …;
  reference: merge.sql:220-304, step-5.sql:230-249) built purely from native
  Column expressions — no Python UDFs on the hot path.
- Delete-vs-upsert survivorship by event time (reference: merge.sql:334-349).
- Atomic upsert/delete merge into bucketed parquet targets with persisted
  watermarks and run-audit logs (reference: merge.sql:368-457, step-8).
- Beyond-reference LLM-data-pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search, text
  analysis, multimodal column plumbing.
"""

from dataplatform_cdc_pipeline_spark.config import MergeConfig, load_config, lookup_config
from dataplatform_cdc_pipeline_spark.engine import MergeResult, run_merge
from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
from dataplatform_cdc_pipeline_spark.session import get_spark

__all__ = [
    "MergeConfig",
    "MergeResult",
    "ParquetMergeTarget",
    "WatermarkStore",
    "get_spark",
    "load_config",
    "lookup_config",
    "run_merge",
]

__version__ = "0.1.0"
