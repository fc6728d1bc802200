"""Structured Streaming front-end for the CDC merge engine."""

from dataplatform_cdc_pipeline_spark.streaming.stream_merge import (
    run_streaming_merge,
    streaming_dedup_within_watermark,
)

__all__ = ["run_streaming_merge", "streaming_dedup_within_watermark"]
