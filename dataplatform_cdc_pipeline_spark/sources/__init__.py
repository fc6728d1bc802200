"""Sources: batch/stream readers for raw CDC tables + deterministic
test-feed synthesis from the driver's synthetic tables."""

from dataplatform_cdc_pipeline_spark.sources.cdc import (
    USER_STATE_SCHEMA,
    read_cdc_batch,
    synthesize_cdc_from_events,
    user_state_config,
)

__all__ = [
    "USER_STATE_SCHEMA",
    "read_cdc_batch",
    "synthesize_cdc_from_events",
    "user_state_config",
]
