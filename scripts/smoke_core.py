"""Quick manual smoke of the core merge lifecycle (not a pytest)."""

import shutil
import tempfile

import duckdb

from dataplatform_cdc_pipeline_spark.engine import run_merge
from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.cdc import (
    USER_STATE_SCHEMA,
    synthesize_cdc_from_events,
    user_state_config,
)

SF = "/root/testdata/sf0.001"

from dataplatform_cdc_pipeline_spark.sources.tables import load_table

spark = get_spark("smoke", cpus=4, shuffle_partitions=4)
events = load_table(spark, SF, "events")
raw = synthesize_cdc_from_events(events)
raw.show(3, truncate=80)

tmp = tempfile.mkdtemp()
cfg = user_state_config()
target = ParquetMergeTarget(spark, f"{tmp}/user_state", cfg, USER_STATE_SCHEMA)
audit = WatermarkStore(spark, f"{tmp}/audit")

res = run_merge(spark, cfg, target, audit, raw=raw, deterministic_audit=True)
print("merge result:", dict(res))

out = target.read().orderBy("user_id")
out.show(30)
print("rows:", out.count())

# DuckDB oracle: latest event per user; user absent iff latest is a delete.
oracle = duckdb.connect().execute(
    f"""
    WITH ranked AS (
      SELECT user_id,
             event_type,
             value,
             CASE WHEN event_type='error' THEN 'd' WHEN event_type='signup' THEN 'c' ELSE 'u' END AS op,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM '{SF}/events.parquet'
    )
    SELECT user_id, event_type, round(value, 6) AS value
    FROM ranked WHERE rn = 1 AND op != 'd' ORDER BY user_id
    """
).fetchall()
got = [(r["user_id"], r["event_type"], round(r["value"], 6)) for r in out.collect()]
exp = [(a, b, round(c, 6)) for a, b, c in oracle]
print("MATCH" if got == exp else f"MISMATCH\ngot={got}\nexp={exp}")

# idempotent re-run: watermark advanced, second run is a no-op
res2 = run_merge(spark, cfg, target, audit, raw=raw, deterministic_audit=True)
print("rerun:", dict(res2))
print("rows after rerun:", target.read().count())
shutil.rmtree(tmp)
