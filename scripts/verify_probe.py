"""Verification probes at the package boundary (edge paths beyond the happy path)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark import MergeConfig, get_spark
from dataplatform_cdc_pipeline_spark.engine import run_merge
from dataplatform_cdc_pipeline_spark.operators.merge_target import ParquetMergeTarget
from dataplatform_cdc_pipeline_spark.operators.watermark import WatermarkStore
from dataplatform_cdc_pipeline_spark.sources.cdc import USER_STATE_SCHEMA, user_state_config
from pyspark.sql import types as T

spark = get_spark("verify-probe", cpus=4, shuffle_partitions=4)
tmp = tempfile.mkdtemp()


def mk(events_rows):
    """rows: (op, ts_ns, pos, user_id, value) → bronze frame"""
    import json
    import datetime

    data = []
    for op, ts_ns, pos, uid, value in events_rows:
        payload = json.dumps(
            {"__op": op, "__ts_ns": str(ts_ns), "__source_pos": str(pos), "user_id": uid,
             "event_type": "x", "value": value, "k": 1}
        )
        data.append((payload, datetime.datetime(2024, 1, 1, 0, 0, pos)))
    return spark.createDataFrame(data, "data string, load_ts timestamp")


def fresh(cfg_kwargs=None):
    import uuid

    cfg = user_state_config(**(cfg_kwargs or {}))
    d = f"{tmp}/{uuid.uuid4().hex[:6]}"
    return cfg, ParquetMergeTarget(spark, f"{d}/t", cfg, USER_STATE_SCHEMA), WatermarkStore(spark, f"{d}/a")


def state(target):
    return sorted(
        (r["user_id"], r["value"]) for r in target.read().select("user_id", "value").collect()
    )


# P1: inactive config → zero side effects (merge.sql:90-94)
cfg, target, audit = fresh({"is_active": 0})
res = run_merge(spark, cfg, target, audit, raw=mk([("c", 1_000_000_000, 1, 1, 1.0)]))
print("P1 inactive:", res["status"], "| target exists:", target.exists())

# P2: delete of never-seen key → no-op, SUCCESS (J2 `i.pk IS NULL` branch)
cfg, target, audit = fresh()
res = run_merge(spark, cfg, target, audit, raw=mk([("d", 1_000_000_000, 1, 99, 0.0)]), deterministic_audit=True)
print("P2 lone delete:", res["status"], "rows:", target.read().count(), "del_count:", res["records_deleted"])

# P3: delete-then-reinsert in one batch → row present (upsert newer wins)
cfg, target, audit = fresh()
run_merge(spark, cfg, target, audit, raw=mk([("d", 1_000_000, 1, 7, 0.0), ("c", 2_000_000, 2, 7, 42.0)]), deterministic_audit=True)
print("P3 delete-then-reinsert:", state(target))

# P4: update-then-delete → row absent (delete newer wins)
cfg, target, audit = fresh()
run_merge(spark, cfg, target, audit, raw=mk([("u", 1_000_000, 1, 7, 1.0), ("d", 2_000_000, 2, 7, 0.0)]), deterministic_audit=True)
print("P4 update-then-delete rows:", target.read().count())

# P5: tiebreak by __source_pos at equal __ts_ns → higher pos wins
cfg, target, audit = fresh()
run_merge(spark, cfg, target, audit, raw=mk([("c", 5_000, 1, 7, 1.0), ("u", 5_000, 2, 7, 2.0)]), deterministic_audit=True)
print("P5 pos tiebreak:", state(target))

# P6: two-stream fidelity plan produces identical result
cfg, target, audit = fresh({"two_stream_fidelity": True})
run_merge(spark, cfg, target, audit,
          raw=mk([("c", 1_000_000, 1, 1, 1.0), ("u", 2_000_000, 2, 1, 2.0), ("d", 1_500_000, 3, 2, 0.0),
                  ("c", 1_000_000, 4, 2, 9.0), ("d", 3_000_000, 5, 3, 0.0)]),
          deterministic_audit=True)
print("P6 two-stream:", state(target), "(expect [(1, 2.0)] — key2 delete (1.5µs) newer than its c (1µs) → deleted; key3 lone delete no-op)")

# P7: update_only_op_u — matched 'c' does not overwrite (step-6:431-438)
cfg, target, audit = fresh({"update_only_op_u": True})
run_merge(spark, cfg, target, audit, raw=mk([("c", 1_000_000, 1, 1, 1.0)]), window=(None, None), deterministic_audit=True)
run_merge(spark, cfg, target, audit, raw=mk([("c", 2_000_000, 2, 1, 99.0)]), window=(None, None), deterministic_audit=True)
print("P7 op_u-gated matched 'c':", state(target), "(expect value stays 1.0)")

# P8: strict_ts_guard rejects older cross-batch update; default overwrites
for strict, label in [(False, "default(ref-fidelity)"), (True, "strict")]:
    cfg, target, audit = fresh({"strict_ts_guard": strict})
    run_merge(spark, cfg, target, audit, raw=mk([("u", 5_000_000, 1, 1, 5.0)]), window=(None, None), deterministic_audit=True)
    run_merge(spark, cfg, target, audit, raw=mk([("u", 1_000_000, 2, 1, 1.0)]), window=(None, None), deterministic_audit=True)
    print(f"P8 {label}:", state(target))

# P9: failure path → FAILED audit row + re-raise (poison: non-numeric PK payload,
# ANSI cast failure ≈ the reference's CAST error → ROLLBACK + RESIGNAL)
print("ansi:", spark.conf.get("spark.sql.ansi.enabled"))
cfg, target, audit = fresh()
import json as _j0, datetime as _dt0
poison = _j0.dumps({"__op": "c", "__ts_ns": "1000", "__source_pos": "1", "user_id": "not-a-number", "value": 1.0})
try:
    run_merge(spark, cfg, target, audit,
              raw=spark.createDataFrame([(poison, _dt0.datetime(2024, 1, 1))], "data string, load_ts timestamp"),
              deterministic_audit=True)
    print("P9 no exception raised")
except Exception as e:
    print("P9 raised:", type(e).__name__)
print("P9 audit:", [(r["run_status"], (r["error_msg"] or "")[:60]) for r in audit.history().collect()])
print("P9 target untouched:", not target.exists())

# P10: 'null' string payload → SQL NULL (step-5.sql:239)
cfg, target, audit = fresh()
import json as _j, datetime as _dt
row = _j.dumps({"__op": "c", "__ts_ns": "1000", "__source_pos": "1", "user_id": 5, "event_type": "null", "value": "null", "k": "null"})
run_merge(spark, cfg, target, audit, raw=spark.createDataFrame([(row, _dt.datetime(2024, 1, 1))], "data string, load_ts timestamp"), deterministic_audit=True)
print("P10 null-strings:", [(r["user_id"], r["event_type"], r["value"], r["k"]) for r in target.read().collect()])

shutil.rmtree(tmp)
print("PROBES DONE")
