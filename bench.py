"""Benchmark harness — runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
parallelism: local[$SPARK_GRAFT_CPUS] (default all cores).
Each query is materialized through the `noop` sink — full computation,
no driver-side collect in the timed path.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from dataplatform_cdc_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("cdc-engine-bench")
    queries = entrymod.queries()

    # warmup: JVM/codegen spin-up + file-listing so the first timed query
    # isn't charged for session initialization
    from dataplatform_cdc_pipeline_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record failures, keep benching
            timings[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
