"""Optimization-round measurement probe (guide §1).

Runs ONE query in this process: times it cold through the noop sink
(same methodology as bench.py), captures .explain("formatted") and the
bench_phases spans, and (optionally, --warm N) re-times warm passes.

Usage:
  python scripts/opt_probe.py <query> [--warm N] [--plan-out FILE] [--sf DIR]

Prints a JSON line: {"query": ..., "cold": s, "warm": [s...], "phases": {...}}.
The plan is written AFTER the timed run (a lifecycle query's final frame
reads artifacts staged during the run, so explain-before-run would fail
or measure the wrong tree).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataplatform_cdc_pipeline_spark import bench_phases
from dataplatform_cdc_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    name = args[0]
    warm = 0
    plan_out = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = 1
    while i < len(args):
        if args[i] == "--warm":
            warm = int(args[i + 1]); i += 2
        elif args[i] == "--plan-out":
            plan_out = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    spark = get_spark("cdc-engine-optprobe")
    fn = entrymod.queries()[name]

    # same warmup as bench.run_once: table listing + python worker pool
    from dataplatform_cdc_pipeline_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, 4096, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        _noop, "id long"
    ).count()

    spark.sparkContext.setJobDescription(f"optprobe: {name} cold")
    bench_phases.reset()
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    t1 = time.time()
    ph = bench_phases.spans(end=t1)
    cold = round(t1 - t0 - ph.get("setup", 0.0), 3)

    if plan_out:
        # re-build the frame so the plan reflects the artifacts the run staged
        bench_phases.reset()
        plan = fn(spark, sf_dir)
        txt = plan._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(plan_out, "w") as f:
            f.write(txt)

    warms = []
    for k in range(warm):
        spark.sparkContext.setJobDescription(f"optprobe: {name} warm {k}")
        bench_phases.reset()
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t1 = time.time()
        ph2 = bench_phases.spans(end=t1)
        warms.append(round(t1 - t0 - ph2.get("setup", 0.0), 3))

    print(json.dumps({"query": name, "cold": cold, "warm": warms, "phases": ph}))


if __name__ == "__main__":
    main()
