"""Driver-exact simulation: run the full queries()/oracle_sql() parity gate
under a PLAIN SparkSession (local[32], zero engine configs) — exactly the
environment the driver's verify supplies. Catches anything that silently
depends on the engine's own session tuning (timezone, ANSI, AQE, shuffle
partitions, nanos handling)."""

from __future__ import annotations

import os
import sys

import duckdb
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entrymod
from check_parity import normalize
from dataplatform_cdc_pipeline_spark.sources.tables import TABLES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
#: optional name subset, like check_parity.py
ONLY = sys.argv[1:] or None


def main() -> int:
    spark = SparkSession.builder.master("local[32]").appName("driver-exact-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            print(name, "SPARK ERROR", type(e).__name__, str(e)[:160])
            failures.append(name)
            continue
        if name not in oracles:
            print(name, "rows-only:", len(sdf))
            if len(sdf) == 0:
                failures.append(name)
            continue
        odf = con.execute(oracles[name]).fetchdf()
        ok = sorted(sdf.columns) == sorted(odf.columns) and normalize(sdf) == normalize(odf)
        print(name, "OK" if ok else "MISMATCH", len(sdf))
        if not ok:
            failures.append(name)
    print("DRIVER-EXACT SIM:", "ALL MATCH" if not failures else failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
