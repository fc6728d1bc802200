"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, compare
row count + column names + order-insensitive values."""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataplatform_cdc_pipeline_spark.session import get_spark
from dataplatform_cdc_pipeline_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
ONLY = sys.argv[1:] or None


def dtype_mismatches(sdf, odf) -> list[str]:
    """Columns whose numeric KIND differs (int vs float) between the
    Spark and oracle frames. The driver's value hash is dtype-sensitive
    ("432.0" vs "432"), so these diverge even when %.9g-normalized
    strings agree — the exact class a DuckDB HUGEINT sum (→ float64)
    introduces. Shared with the staging parity tests so the class is
    caught BEFORE promotion (it slipped the r12 staging gate once)."""
    out = []
    for c in sdf.columns:
        if c not in odf.columns:
            continue
        ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
        if {ks, ko} == {"i", "f"} or {ks, ko} == {"u", "f"}:
            out.append(f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
    return out


def normalize(df):
    """pandas frame → column-sorted, row-sorted list of tuples."""
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{v:.9g}")
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main() -> int:
    spark = get_spark("parity", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        s_rows, o_rows = normalize(sdf), normalize(odf)
        cols_s, cols_o = sorted(sdf.columns), sorted(odf.columns)
        ok = True
        if cols_s == cols_o:
            for msg in dtype_mismatches(sdf, odf):
                print(f"{name}: DTYPE MISMATCH {msg} (driver hash would differ)")
                ok = False
        if cols_s != cols_o:
            print(f"{name}: SCHEMA MISMATCH spark={cols_s} oracle={cols_o}")
            ok = False
        elif len(s_rows) != len(o_rows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(s_rows)} oracle={len(o_rows)}")
            ok = False
        elif s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"{name}: VALUE MISMATCH ({sum(1 for a,b in zip(s_rows,o_rows) if a!=b)} rows) e.g.:")
            for a, b in diffs:
                print(f"   spark:  {a}\n   oracle: {b}\n   cols:   {cols_s}")
            ok = False
        if ok:
            print(f"{name}: OK rows={len(s_rows)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    print("ALL MATCH" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
