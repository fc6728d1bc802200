"""Staged r13 queries (queries_staged_r13.py): right-to-be-forgotten
across the LSH dedup index and the IVF,SQ8 index — driver-style DuckDB
parity gate at the test scale factor, plus the non-registration pin
(they enter the registry WITH the r13 rotation, not before). The
operator-level erase() semantics live in tests/test_dedup_index.py and
tests/test_ivf_index.py."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entrymod
from check_parity import dtype_mismatches, normalize

from dataplatform_cdc_pipeline_spark.queries_staged_r13 import (
    STAGED_R13_ORACLES,
    STAGED_R13_QUERIES,
)
from dataplatform_cdc_pipeline_spark.sources.tables import TABLES


def test_staged_r13_not_registered():
    q = entrymod.queries()
    assert len(q) == 248
    assert not set(STAGED_R13_QUERIES) & set(q)
    assert set(STAGED_R13_QUERIES) == set(STAGED_R13_ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED_R13_QUERIES))
def test_staged_r13_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = STAGED_R13_QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(STAGED_R13_ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert not dtype_mismatches(sdf, odf)  # driver hash is dtype-sensitive
    assert len(sdf) == len(odf) > 0
    assert normalize(sdf) == normalize(odf)
