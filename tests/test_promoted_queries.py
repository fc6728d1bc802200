"""The three r10-promoted queries (queries_promoted.py): each was staged
through the r7-r9 registry freeze and must (a) be REGISTERED now with its
oracle (r9 verdict task 2: registry 240 -> 243) and (b) keep passing the
same Spark-vs-DuckDB parity gate the driver applies, at the test scale
factor (sf0.001 default; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
for the driver's own scale)."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entrymod
from check_parity import normalize

from dataplatform_cdc_pipeline_spark.queries_promoted import (
    PROMOTED_ORACLES,
    PROMOTED_QUERIES,
)
from dataplatform_cdc_pipeline_spark.sources.tables import TABLES


def test_promoted_queries_are_registered_with_oracles():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(PROMOTED_QUERIES) == set(PROMOTED_ORACLES)
    assert set(PROMOTED_QUERIES) <= set(q)
    assert set(PROMOTED_ORACLES) <= set(o)
    # registered via the shared dicts, not copies
    for name in PROMOTED_QUERIES:
        assert q[name] is PROMOTED_QUERIES[name]
        assert o[name] == PROMOTED_ORACLES[name]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PROMOTED_QUERIES))
def test_promoted_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = PROMOTED_QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(PROMOTED_ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf) > 0
    assert normalize(sdf) == normalize(odf)
