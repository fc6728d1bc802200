"""r10 promotion candidates (queries_staged.py): each staged query must
already pass the same Spark-vs-DuckDB parity gate the driver applies,
so the r10 promotion is a dict move, not new work — and the registry
must NOT contain them yet (the 240-freeze until the backlog drains)."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entrymod
from check_parity import normalize

from dataplatform_cdc_pipeline_spark.queries_staged import (
    STAGED_ORACLES,
    STAGED_QUERIES,
)
from dataplatform_cdc_pipeline_spark.sources.tables import TABLES


def test_staged_queries_not_registered_and_registry_frozen():
    q = entrymod.queries()
    assert len(q) == 240
    assert not set(STAGED_QUERIES) & set(q)
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = STAGED_QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(STAGED_ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf) > 0
    assert normalize(sdf) == normalize(odf)
