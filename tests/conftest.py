import pytest

from dataplatform_cdc_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdc-engine-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
