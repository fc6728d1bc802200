"""Text-format landing readers (sources/files.py): corrupt-record policy
across PERMISSIVE / DROPMALFORMED / FAILFAST, schema-drift absorption,
CSV quoting round-trip."""

import pytest
from pyspark.sql import functions as F

from dataplatform_cdc_pipeline_spark.sources.files import CORRUPT_COL, read_csv, read_jsonl


@pytest.fixture()
def jsonl_dir(spark, tmp_path):
    p = str(tmp_path / "src")
    spark.createDataFrame(
        [
            ('{"id": 1, "name": "a"}',),
            ('{"id": 2}',),          # drifted: missing field -> NULL
            ('{broken',),             # malformed
        ],
        "value string",
    ).write.text(p)
    return p


SCHEMA = "id long, name string"


def test_permissive_quarantines_and_absorbs_drift(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA).localCheckpoint(eager=True)
    assert CORRUPT_COL in df.columns
    good = df.filter(F.col(CORRUPT_COL).isNull()).collect()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).collect()
    assert sorted((r["id"], r["name"]) for r in good) == [(1, "a"), (2, None)]
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "{broken"


def test_dropmalformed_silently_drops(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA, mode="DROPMALFORMED")
    assert CORRUPT_COL not in df.columns
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_failfast_raises(spark, jsonl_dir):

    with pytest.raises(Exception):
        read_jsonl(spark, jsonl_dir, SCHEMA, mode="FAILFAST").collect()


def test_bad_mode_rejected(spark, jsonl_dir):
    with pytest.raises(ValueError, match="mode must be one of"):
        read_jsonl(spark, jsonl_dir, SCHEMA, mode="permissive")


def test_csv_quoting_roundtrip(spark, tmp_path):
    """Embedded commas, double quotes, and an escaped quote survive the
    write → read round-trip byte-identically."""
    p = str(tmp_path / "csv")
    rows = [(1, 'plain'), (2, 'a,b'), (3, 'say "hi"'), (4, 'both, "x"')]
    spark.createDataFrame(rows, "id long, payload string").write.csv(p, header=True)
    back = read_csv(spark, p, "id long, payload string")
    got = sorted((r["id"], r["payload"]) for r in back.collect())
    assert got == sorted(rows)


def test_csv_failfast_on_malformed(spark, tmp_path):

    p = str(tmp_path / "csvbad")
    spark.createDataFrame(
        [("id,n",), ("1,2",), ("x,y,z,extra,boom",)], "value string"
    ).coalesce(1).write.text(p)
    with pytest.raises(Exception):
        read_csv(spark, p, "id long, n long", mode="FAILFAST").collect()


# ---------------------------------------------------------------------------
# ORC (sources/files.read_orc): declared-schema contract
# ---------------------------------------------------------------------------


@pytest.fixture()
def orc_dir(spark, tmp_path):
    p = str(tmp_path / "orc")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, score double"
    ).write.orc(p)
    return p


def test_orc_roundtrip_and_pruning(spark, orc_dir):
    from dataplatform_cdc_pipeline_spark.sources.files import read_orc

    df = read_orc(spark, orc_dir, "id long, name string")
    assert df.columns == ["id", "name"]  # extra file column pruned
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [
        (1, "a"), (2, "b"),
    ]


def test_orc_missing_declared_column_reads_null(spark, orc_dir):
    from dataplatform_cdc_pipeline_spark.sources.files import read_orc

    df = read_orc(spark, orc_dir, "id long, missing_col string")
    assert [r["missing_col"] for r in df.collect()] == [None, None]


def test_orc_type_clash_absorbs_to_null(spark, orc_dir):
    # measured Spark behavior (pinned so a future Spark change is
    # noticed): an unconvertible declared type reads as NULL, it does
    # not fail the scan — same absorb posture as JSONL field drift
    from dataplatform_cdc_pipeline_spark.sources.files import read_orc

    df = read_orc(spark, orc_dir, "id long, name double")
    assert [r["name"] for r in df.collect()] == [None, None]


def test_orc_self_describing_without_schema(spark, orc_dir):
    from dataplatform_cdc_pipeline_spark.sources.files import read_orc

    df = read_orc(spark, orc_dir)
    assert set(df.columns) == {"id", "name", "score"}
    assert df.count() == 2
