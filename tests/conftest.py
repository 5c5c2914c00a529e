from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
FIXTURE_DUMP = "/root/repo/tests/fixtures/mini_dump.json"


@pytest.fixture(scope="session")
def spark():
    from wd2duckdb_spark import get_spark

    s = get_spark(
        app_name="wd2duckdb_spark_tests", master="local[8]", shuffle_partitions=8
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def kg_tables(spark, tmp_path_factory):
    """Fixture dump ingested once per session → dict of DataFrames."""
    from wd2duckdb_spark.ingest import ingest
    from wd2duckdb_spark.views import register_views

    out = str(tmp_path_factory.mktemp("kg")) + "/kg"
    ingest(spark, FIXTURE_DUMP, out)
    return register_views(spark, out)
