from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


def _enable_protobuf_shim() -> None:
    """If no ``google.protobuf`` is installed but the container ships
    one inside the public Google Cloud SDK, put tools/protobuf_shim on
    the path (see its docstring) — BEFORE any SparkSession exists, and
    via PYTHONPATH too so Spark's Python workers (which host the
    transformWithState state-server client) inherit it."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    shim = os.path.join(os.path.dirname(__file__), "..", "tools", "protobuf_shim")
    shim = os.path.abspath(shim)
    if not os.path.isdir(
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
    ):
        return
    sys.path.insert(0, shim)
    os.environ["PYTHONPATH"] = (
        shim + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else shim
    )


_enable_protobuf_shim()

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
