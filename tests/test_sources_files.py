"""CSV / JSON-lines source-sink roundtrips: schema and values survive
both interchange formats, including timestamps, floats, and strings
with embedded delimiters."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tests.conftest import SF_DIR
from wd2duckdb_spark.sources.files import read_csv, read_jsonl, write_csv, write_jsonl

TRICKY_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("val", DoubleType()),
        StructField("ts", TimestampType()),
    ]
)


@pytest.fixture()
def tricky_df(spark):
    rows = [
        Row(id=1, name='comma, quote " and\nnewline', val=1.5, ts=None),
        Row(id=2, name=None, val=-0.25, ts=None),
        Row(id=3, name="plain", val=None, ts=None),
    ]
    df = spark.createDataFrame(rows, TRICKY_SCHEMA)
    return df.withColumn(
        "ts",
        F.when(F.col("id") == 1, F.lit("2024-06-01 12:34:56.789").cast("timestamp")),
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("id").collect()]


def test_csv_roundtrip(spark, tricky_df, tmp_path):
    path = str(tmp_path / "csv_out")
    write_csv(tricky_df, path)
    back = read_csv(spark, path, TRICKY_SCHEMA)
    assert back.schema == TRICKY_SCHEMA
    assert _sorted_rows(back) == _sorted_rows(tricky_df)


def test_jsonl_roundtrip(spark, tricky_df, tmp_path):
    path = str(tmp_path / "jsonl_out")
    write_jsonl(tricky_df, path)
    back = read_jsonl(spark, path, TRICKY_SCHEMA)
    assert back.schema == TRICKY_SCHEMA
    assert _sorted_rows(back) == _sorted_rows(tricky_df)


def test_csv_roundtrip_real_table(spark, tmp_path):
    """orders (timestamps + doubles + strings) survives CSV untouched."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # CSV has no NTZ concept; normalize to the session-TZ (UTC) type
    orders = orders.withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    back = read_csv(spark, path, orders.schema)
    assert back.count() == orders.count()
    a = orders.agg(
        F.round(F.sum("o_totalprice"), 2), F.max("o_orderdate"), F.min("o_orderkey")
    ).first()
    b = back.agg(
        F.round(F.sum("o_totalprice"), 2), F.max("o_orderdate"), F.min("o_orderkey")
    ).first()
    assert tuple(a) == tuple(b)


def test_existing_target_guard(spark, tricky_df, tmp_path):
    path = str(tmp_path / "guarded")
    write_csv(tricky_df, path)
    with pytest.raises(Exception):
        write_csv(tricky_df, path)  # mode='error' default refuses


def test_orc_roundtrip_real_table(spark, tmp_path):
    """ORC roundtrip on a real table: schema and values identical, and
    the scan still pushes predicates (the columnar-stats path)."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.sources.files import read_orc, write_orc

    src = tbl(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    plan = back.filter(back.o_orderkey == 42)._jdf.queryExecution().executedPlan().toString()
    assert "o_orderkey" in plan


def test_xml_roundtrip_real_table(spark, tmp_path):
    """XML roundtrip on a real table incl. timestamps: schema given
    explicitly, values identical."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.sources.files import read_xml, write_xml

    src = tbl(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_xml")
    write_xml(src, out, row_tag="order")
    back = read_xml(spark, out, src.schema, row_tag="order").select(*src.columns)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
