"""Tiny catalog helper for the driver's parquet testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (parquet scan with pushdown/pruning).

    ``events.parquet`` stores ``TIMESTAMP(NANOS)``, which Spark's
    parquet reader rejects; it is read via the legacy nanos-as-long
    mode and converted to a microsecond timestamp with exact integer
    arithmetic (``div`` — not double division, which loses low bits at
    1e18-scale nanos). DuckDB truncates nanos→micros the same way.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
