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


#: (session id, sf_dir, name) → DataFrame. A DataFrame is an immutable
#: logical plan, so reuse is safe; caching skips the parquet footer /
#: schema-inference read that otherwise repeats per query (~100 ms each
#: on the driver — pure plan-build latency, no effect on executors).
_scan_cache: dict[tuple[int, str, str], DataFrame] = {}


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (parquet scan with pushdown/pruning).

    ``events.parquet`` stores ``TIMESTAMP(NANOS)``, which Spark's
    parquet reader rejects; it is read via the legacy nanos-as-long
    mode and converted to a microsecond timestamp with exact integer
    arithmetic (``div`` — not double division, which loses low bits at
    1e18-scale nanos). DuckDB truncates nanos→micros the same way.
    """
    key = (id(spark), sf_dir, name)
    cached = _scan_cache.get(key)
    if cached is not None:
        return cached
    _scan_cache[key] = df = _read(spark, sf_dir, name)
    return df


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
