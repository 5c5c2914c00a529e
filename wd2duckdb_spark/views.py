"""Register the six tables + the homogeneous ``triples`` union view.

The reference's self-loop trick (value.rs:165-169) makes ``UNION ALL``
over all edge-class tables a homogeneous triple view — the SPARQL-ish
query surface (SURVEY §2.2). Each row also carries the value-type
discriminator code (dtype.rs:58-68) so consumers can filter by type or
join the virtual ``@DataType`` nodes (id.rs:48-55, 85).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.ids import DTYPE_CODES
from wd2duckdb_spark.ingest import TABLE_NAMES

#: table name → dtype code of the rows it holds (dtype.rs:28-38 inverted;
#: ``edge`` rows are Entity-typed = 5).
_TABLE_CODE = {
    "quantity": DTYPE_CODES["Quantity"],
    "coordinates": DTYPE_CODES["Coordinate"],
    "string": DTYPE_CODES["String"],
    "time": DTYPE_CODES["DateTime"],
    "edge": DTYPE_CODES["Entity"],
}


def load_tables(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read the 6 parquet table dirs produced by :func:`ingest.ingest`."""
    return {name: spark.read.parquet(f"{path}/{name}") for name in TABLE_NAMES}


def triples_view(tables: dict[str, DataFrame]) -> DataFrame:
    """Union of the 5 edge-class tables on the common
    ``(src_id, property_id, dst_id)`` prefix + ``dtype`` code column."""
    parts = [
        tables[name]
        .select("src_id", "property_id", "dst_id")
        .withColumn("dtype", F.lit(code).cast("int"))
        for name, code in _TABLE_CODE.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def register_views(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Create temp views ``vertex edge string coordinates quantity time``
    + ``triples``; returns the DataFrames."""
    tables = load_tables(spark, path)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    tri = triples_view(tables)
    tri.createOrReplaceTempView("triples")
    tables["triples"] = tri
    return tables
