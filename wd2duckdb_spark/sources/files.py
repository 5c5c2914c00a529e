"""File-format sources/sinks beyond parquet: CSV and JSON-lines.

The reference reads exactly one format (JSON-lines dump, main.rs:
261-269); its *consumers* interchange through whatever DuckDB can
read. Our engine's native storage is parquet, but a complete source
surface needs the two interchange formats every pipeline eventually
meets. Rules enforced here:

- **Explicit schema always.** Schema inference costs an extra full
  pass over the data at 100 TB and can silently flip types between
  runs; every reader takes a ``StructType``.
- **Timestamps written as ISO-8601** with explicit format, so CSV
  roundtrips are byte-stable across engines and locales.
- Compression is the caller's choice; splittable formats matter at
  scale (gzip CSV/JSONL is NOT splittable — one task per file; prefer
  none/bzip2 for parallel reads, or write many shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: ISO-8601 with microseconds — matches both engines' default text form.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str | None = None,
) -> None:
    """Write a DataFrame as headered CSV shards.

    ``mode='error'`` keeps the reference's existing-target guard
    (main.rs:249-255) as the default.
    """
    w = (
        df.write.option("header", True)
        .option("timestampFormat", TS_FORMAT)
        # quote/escape pinned so embedded delimiters/newlines roundtrip
        .option("quote", '"')
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    w.mode(mode).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read headered CSV with an explicit schema (never inferred)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", TS_FORMAT)
        .option("quote", '"')
        .option("escape", '"')
        # quoted embedded newlines: required for correctness, but a
        # multiLine file is read as ONE split — for 100 TB interchange,
        # forbid newlines in fields at write time instead
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str | None = None,
) -> None:
    """Write a DataFrame as JSON-lines shards (one object per line —
    the reference's own input model, minus the array wrapper)."""
    w = df.write.option("timestampFormat", TS_FORMAT)
    if compression:
        w = w.option("compression", compression)
    w.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read JSON-lines with an explicit schema; malformed lines land in
    ``_corrupt_record`` when the schema declares it (PERMISSIVE), the
    same per-row tolerance as the dump ingest (main.rs:316-321)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str = "zstd",
) -> None:
    """Write ORC shards — the second columnar interchange format Spark
    ships natively (Hive-ecosystem consumers). Same stripe-level
    min/max + bloom statistics story as parquet row groups, so the
    layout guarantees of the sorted/bucketed writers carry over."""
    df.write.option("compression", compression).mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC. Schema rides in the file footer (self-describing, like
    parquet) — no inference pass, so no explicit-schema requirement."""
    return spark.read.orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    mode: str = "error",
) -> None:
    """Write XML shards (Spark 4 native XML source — the last common
    enterprise interchange format). One element per row under
    ``row_tag``; timestamps pinned to the same ISO form as CSV."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("timestampFormat", TS_FORMAT)
        .mode(mode)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Read XML with an explicit schema (inference would cost a full
    extra pass, same rule as CSV/JSONL)."""
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", row_tag)
        .option("timestampFormat", TS_FORMAT)
        .load(path)
    )
