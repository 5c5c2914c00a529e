"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``wd2duckdb_spark``; queries and oracles are
registered per-module and assembled by ``wd2duckdb_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wd2duckdb_spark.functions.text import q_clean_corpus_pipeline
from wd2duckdb_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the composed training-data
    cleaning pipeline — language filter → quality thresholds → exact
    dedup → per-source accounting of the surviving corpus. One narrow
    filter chain into one dedup shuffle into one tiny agg; the
    end-to-end shape this engine is built around."""
    return q_clean_corpus_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted only for
    ops whose result is engine-defined, e.g. LSH-bucketed ANN)."""
    return all_oracles()
