"""Central query registry: name → (Spark callable, DuckDB oracle SQL).

Assembles every operator module's QUERIES/ORACLES pair. The driver
contract (``__spark_entry__.py``) and ``bench.py`` both read from here,
so adding an operator = adding it to its module's two dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wd2duckdb_spark.functions import (
    ann_index,
    bpe,
    dedup,
    multimodal,
    retrieval,
    scalar,
    similarity,
    text,
    training,
)
from wd2duckdb_spark.operators import (
    analytics,
    graph,
    quality,
    relational,
    sketches,
    skew,
    temporal,
    tpch_derived,
)
from wd2duckdb_spark.streaming import sessionize, transform_state, typed_state

_MODULES = (
    relational,
    tpch_derived,
    graph,
    analytics,
    temporal,
    quality,
    scalar,
    text,
    training,
    dedup,
    bpe,
    similarity,
    ann_index,
    retrieval,
    sessionize,
    multimodal,
    sketches,
    skew,
    transform_state,
    typed_state,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
