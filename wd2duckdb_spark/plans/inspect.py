"""Plan inspection: make "did Catalyst do the right thing" testable.

The engine's scale guarantees are plan properties — filters reach the
scan, dims broadcast, bucketed joins skip the exchange, top-k avoids
the global sort. These helpers extract those properties so tests pin
them (tests/test_plans.py) instead of trusting comments.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters bracket bodies, one string per parquet scan
    (filter entries contain commas, so no per-entry split)."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df))
        if m.group(1).strip()
    ]


def executed_plan_str(df: DataFrame) -> str:
    """The FINAL physical plan after AQE re-planning — only meaningful
    after an action has run on ``df``; explain() before execution shows
    isFinalPlan=false placeholders instead."""
    return df._jdf.queryExecution().executedPlan().toString()


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters bracket bodies per scan — non-empty means the
    scan prunes hive partition directories before opening files."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", explain_str(df))
        if m.group(1).strip()
    ]


def read_schema(df: DataFrame) -> list[str]:
    """Column sets actually read by each scan (column-pruning check)."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df))
    ]


def plan_summary(df: DataFrame) -> dict[str, int]:
    """Operator counts that matter for scale review.

    Counts on the ``simple`` plan — ``formatted`` prints every node
    twice (tree + detail section) and would double-count.
    """
    p = explain_str(df, "simple")
    return {
        "broadcast_hash_join": p.count("BroadcastHashJoin"),
        "sort_merge_join": p.count("SortMergeJoin"),
        "shuffled_hash_join": p.count("ShuffledHashJoin"),
        "nested_loop_join": p.count("BroadcastNestedLoopJoin")
        + p.count("CartesianProduct"),
        "exchange": p.count("Exchange"),
        "take_ordered": p.count("TakeOrderedAndProject"),
        "hash_aggregate": p.count("HashAggregate"),
        "generate": p.count("Generate"),
        "python_udf": p.count("BatchEvalPython") + p.count("ArrowEvalPython"),
        "map_in_pandas": p.count("MapInPandas"),
    }
