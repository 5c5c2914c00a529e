"""Physical-plan inspection & assertion utilities."""

from wd2duckdb_spark.plans.inspect import (
    executed_plan_str,
    explain_str,
    partition_filters,
    plan_summary,
    pushed_filters,
    read_schema,
)

__all__ = [
    "executed_plan_str",
    "explain_str",
    "partition_filters",
    "plan_summary",
    "pushed_filters",
    "read_schema",
]
