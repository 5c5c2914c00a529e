"""Physical-plan inspection & assertion utilities."""

from wd2duckdb_spark.plans.inspect import (
    explain_str,
    partition_filters,
    plan_summary,
    pushed_filters,
    read_schema,
)

__all__ = [
    "explain_str",
    "partition_filters",
    "plan_summary",
    "pushed_filters",
    "read_schema",
]
