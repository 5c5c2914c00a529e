"""Dump a physical-plan property table for every registered query.

Usage: python tools/explain_all.py [sf_dir] > PLANS_SNAPSHOT.md

One row per queries() entry: exchange (shuffle) count, broadcast/SMJ/
shuffled-hash/nested-loop join counts, python-UDF count, whether the
scan shows pushed filters — the at-a-glance evidence that each
operator compiles to the plan its docstring promises.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from wd2duckdb_spark import get_spark
    from wd2duckdb_spark.plans import plan_summary, pushed_filters
    from wd2duckdb_spark.registry import all_queries

    spark = get_spark(app_name="explain_all")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"# Plan snapshot ({sf_dir})\n")
    print(
        "| query | exchanges | bcast | smj | shj | nested | py-udf |"
        " pushed filters |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            s = plan_summary(df)
            pf = "yes" if pushed_filters(df) else "—"
            print(
                f"| {name} | {s['exchange']} | {s['broadcast_hash_join']} |"
                f" {s['sort_merge_join']} | {s['shuffled_hash_join']} |"
                f" {s['nested_loop_join']} | {s['python_udf']} | {pf} |"
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"| {name} | ERROR: {str(e)[:60]} | | | | | | |")


if __name__ == "__main__":
    main()
