"""Round-8 additions: TPC-H Q17/Q18 and the new LLM-pipeline tier
(leakage-safe split, perplexity-bucket sampling, vocab divergence,
repeated n-gram span detection). Correctness vs DuckDB is covered by
the oracle gate; these tests pin plan shapes and the semantic
invariants the oracles can't express.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from wd2duckdb_spark.plans import plan_summary


def test_q17_single_corpus_exchange_and_broadcast(spark):
    """The correlated per-part average is a window on the pruned frame:
    exactly one hash-partitioned exchange of lineitem rows (the window
    on l_partkey); the brand filter reaches lineitem via a broadcast
    join, never a shuffle."""
    from wd2duckdb_spark.operators.relational import (
        q_q17_small_quantity_revenue,
    )

    df = q_q17_small_quantity_revenue(spark, SF_DIR)
    s = plan_summary(df)
    assert s["broadcast_hash_join"] == 1
    assert s["sort_merge_join"] == 0 and s["shuffled_hash_join"] == 0
    # exchanges: 1 broadcast (part) + 1 hash (window) + 1 single-partition
    # (final 1-row agg); no second lineitem shuffle for the average
    assert s["exchange"] <= 3
    row = df.collect()[0]
    assert row["n_items"] > 0 and row["avg_yearly"] > 0


def test_q18_take_ordered_no_global_sort(spark):
    from wd2duckdb_spark.operators.relational import (
        q_q18_large_volume_customer,
    )

    df = q_q18_large_volume_customer(spark, SF_DIR)
    s = plan_summary(df)
    assert s["take_ordered"] == 1  # top-100 without a global sort
    rows = df.collect()
    assert 0 < len(rows) <= 100
    # every surviving order really exceeds the quantity threshold and
    # the frontier is value-sorted
    assert all(r["total_qty"] > 250 for r in rows)
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
