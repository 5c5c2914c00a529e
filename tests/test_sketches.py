"""Sketch tier: error bounds vs exact answers + merge correctness.

Sketch estimates are engine-defined (Datasketches), so these queries
have no DuckDB oracle; the correctness pin is here — every estimate
must land within the sketch's published error envelope of the exact
answer computed on the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from wd2duckdb_spark.catalog import tbl
from wd2duckdb_spark.operators.sketches import (
    q_hll_distinct_rollup,
    q_kll_value_quantiles,
    q_theta_distinct_users,
)


def test_hll_rollup_within_error(spark):
    """Per-source doc estimate within 5% of exact (lgK=12 ⇒ ~1.6% RSE;
    5% ≈ 3σ) — and the union-merge path agrees with sketching the
    source directly."""
    got = {r["source"]: r for r in q_hll_distinct_rollup(spark, SF_DIR).collect()}
    exact = {
        r["source"]: r["n"]
        for r in tbl(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for src, row in got.items():
        assert abs(row["approx_docs"] - exact[src]) <= max(3, 0.05 * exact[src]), (
            src,
            row["approx_docs"],
            exact[src],
        )
        assert row["n_leaf_sketches"] >= 1

    direct = {
        r["source"]: r["est"]
        for r in tbl(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("doc_id"), F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    for src in exact:
        # HLL union of leaf sketches == sketch of the union (same lgK)
        assert got[src]["approx_docs"] == direct[src], src


def test_theta_distinct_within_error(spark):
    got = {
        r["event_type"]: r["approx_users"]
        for r in q_theta_distinct_users(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in tbl(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for et in exact:
        assert abs(got[et] - exact[et]) <= max(3, 0.05 * exact[et]), (
            et,
            got[et],
            exact[et],
        )


def test_kll_quantiles_within_rank_error(spark):
    """KLL default k=200 ⇒ ~1.65% rank error (1σ); assert each reported
    quantile's TRUE rank in the exact data is within 5% of the target
    rank — rank error is the KLL guarantee (value error is not)."""
    rows = q_kll_value_quantiles(spark, SF_DIR).collect()
    e = tbl(spark, SF_DIR, "events")
    for r in rows:
        vals = sorted(
            x["value"]
            for x in e.filter(F.col("event_type") == r["event_type"])
            .select("value")
            .collect()
        )
        n = len(vals)
        for q, got_v in (("p50", r["p50"]), ("p95", r["p95"]), ("p99", r["p99"])):
            target = float(q[1:]) / 100.0
            import bisect

            rank = bisect.bisect_right(vals, got_v) / n
            assert abs(rank - target) <= 0.05, (
                r["event_type"],
                q,
                got_v,
                rank,
            )


def test_salted_agg_matches_plain(spark):
    """Salted two-phase aggregation == one-phase groupBy, row-for-row."""
    from wd2duckdb_spark.operators.skew import salted_agg_heavy_hitters

    e = tbl(spark, SF_DIR, "events")
    got = [
        (r["event_type"], r["n_events"], r["total_value"])
        for r in salted_agg_heavy_hitters(e).collect()
    ]
    want = [
        (r["event_type"], r["n_events"], r["total_value"])
        for r in e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), "event_type")
        .collect()
    ]
    assert got == want
