"""Semantic invariants + plan shapes for operators.temporal and
operators.quality (oracle parity is covered by tests/test_queries.py)."""

from __future__ import annotations

from tests.conftest import SF_DIR
from wd2duckdb_spark.operators.quality import q_dq_report
from wd2duckdb_spark.operators.temporal import (
    q_regr_trend,
    q_rolling_7d_features,
    q_scd2_intervals,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scd2_intervals_are_chained_and_change_only(spark):
    rows = q_scd2_intervals(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per user, and it is last
        assert [r.is_current for r in ivs].count(1) == 1
        assert ivs[-1].is_current == 1 and ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            # intervals chain without gaps and only open on change
            assert a.valid_to == b.valid_from
            assert a.attr != b.attr


def test_scd2_single_sort_pass(spark):
    """lag- and lead-windows share (user_id; ts, event_id): the plan
    must contain exactly one data-sized exchange on user_id."""
    p = _plan(q_scd2_intervals(spark, SF_DIR))
    assert p.count("hashpartitioning(user_id") == 1
    assert "Join" not in p


def test_rolling_7d_frame_bounds(spark):
    rows = q_rolling_7d_features(spark, SF_DIR).collect()
    assert all(r.w7_events >= 1 for r in rows)
    assert all(
        r.w7_value_max is not None and r.w7_value_sum is not None
        for r in rows
    )
    # fresh (unexecuted) plan: an executed AQE plan prints Final+Initial
    # sections, double-counting every operator
    p = _plan(q_rolling_7d_features(spark, SF_DIR))
    assert p.count("hashpartitioning(user_id") == 1
    assert "Join" not in p


def test_regr_trend_matches_numpy(spark):
    import numpy as np

    from wd2duckdb_spark.catalog import tbl

    rows = {r.user_id: r for r in q_regr_trend(spark, SF_DIR).collect()}
    ev = (
        tbl(spark, SF_DIR, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for user, es in list(by_user.items())[:5]:
        x = np.array([e.ts.timestamp() / 86400.0 for e in es])
        y = np.array([e.value for e in es])
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(rows[user].slope_per_day - slope) < 1e-4
        assert abs(rows[user].intercept - intercept) < 0.5
        checked += 1
    assert checked


def test_dq_report_clean_dataset(spark):
    rows = {r.check_name: r for r in q_dq_report(spark, SF_DIR).collect()}
    assert set(rows) == {
        "dup_orderkey",
        "null_orderkey",
        "negative_price",
        "null_orderdate",
        "bad_status",
        "orphan_custkey",
    }
    n_rows = {r.n_rows for r in rows.values()}
    assert len(n_rows) == 1  # every check reports the same row count
    assert all(r.n_violations == 0 and r.pass_ == 1 for r in _passes(rows))


def _passes(rows):
    # `pass` is a Python keyword; Row exposes it via asDict
    for r in rows.values():
        d = r.asDict()

        class _R:
            n_violations = d["n_violations"]
            pass_ = d["pass"]

        yield _R


def test_dq_report_detects_injected_violations(spark, tmp_path):
    """Corrupt a copy of orders (NULL key, negative price, orphan
    custkey) and point the same check suite at it — every injected
    defect must be counted."""
    from pyspark.sql import functions as F

    from wd2duckdb_spark.catalog import tbl

    sf_copy = tmp_path / "sf"
    sf_copy.mkdir()
    o = tbl(spark, SF_DIR, "orders").limit(100)
    bad = o.withColumn(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 50 == 0, None).otherwise(
            F.col("o_orderkey")
        ),
    ).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, -1.0).otherwise(
            F.col("o_totalprice")
        ),
    ).withColumn(
        "o_custkey", F.lit(99_999_999).cast("long")
    )
    bad.write.parquet(str(sf_copy / "orders.parquet"))
    tbl(spark, SF_DIR, "customer").write.parquet(
        str(sf_copy / "customer.parquet")
    )
    rows = {r.check_name: r for r in q_dq_report(spark, str(sf_copy)).collect()}
    assert rows["null_orderkey"].n_violations == 2
    assert rows["negative_price"].n_violations > 0
    assert rows["orphan_custkey"].n_violations == 100
    assert rows["null_orderdate"].n_violations == 0


def test_dq_report_orphan_check_not_forced_broadcast(spark):
    """Round 10: customer scales with the corpus, so the orphan anti
    join must not FORCE a broadcast — with the auto-broadcast
    threshold disabled no BroadcastExchange may survive (a hint
    would). At fixture scale AQE still picks a broadcast at runtime,
    which is the wanted adaptive behavior, not a pinned one."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = _plan(q_dq_report(spark, SF_DIR))
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    # the 1-row n_rows crossJoin keeps its (bounded) broadcast; the
    # LeftAnti itself must not be a broadcast join under threshold=-1
    assert "LeftAnti" in p
    for line in p.splitlines():
        if "BroadcastHashJoin" in line or "BroadcastNestedLoopJoin" in line:
            assert "LeftAnti" not in line, line
