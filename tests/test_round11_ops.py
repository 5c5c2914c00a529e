"""Round-11 scale-posture pins (VERDICT r10): supplier is SF-linear
(10k rows per TPC-H scale factor — only nation/25 and region/5 are
constant), so NO query may force-broadcast it.  Round 11 dropped the
``F.broadcast(supplier)`` hint from the seven flagged sites
(relational.py q5/q7/q8/q9/q15, graph.py graph_triangle,
tpch_derived.py q21); these tests pin that no BroadcastExchange whose
subtree scans supplier survives ``autoBroadcastJoinThreshold=-1``
(under the default threshold AQE still promotes supplier to a runtime
broadcast at fixture scale — that is the wanted behavior; only a
*hint* survives threshold=-1 and only a hint OOMs a 100 TB cluster).
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_DIR


def _plan_threshold_off(spark, build) -> str:
    """Simple-mode plan text with auto-broadcast disabled so any
    surviving BroadcastExchange comes from an F.broadcast hint."""
    from wd2duckdb_spark.plans import explain_str

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.catalog.clearCache()  # avoid cached AQE-finalized subtrees
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return explain_str(build(), "simple")
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def _node_start(line: str) -> int:
    """Column where the operator name starts (tree art stripped)."""
    m = re.match(r"^[\s:+\-*()0-9]*", line)
    return m.end() if m else 0


def _broadcast_subtrees(plan: str) -> list[str]:
    """Each BroadcastExchange node's subtree as one string."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        depth = _node_start(ln)
        sub = [ln]
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                break
            if _node_start(nxt) <= depth:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def _builders():
    from wd2duckdb_spark.operators.graph import q_graph_triangle
    from wd2duckdb_spark.operators.relational import (
        q_q5_local_supplier_volume,
        q_q7_bilateral_trade,
        q_q8_market_share,
        q_q9_profit_by_nation_year,
        q_q15_top_supplier,
    )
    from wd2duckdb_spark.operators.tpch_derived import q_q21_late_suppliers

    return {
        "q5_local_supplier_volume": q_q5_local_supplier_volume,
        "q7_bilateral_trade": q_q7_bilateral_trade,
        "q8_market_share": q_q8_market_share,
        "q9_profit_by_nation_year": q_q9_profit_by_nation_year,
        "q15_top_supplier": q_q15_top_supplier,
        "graph_triangle": q_graph_triangle,
        "q21_late_suppliers": q_q21_late_suppliers,
    }


@pytest.mark.parametrize("qname", sorted(_builders()))
def test_supplier_never_force_broadcast(spark, qname):
    """With threshold=-1, no surviving BroadcastExchange subtree may
    scan the supplier table.  Truly bounded dims (nation, region) and
    1-row aggregates (q15's global max) keep their hints — those
    subtrees are allowed, and they must NOT read supplier columns."""
    fn = _builders()[qname]
    p = _plan_threshold_off(spark, lambda: fn(spark, SF_DIR))
    for sub in _broadcast_subtrees(p):
        assert "supplier" not in sub, (qname, sub)


@pytest.mark.parametrize(
    "qname",
    ["graph_triangle", "q21_late_suppliers"],
)
def test_no_forced_broadcast_at_all(spark, qname):
    """The two queries with no bounded-dim hints must show ZERO
    BroadcastExchange under threshold=-1."""
    fn = _builders()[qname]
    p = _plan_threshold_off(spark, lambda: fn(spark, SF_DIR))
    assert "BroadcastExchange" not in p, p


def test_supplier_aqe_broadcasts_at_fixture_scale(spark):
    """Sanity twin: under the DEFAULT threshold the optimizer is still
    free to broadcast the tiny fixture-scale supplier in q5 — dropping
    the hint must not have pessimized the local plan."""
    from wd2duckdb_spark.operators.relational import q_q5_local_supplier_volume
    from wd2duckdb_spark.plans import explain_str

    spark.catalog.clearCache()
    p = explain_str(q_q5_local_supplier_volume(spark, SF_DIR), "simple")
    assert "BroadcastExchange" in p  # nation/region hints at minimum
