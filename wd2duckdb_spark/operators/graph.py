"""Graph-shaped query patterns (SURVEY §2.2): neighbor expansion,
k-hop traversal, as-of lookup.

The reference's schema is built for exactly these: `edge(src_id,
property_id, dst_id)` with endpoint indices (value.rs:332-350). On the
driver's testdata the same patterns run over the order graph
(customer —orders→ order —lineitem→ supplier).

Scale: traversals are equi-joins on the hop key; Catalyst picks
broadcast for dim-sized sides and AQE splits skewed hub keys
(the P31/Q5 problem, SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.catalog import tbl


def q_graph_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighbor expansion: customer → orders → lineitem →
    distinct supplier set size per customer.

    The customer⋈orders side carries a shuffle-hash hint for its join
    against lineitem: without it Catalyst broadcasts the projected
    FACT table (2 columns of lineitem squeeze under the threshold) —
    building a 600k-row hashed relation that costs more than the
    shuffle it avoids (measured 1.35s → 0.94s at sf0.1), and at 100 TB
    broadcasting the fact side is exactly backwards. Build side =
    customer+orders, the smaller per-partition side, so the hash fits
    executor memory at any scale."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    co = c.join(o, c.c_custkey == o.o_custkey).hint("shuffle_hash")
    return (
        co.join(l, co.o_orderkey == l.l_orderkey)
        .groupBy("c_custkey")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .orderBy("c_custkey")
    )


def q_graph_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-pattern matching: (customer, supplier) pairs in the same
    nation connected through an order — the triple-pattern self-join
    shape of `edge ⋈ edge` (SURVEY §2.2 traversal row)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    # shuffle-hash hint: same broadcast-the-pruned-fact trap as
    # q_graph_2hop — without it Catalyst broadcasts lineitem's
    # 2-column projection (see that docstring for the measurement)
    co = c.join(o, c.c_custkey == o.o_custkey).hint("shuffle_hash")
    return (
        co.join(l, co.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .select("c_custkey", "s_suppkey")
        .distinct()
        .orderBy("c_custkey", "s_suppkey")
    )


def q_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup: for each user, the latest event at-or-before a
    cutoff, plus its value (max_by = DuckDB arg_max).

    Spark realization: filter + groupBy max/max_by — the distributed
    as-of pattern (sort-merge per key); no per-row subquery.
    """
    e = tbl(spark, sf_dir, "events").filter(F.col("ts") <= "2024-01-15 00:00:00")
    return (
        e.groupBy("user_id")
        .agg(
            F.max("ts").alias("asof_ts"),
            F.expr("max_by(value, struct(ts, event_id))").alias("asof_value"),
        )
        .select(
            "user_id", "asof_ts", F.round("asof_value", 2).alias("asof_value")
        )
        .orderBy("user_id")
    )


def k_hop(
    edge: DataFrame,
    start: DataFrame,
    k: int,
    property_id: int | None = None,
) -> DataFrame:
    """Distinct vertices reachable in exactly ``k`` hops from ``start``
    (a DataFrame with an ``id`` column) — the iterative-join traversal
    over ``edge(src_id, property_id, dst_id)`` that the reference's
    endpoint indices exist to serve (value.rs:332-350; SURVEY §2.2).

    Each hop is one equi-join on the frontier + distinct. Scale:

    - the frontier is persisted per hop — without it, hop N recomputes
      the whole lineage N times and the plan grows exponentially;
    - the join key is ``src_id``, so a bucketed edge table (layout.py)
      makes every hop a shuffle of the FRONTIER only (edge side stays
      in place) — at 100 TB the frontier is the small side and
      Catalyst broadcasts it per hop;
    - hub-key skew (P31/Q5) is handled by AQE skew-join; pathological
      frontiers can use operators.skew.salted_join per hop.

    The returned frontier is persisted and already materialized —
    callers reuse it without recompute and should ``.unpersist()`` it
    when done (intermediate frontiers are unpersisted here; unreleased
    ones are eventually reclaimed by the ContextCleaner on GC).
    """
    if property_id is not None:
        edge = edge.filter(F.col("property_id") == property_id)
    edge = edge.select("src_id", "dst_id")
    frontier = start.select(F.col("id").cast("long").alias("id")).distinct()
    for _ in range(k):
        nxt = (
            frontier.join(edge, frontier["id"] == edge["src_id"])
            .select(F.col("dst_id").alias("id"))
            .distinct()
            .persist()
        )
        nxt.count()  # materialize before unpersisting the parent
        frontier.unpersist()
        frontier = nxt
    return frontier


ORACLES: dict[str, str] = {
    "graph_2hop": """
        SELECT c_custkey, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
        FROM customer
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    "graph_triangle": """
        SELECT DISTINCT c_custkey, s_suppkey
        FROM customer
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE c_nationkey = s_nationkey
        ORDER BY c_custkey, s_suppkey
    """,
    "asof_latest_event": """
        SELECT user_id, asof_ts, asof_value FROM (
            SELECT user_id, ts AS asof_ts, round(value, 2) AS asof_value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        ) WHERE rn = 1
        ORDER BY user_id
    """,
}

QUERIES = {
    "graph_2hop": q_graph_2hop,
    "graph_triangle": q_graph_triangle,
    "asof_latest_event": q_asof_latest_event,
}
