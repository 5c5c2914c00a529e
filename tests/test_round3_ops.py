"""Round-3 hardening tests: large-star/small-star connected components
(VERDICT r2 item 5 — adversarial chain-shaped dup clusters)."""

from __future__ import annotations

import random

import pytest


def _union_find_labels(n_edges):
    """Ground truth: python union-find, label = component min."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.slow
def test_star_cc_converges_logarithmically_on_10k_path(spark):
    """A 10k-node path graph has diameter 10k: min-label propagation
    would need ~10k rounds, the star alternation tens (O(log n)).
    max_iters=40 IS the assertion — the function raises if exceeded."""
    from wd2duckdb_spark.functions.dedup import connected_components

    n = 10_000
    pairs = spark.range(n - 1).selectExpr(
        "id AS a_id", "id + 1 AS b_id"
    )
    labels = connected_components(pairs, max_iters=40, algorithm="star")
    got = labels.selectExpr(
        "count(*) AS n", "count(distinct cluster_id) AS c", "min(cluster_id) AS m"
    ).collect()[0]
    assert (got.n, got.c, got.m) == (n, 1, 0)


def test_star_cc_matches_union_find_on_random_graph(spark):
    from wd2duckdb_spark.functions.dedup import connected_components

    rng = random.Random(7)
    edges = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(220)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find_labels(edges)

    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(
            pairs, max_iters=40, algorithm="star"
        ).collect()
    }
    assert got == expected


def test_star_cc_agrees_with_propagation(spark):
    """Both algorithms behind the one API must produce identical
    labelings (clustered star shapes — the LSH regime)."""
    from wd2duckdb_spark.functions.dedup import connected_components

    edges = (
        [(0, i) for i in range(1, 6)]
        + [(10, 11), (11, 12), (12, 10)]
        + [(20, 21)]
    )
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    star = {
        r.node: r.cluster_id
        for r in connected_components(pairs, algorithm="star").collect()
    }
    prop = {
        r.node: r.cluster_id
        for r in connected_components(
            pairs, algorithm="propagation"
        ).collect()
    }
    assert star == prop


def test_cc_unknown_algorithm_raises(spark):
    from wd2duckdb_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(pairs, algorithm="bogus")


def test_iterative_checkpoint_interval_is_result_invariant(spark):
    """VERDICT r2 item 8: the failure-recovery checkpoint knob on the
    iterative graph queries must not change results — only the replay
    bound. interval=2 (mid-chain eager localCheckpoints) must equal
    the default single-DAG formulation row-for-row."""
    from tests.conftest import SF_DIR
    from wd2duckdb_spark.operators.graph import (
        q_pagerank_topk,
        q_shortest_path_bounded,
    )

    pr0 = q_pagerank_topk(spark, SF_DIR).collect()
    pr2 = q_pagerank_topk(spark, SF_DIR, checkpoint_interval=2).collect()
    assert pr0 == pr2

    sp0 = q_shortest_path_bounded(spark, SF_DIR).collect()
    sp2 = q_shortest_path_bounded(
        spark, SF_DIR, checkpoint_interval=2
    ).collect()
    assert sp0 == sp2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_star_cc_property_matches_union_find(spark, edges):
    """Property: for ANY pair list (self-loops, duplicates, parallel
    edges included), the star labeling equals python union-find with
    min-label canonicalization. Self-loop-only nodes are their own
    singleton cluster (matching the propagation variant's contract)."""
    from wd2duckdb_spark.functions.dedup import connected_components

    expected = _union_find_labels([(a, b) for a, b in edges if a != b])
    # nodes appearing ONLY in self-loops still appear in the output
    for a, b in edges:
        if a == b:
            expected.setdefault(a, a)

    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(
            pairs, max_iters=40, algorithm="star"
        ).collect()
    }
    assert got == expected


def test_neardup_keep_best_keeps_longest_with_id_tiebreak(spark, tmp_path, monkeypatch):
    """Round-5 keep-best rule on a handcrafted corpus: within a
    near-dup cluster the doc with the MOST whitespace tokens is kept
    (doc_id breaks ties), singletons always keep; exactly one keeper
    per cluster. Uses a synthetic sf_dir so cluster shapes are known."""
    import wd2duckdb_spark.catalog as catalog
    from wd2duckdb_spark.functions.dedup import (
        q_dedup_cluster_stats,
        q_neardup_keep_best,
    )

    catalog.clear_memos()  # fresh CC memo for the synthetic dir
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # cluster {1,2,3}: near-dups of base; doc 2 is LONGEST
        (1, base, "en", "w", len(base)),
        (2, base + " lambda mu nu xi omicron", "en", "w", 80),
        (3, base.replace("kappa", "pi"), "en", "w", len(base)),
        # singleton
        (4, "totally unrelated content about distributed engines", "en", "w", 50),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, schema).write.parquet(f"{sf_dir}/documents.parquet")

    res = {r.doc_id: r for r in q_neardup_keep_best(spark, sf_dir).collect()}
    assert len(res) == 4
    cluster = {res[i].cluster_id for i in (1, 2, 3)}
    assert len(cluster) == 1, "docs 1-3 must share one cluster"
    assert res[4].keep and res[4].cluster_id == 4
    keepers = [i for i in (1, 2, 3) if res[i].keep]
    assert keepers == [2], keepers  # longest wins, not min-id

    stats = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in q_dedup_cluster_stats(spark, sf_dir).collect()
    }
    assert stats == {1: (1, 1), 3: (1, 3)}
    catalog.clear_memos()  # don't leak the synthetic dir's CC memo


def test_dedup_stage_attrition_consistent_with_component_queries(spark):
    """Round 6: the attrition funnel must reconcile with the queries
    it composes — an independent cross-check on top of its oracle:
    sum(n_exact_kept) == number of distinct content keys (the row
    count of dedup_exact), monotonicity n_neardup ≤ n_exact ≤ n_docs
    per source, and sum(n_docs) == corpus size."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_DIR
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.functions.dedup import (
        q_dedup_exact,
        q_dedup_stage_attrition,
    )

    rows = q_dedup_stage_attrition(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_neardup_kept <= r.n_exact_kept <= r.n_docs
    assert sum(r.n_docs for r in rows) == tbl(
        spark, SF_DIR, "documents"
    ).count()
    assert sum(r.n_exact_kept for r in rows) == q_dedup_exact(
        spark, SF_DIR
    ).count()
