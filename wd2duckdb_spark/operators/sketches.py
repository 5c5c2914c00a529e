"""Mergeable-sketch aggregates (Datasketches family, Spark ≥3.5/4.x).

The core 100 TB pattern: compute a small, MERGEABLE summary per
partition/group, union summaries instead of rows, estimate at the end.
A sketch column materialized per day/source can be re-aggregated to any
coarser grouping without touching the raw rows again — the incremental
rollup the reference's single-pass DuckDB build cannot express
(reference computes exact counts in one pass, main.rs ingest loop; this
tier generalizes that to re-aggregatable summaries).

Three sketches, all JVM-side Datasketches implementations:

- **HLL** (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`):
  distinct counting with ~1.6% rel. error at lgK=12, 4 KB per sketch.
- **Theta** (`theta_sketch_agg` / `theta_sketch_estimate`): distinct
  counting that also supports set algebra across sketches.
- **KLL** (`kll_sketch_agg_double` / merge / get_quantile): quantiles
  with provable rank error; the mergeable cousin of
  `approx_percentile`'s GK sketch.

All entries here are *weak* (no DuckDB oracle): sketch estimates are
engine-defined, so correctness is pinned by error-bound tests against
exact answers (tests/test_sketches.py) instead of hash equality.

The two-level shape (per-(source,lang) sketch → union to per-source)
is deliberate: it exercises the merge path — the property that makes
sketches composable across partitions, days, and reruns at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.catalog import tbl

#: lgK for HLL: 2^12 buckets ≈ 1.6% relative standard error, 4 KB.
HLL_LGK = 12


def q_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup over documents: build one sketch per
    (source, lang) leaf group, then UNION-MERGE the binary sketches up
    to per-source — no second scan of the data. At 100 TB the leaf
    sketches are what you persist (a few KB per group); any coarser
    rollup is a cheap sketch-union over them."""
    d = tbl(spark, sf_dir, "documents")
    leaf = d.groupBy("source", "lang").agg(
        F.hll_sketch_agg(F.col("doc_id"), F.lit(HLL_LGK)).alias("sk"),
        F.count("*").alias("n_rows"),
    )
    return (
        leaf.groupBy("source")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias(
                "approx_docs"
            ),
            F.sum("n_rows").alias("n_rows"),
            F.count("*").alias("n_leaf_sketches"),
        )
        .orderBy("source")
    )


def q_theta_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketch of distinct users per event type. Theta sketches
    support set algebra (union/intersect/difference) across groups —
    e.g. 'users who both viewed and purchased' from per-type sketches
    alone, without re-scanning events."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.theta_sketch_estimate(
                F.theta_sketch_agg(F.col("user_id"))
            ).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


def q_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles of the event value per event type via KLL
    sketches: leaf sketches per (event_type, user bucket) are merged to
    per-type, then queried at p50/p95/p99. The merge tier is what
    `approx_percentile` lacks: KLL sketches persisted per partition can
    be re-merged across days/reruns with bounded rank error."""
    # NULL values never enter a sketch, and a group with ZERO sketched
    # values yields an EMPTY KLL buffer whose get_quantile RAISES —
    # filter first so degenerate/dirty feeds produce no row instead of
    # killing the query
    e = tbl(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    leaf = e.withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(8))
    ).groupBy("event_type", "bucket").agg(
        F.kll_sketch_agg_double(F.col("value")).alias("sk")
    )
    # kll_sketch_merge_double is a binary scalar (no merge-aggregate
    # exists); fold the per-group sketch list — 8 × ~KB binaries per
    # group, constant-size regardless of row count, so collect_list
    # here is scale-safe.
    merged = leaf.groupBy("event_type").agg(
        F.collect_list("sk").alias("sks")
    ).select(
        "event_type",
        F.expr(
            "reduce(slice(sks, 2, size(sks) - 1), sks[0], "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("sk"),
    )
    return merged.select(
        "event_type",
        F.round(
            F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)), 4
        ).alias("p50"),
        F.round(
            F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)), 4
        ).alias("p95"),
        F.round(
            F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.99)), 4
        ).alias("p99"),
    ).orderBy("event_type")


# No ORACLES: every estimate is engine-defined (Datasketches), so the
# driver records the weaker rows-only check; the REAL correctness pin
# is tests/test_sketches.py's error bounds against exact answers.
ORACLES: dict[str, str] = {}

QUERIES = {
    "hll_distinct_rollup": q_hll_distinct_rollup,
    "theta_distinct_users": q_theta_distinct_users,
    "kll_value_quantiles": q_kll_value_quantiles,
}
