"""Degenerate-corpus robustness sweep (the bigram-surprisal bug class,
ADVICE r2): every registered query must survive an EMPTY dataset and a
MINIMAL one-row-per-table dataset without crashing.

The sf fixtures are benign (every doc ≥10 tokens, every table
populated), so fixture-latent crashes — sequence(1,0) auto-stepping
down, element_at(_, 0), .collect()[0] on an empty scalar probe,
divisions by zero-count aggregates — only surface on real corpora.
This sweep runs the whole registry against both pathologies; a query
for which "no data" is genuinely undefined must still fail with a
clear engine error, not an INVALID_INDEX/IndexError from its guts
(none currently do — the sweep pins that)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from wd2duckdb_spark.catalog import TESTDATA_TABLES
from wd2duckdb_spark.registry import all_queries

QUERIES = all_queries()


def _write_sliced(spark, src_dir: str, out_dir: str, n_rows: int) -> None:
    for t in TESTDATA_TABLES:
        (
            spark.read.parquet(f"{src_dir}/{t}.parquet")
            .limit(n_rows)
            .coalesce(1)
            .write.parquet(f"{out_dir}/{t}.parquet")
        )


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty"))
    _write_sliced(spark, SF_DIR, out, 0)
    return out


@pytest.fixture(scope="module")
def onerow_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("onerow"))
    _write_sliced(spark, SF_DIR, out, 1)
    return out


#: Per-table columns that stay non-null in the dirty-data variant:
#: join/grouping keys. Everything else (text, embeddings, measures,
#: timestamps, labels) goes NULL — the shape of a corrupted feed.
_KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


@pytest.fixture(scope="module")
def nulls_dir(spark, tmp_path_factory):
    """Two rows per table with every non-key column NULLed."""
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("nulls"))
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(2)
        cols = [
            F.col(f.name)
            if f.name in _KEEP[t]
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
        df.select(*cols).coalesce(1).write.parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_all_null_payloads(spark, nulls_dir, name):
    df = QUERIES[name](spark, nulls_dir)
    # collect, not count: count() prunes columns and can skip a
    # crashing projection entirely (it hid funnel_stages' x/0)
    assert len(df.collect()) >= 0


@pytest.fixture(scope="module")
def ragged_dir(spark, tmp_path_factory):
    """20 rows per table, one embedding truncated to 3 dims — the
    mixed-dimension feed that crashes codebook training and BLAS
    kernels unless the EMB_DIM schema contract filters it."""
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("ragged"))
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(20)
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") == 5, F.expr("slice(embedding, 1, 3)")
                ).otherwise(F.col("embedding")),
            )
        df.coalesce(1).write.parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_ragged_embedding_dims(spark, ragged_dir, name):
    df = QUERIES[name](spark, ragged_dir)
    # collect, not count: count() prunes columns and can skip a
    # crashing projection entirely (it hid funnel_stages' x/0)
    assert len(df.collect()) >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_corpus(spark, empty_dir, name):
    df = QUERIES[name](spark, empty_dir)
    # collect, not count: count() prunes columns and can skip a
    # crashing projection entirely (it hid funnel_stages' x/0)
    assert len(df.collect()) >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_one_row_corpus(spark, onerow_dir, name):
    df = QUERIES[name](spark, onerow_dir)
    # collect, not count: count() prunes columns and can skip a
    # crashing projection entirely (it hid funnel_stages' x/0)
    assert len(df.collect()) >= 0


def test_histogram_degenerate_bounds_bucket_zero(spark, onerow_dir):
    """Value-level pin for the mn == mx fix: least() SKIPS nulls, so a
    nullif/coalesce formulation put the single distinct price in the
    TOP bucket; the explicit CASE must put it in bucket 0."""
    rows = QUERIES["histogram_equiwidth"](spark, onerow_dir).collect()
    assert [r.bucket for r in rows] == [0]
    assert rows[0].n_orders == 1


# ---------------------------------------------------------------------------
# Degenerate ORACLE parity: both engines must AGREE on pathological
# data, not merely survive it (this gate caught the histogram
# NULL-routing, funnel x/0, map_funcs NULL-vs-0 and dq_report
# empty-sum divergences).
# ---------------------------------------------------------------------------

#: Upstream-Spark divergence, excluded with reasons: CUBE / ROLLUP /
#: GROUPING SETS whose input relation is EMPTY emit 0 rows in Spark,
#: while DuckDB (and PostgreSQL, per the SQL standard) emit the ()
#: grand-total grouping row. Not fixable query-side without grafting
#: a synthetic row onto every grouping-sets plan.
_EMPTY_GROUPING_SETS_DIVERGENCE = {
    "cube_orders",
    "cube_grouping_id",
    "grouping_sets_revenue",
    "rollup_acctbal",
}


def _oracle_con(d):
    import duckdb

    from wd2duckdb_spark.catalog import oracle_view_sql

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(oracle_view_sql(t, f"{d}/{t}.parquet/*.parquet"))
    return con


def _assert_parity(spark, d, name):
    from wd2duckdb_spark.registry import all_oracles

    from tests.test_queries import normalize

    sdf = QUERIES[name](spark, d)
    srows = [tuple(r) for r in sdf.collect()]
    con = _oracle_con(d)
    res = con.execute(all_oracles()[name])
    dcols = [x[0] for x in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols), f"columns differ: {name}"
    assert len(srows) == len(drows), f"rowcount differs: {name}"
    assert normalize(srows, sdf.columns) == normalize(drows, dcols), (
        f"values differ: {name}"
    )


from wd2duckdb_spark.registry import all_oracles as _all_oracles

_ORACLE_NAMES = sorted(
    set(_all_oracles()) - _EMPTY_GROUPING_SETS_DIVERGENCE
)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_parity_on_one_row_corpus(spark, onerow_dir, name):
    _assert_parity(spark, onerow_dir, name)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_parity_on_empty_corpus(spark, empty_dir, name):
    _assert_parity(spark, empty_dir, name)
