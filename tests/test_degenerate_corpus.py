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
    from wd2duckdb_spark.catalog import tbl

    # slice via tbl(), not a raw read: tbl normalizes the events ts
    # column to TIMESTAMP whatever the parquet layout (the driver has
    # shipped nanos-as-long variants), so the rewritten degenerate
    # parquet stays castable by the DuckDB oracle views
    for t in TESTDATA_TABLES:
        (
            tbl(spark, src_dir, t)
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

from wd2duckdb_spark.registry import all_oracles

ORACLES = all_oracles()

#: Upstream-Spark divergence: CUBE / ROLLUP / GROUPING SETS whose
#: input relation is EMPTY emit 0 rows in Spark, while DuckDB (and
#: PostgreSQL, per the SQL standard) emit the () grand-total grouping
#: row. Not fixable query-side without grafting a synthetic row onto
#: every grouping-sets plan. rollup_acctbal is additionally excluded
#: on the ONE-ROW corpus: its filtered input is empty there, hitting
#: the same divergence; the other three see the single row and agree.
_EXCLUDE = {
    "empty": {
        "cube_orders",
        "cube_grouping_id",
        "grouping_sets_revenue",
        "rollup_acctbal",
    },
    "onerow": {"rollup_acctbal"},
}


def _oracle_con(d):
    import duckdb

    from wd2duckdb_spark.catalog import oracle_view_sql

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(oracle_view_sql(t, f"{d}/{t}.parquet/*.parquet"))
    return con


@pytest.fixture(scope="module")
def onerow_con(onerow_dir):
    con = _oracle_con(onerow_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = _oracle_con(empty_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def nulls_con(nulls_dir):
    con = _oracle_con(nulls_dir)
    yield con
    con.close()


def _parity(spark, d, con, name):
    from tests.test_queries import compare_to_oracle

    compare_to_oracle(QUERIES[name](spark, d), con, ORACLES[name], name)


@pytest.mark.parametrize(
    "name", sorted(set(ORACLES) - _EXCLUDE["onerow"])
)
def test_oracle_parity_on_one_row_corpus(spark, onerow_dir, onerow_con, name):
    _parity(spark, onerow_dir, onerow_con, name)


@pytest.mark.parametrize(
    "name", sorted(set(ORACLES) - _EXCLUDE["empty"])
)
def test_oracle_parity_on_empty_corpus(spark, empty_dir, empty_con, name):
    _parity(spark, empty_dir, empty_con, name)


def test_oracle_parity_map_funcs_null_event_types(
    spark, nulls_dir, nulls_con
):
    """Pins the NULL-event_type contract on the only fixture that HAS
    null event types: both engines must drop them identically (Spark
    filters before map_from_entries — NULL map keys raise — and the
    oracle's WHERE mirrors it)."""
    _parity(spark, nulls_dir, nulls_con, "map_funcs")


@pytest.fixture(scope="module")
def ragged_con(ragged_dir):
    con = _oracle_con(ragged_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_on_ragged_corpus(spark, ragged_dir, ragged_con, name):
    """NO exclusions: under the symmetric EMB_DIM quarantine (engine
    filters + verbatim oracle WHERE mirrors) both engines agree on the
    mixed-dimension feed for every oracle-backed query — DuckDB's
    list_cosine_similarity would otherwise ERROR outright on ragged
    pairs."""
    _parity(spark, ragged_dir, ragged_con, name)


# ---------------------------------------------------------------------------
# Ragged QUERY vector (ADVICE r3): vec_id 0 is the ANN probe vector
# AND a PQ codebook seed — truncating IT exercises the oracle q-CTE
# quarantine + empty-result gates, which the vec_id-5 fixture misses.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ragged0_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("ragged0"))
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(20)
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") == 0, F.expr("slice(embedding, 1, 3)")
                ).otherwise(F.col("embedding")),
            )
        df.coalesce(1).write.parquet(f"{out}/{t}.parquet")
    return out


@pytest.fixture(scope="module")
def ragged0_con(ragged0_dir):
    con = _oracle_con(ragged0_dir)
    yield con
    con.close()


_EMBEDDING_ORACLES = sorted(
    n for n, sql in ORACLES.items() if "embeddings" in sql.lower()
)


@pytest.mark.parametrize("name", _EMBEDDING_ORACLES)
def test_oracle_parity_on_ragged_query_vector(
    spark, ragged0_dir, ragged0_con, name
):
    """Every embedding-reading oracle must agree with the engine when
    the PROBE vector itself is dirty: the engine short-circuits to an
    empty result (query_vector returns []), so each oracle's q CTE
    carries the same EMB_DIM quarantine plus a non-empty gate —
    without them DuckDB would emit NULL-cosine rows (or error on the
    dimension mismatch) while Spark returns nothing."""
    _parity(spark, ragged0_dir, ragged0_con, name)
