"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (row count + column names +
order-insensitive value hash) so regressions surface in CI before the
driver runs the real thing at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR
from wd2duckdb_spark.catalog import TESTDATA_TABLES
from wd2duckdb_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con():
    from wd2duckdb_spark.catalog import oracle_view_sql

    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(oracle_view_sql(t, f"{SF_DIR}/{t}.parquet"))
    return c


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            vals.append(f"{v:.10g}" if isinstance(v, float) else str(v))
        out.append(tuple(vals))
    return sorted(out)


def compare_to_oracle(sdf, con, sql: str, name: str) -> None:
    """THE oracle-compare contract (columns + rowcount + normalized
    values) — shared by the sf0.001 gate here and the degenerate
    parity gate (test_degenerate_corpus.py) so the two cannot drift."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"columns differ for {name}"
    assert len(srows) == len(drows), f"rowcount differs for {name}"
    assert normalize(srows, scols) == normalize(drows, dcols), (
        f"values differ for {name}"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        assert len(sdf.collect()) >= 0  # rows-only (driver's weak mode)
        return
    compare_to_oracle(sdf, con, ORACLES[name], name)


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() >= 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_approx_distinct_error_bound(spark):
    """The weak entry's promised quality: HLL++ estimate within the
    configured 2% relative standard deviation (allow 3 sigma) of the
    exact count, per market segment."""
    df = QUERIES["approx_distinct"](spark, SF_DIR)
    for r in df.collect():
        rel = abs(r["approx_customers"] - r["exact_customers"]) / max(
            r["exact_customers"], 1
        )
        assert rel <= 0.06, f"{r['c_mktsegment']}: {rel:.3f} off exact"


def test_approx_quantiles_error_bound(spark):
    """GK sketch at accuracy 10000 ⇒ rank error ≤ 1/10000; on fixture
    group sizes that means the approx percentile must land within a
    few neighbors of the exact one — bound the value gap at 1%."""
    df = QUERIES["approx_quantiles"](spark, SF_DIR)
    for r in df.collect():
        for a, e in (
            (r["approx_p50"], r["exact_p50"]),
            (r["approx_p95"], r["exact_p95"]),
        ):
            assert abs(a - e) / abs(e) <= 0.01, (
                f"{r['l_returnflag']}: approx {a} vs exact {e}"
            )


def test_catalog_normalizes_temporal_drift(spark, tmp_path):
    """The driver regenerates testdata between rounds and has already
    shipped events.ts in two physical types; the catalog must present
    ONE stable type (TIMESTAMP) for every declared temporal column no
    matter which layout arrives. Simulates a DATE-typed regeneration."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import TimestampType

    from wd2duckdb_spark.catalog import _TS_COLUMNS, tbl

    mimic = tmp_path / "sfmimic"
    mimic.mkdir()
    o = tbl(spark, SF_DIR, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date")
    )
    o.write.parquet(str(mimic / "orders.parquet"))
    got = tbl(spark, str(mimic), "orders")
    assert isinstance(got.schema["o_orderdate"].dataType, TimestampType)
    assert got.count() == o.count()

    # and the real layouts, whatever they currently are, all normalize
    for name, cols in _TS_COLUMNS.items():
        df = tbl(spark, SF_DIR, name)
        for c in cols:
            assert isinstance(df.schema[c].dataType, TimestampType), (name, c)

    # the ORACLE side must normalize identically (ADVICE r1): under the
    # same DATE-typed drift, the DuckDB view layer presents TIMESTAMP,
    # so str()-hashed values keep the 'YYYY-MM-DD HH:MM:SS' shape both
    # engines agree on.
    from wd2duckdb_spark.catalog import oracle_view_sql

    c2 = duckdb.connect()
    c2.execute(oracle_view_sql("orders", f"{mimic}/orders.parquet/*.parquet"))
    (typ,) = c2.execute(
        "SELECT data_type FROM duckdb_columns() WHERE table_name='orders'"
        " AND column_name='o_orderdate'"
    ).fetchone()
    assert typ == "TIMESTAMP"
    spark_val = str(got.orderBy("o_orderkey").first()["o_orderdate"])
    duck_val = str(
        c2.execute(
            "SELECT o_orderdate FROM orders ORDER BY o_orderkey LIMIT 1"
        ).fetchone()[0]
    )
    assert spark_val == duck_val
    c2.close()
