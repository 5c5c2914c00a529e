"""The switch-over guarantee: the SAME SQL text a wd2duckdb user runs
on their DuckDB file returns the same rows on this engine's views.

Each statement below is executed verbatim by BOTH spark.sql() over
register_views() and DuckDB over export_duckdb()'s output — the
product's promised query surface (README.md:9-10) end to end.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import FIXTURE_DUMP

#: SQL that runs unmodified on both engines (ANSI subset: joins,
#: aggregation, predicates, ordering over the 6-table schema).
PARITY_SQL = {
    "labels_of_instances": """
        SELECT v.label
        FROM edge e JOIN vertex v ON e.src_id = v.id
        WHERE e.property_id = 1000000031
        ORDER BY v.label
    """,
    "claims_per_property": """
        SELECT property_id, count(*) AS n
        FROM edge
        GROUP BY property_id
        ORDER BY n DESC, property_id
    """,
    "quantity_range": """
        SELECT src_id, amount
        FROM quantity
        WHERE amount > 100
        ORDER BY src_id, amount
    """,
    "string_claims_with_labels": """
        SELECT v.label, s.string
        FROM string s JOIN vertex v ON s.src_id = v.id
        ORDER BY s.string
    """,
    "vertex_coverage": """
        SELECT count(*) AS n_vertices,
               sum(CASE WHEN label IS NULL THEN 1 ELSE 0 END) AS unlabeled
        FROM vertex
    """,
}


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    from wd2duckdb_spark.ingest import ingest
    from wd2duckdb_spark.sources.duckdb_io import export_duckdb
    from wd2duckdb_spark.views import register_views

    root = tmp_path_factory.mktemp("parity")
    out = str(root / "kg")
    ingest(spark, FIXTURE_DUMP, out)
    register_views(spark, out)
    db = str(root / "kg.duckdb")
    export_duckdb(out, db)
    con = duckdb.connect(db, read_only=True)
    yield spark, con
    con.close()


@pytest.mark.parametrize("name", sorted(PARITY_SQL))
def test_same_sql_same_rows(engines, name):
    spark, con = engines
    sql = PARITY_SQL[name]
    def key(row):
        return tuple((v is None, v) for v in row)

    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=key)
    want = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=key)
    assert got, f"{name} matched no rows — vacuous parity check"
    assert got == want, f"engines disagree on {name}"
