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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_corpus(spark, empty_dir, name):
    df = QUERIES[name](spark, empty_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_one_row_corpus(spark, onerow_dir, name):
    df = QUERIES[name](spark, onerow_dir)
    assert df.count() >= 0
