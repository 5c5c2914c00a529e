"""Edge-case regressions for functions/text.py (round-3 ADVICE).

The sf fixtures have a 10-token minimum, so corpus pathologies —
single-token and empty documents — never exercise the bigram builder
there. Real corpora have them, and ``sequence(1, size(w) - 1)``
auto-steps DOWN to ``[1, 0]`` when ``size(w) == 1``, making
``element_at(w, 0)`` throw INVALID_INDEX_OF_ZERO and killing the whole
query. These tests run the query over a tiny adversarial corpus and
pin full oracle parity on it.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.test_queries import normalize


@pytest.fixture(scope="module")
def tiny_corpus_dir(spark, tmp_path_factory):
    """documents.parquet containing one-word, empty, whitespace-only
    and normal documents."""
    out = str(tmp_path_factory.mktemp("edge"))
    rows = [
        (1, "hello", "en", "web", 5),
        (2, "", "en", "web", 0),
        (3, "   ", "en", "books", 3),
        (4, "a b c a b", "en", "books", 9),
        (5, "x y x y z", "en", "web", 9),
        (6, "one", "en", "books", 3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_bigram_surprisal_survives_single_token_docs(spark, tiny_corpus_dir):
    from wd2duckdb_spark.functions.text import ORACLES, q_bigram_surprisal

    sdf = q_bigram_surprisal(spark, tiny_corpus_dir)
    srows = [tuple(r) for r in sdf.collect()]  # must not raise

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tiny_corpus_dir}/documents.parquet/*.parquet'"
    )
    res = con.execute(ORACLES["bigram_surprisal"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(sdf.columns) == sorted(dcols)
    assert normalize(srows, sdf.columns) == normalize(drows, dcols)
    # the single-token / empty docs contribute no bigrams on either
    # side: every doc counted below comes from docs 4 and 5 only
    n_docs = {r["source"]: r["n_docs"] for r in sdf.collect()}
    assert n_docs == {"books": 1, "web": 1}
