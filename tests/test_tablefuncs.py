"""Python UDTF escape hatch: correct fan-out, agrees with Python truth."""

from __future__ import annotations

from tests.conftest import SF_DIR
from wd2duckdb_spark.catalog import tbl
from wd2duckdb_spark.functions.tablefuncs import register_tablefuncs


def test_chunk_tokens_lateral(spark):
    """UDTF joined LATERAL per document row: every chunk matches a
    reference Python implementation, including the kept tail."""
    register_tablefuncs(spark)
    docs = tbl(spark, SF_DIR, "documents").limit(20)
    docs.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk
        FROM _udtf_docs d, LATERAL chunk_tokens(d.text, 5, 2) c
        """
    ).collect()

    def expect(text, size=5, overlap=2):
        toks = text.split()
        step = size - overlap
        out = []
        for i, s in enumerate(range(0, max(len(toks) - overlap, 1), step)):
            w = toks[s : s + size]
            out.append((i, len(w), " ".join(w)))
        return out

    want = {
        (r["doc_id"], i, n, c)
        for r in docs.select("doc_id", "text").collect()
        for (i, n, c) in expect(r["text"])
    }
    assert {tuple(r) for r in got} == want
    # tails kept: at least one chunk shorter than the window size
    assert any(r["n_tokens"] < 5 for r in got)
