"""Python UDTF demonstration: the table-function escape hatch.

The engine's rule (COVERAGE §2.3, pinned by test_plans) is that NO
core path uses Python row code — everything the reference delegates to
DuckDB SQL compiles to JVM expressions. Spark 4 adds Python UDTFs
(one input row → N output rows with a declared schema); this module
demonstrates that seam for the operators that genuinely need
imperative fan-out, with the same token-window chunking semantics the
native `chunk_dedup` query expresses declaratively — so the two are
directly comparable (tests/test_tablefuncs.py asserts they agree).

Scale note: a UDTF runs row-at-a-time in a Python worker — use it
only when the fan-out logic can't be said with sequence()+explode()
or transform(); those stay in whole-stage codegen and are ~10-100×
faster. This is the documented slow path, not a hot path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, n_tokens int, chunk string")
class ChunkTokens:
    """Overlapping token-window chunker: (text, size, overlap) →
    one row per window. Windows advance by ``size - overlap`` tokens;
    the final partial window is kept (training-data chunking keeps
    tails — dropping them biases against short documents)."""

    def eval(self, text: str, size: int, overlap: int):
        if text is None:
            return
        toks = text.split()
        step = max(1, size - overlap)
        for i, start in enumerate(range(0, max(len(toks) - overlap, 1), step)):
            window = toks[start : start + size]
            yield i, len(window), " ".join(window)


def register_tablefuncs(spark: SparkSession) -> None:
    """Register the demo UDTF for SQL use:
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_tokens(d.text, 64, 8) c``.
    """
    spark.udtf.register("chunk_tokens", ChunkTokens)
