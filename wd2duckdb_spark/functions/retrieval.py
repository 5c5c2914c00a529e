"""Hybrid lexical + semantic retrieval: Reciprocal Rank Fusion.

The two retrieval tiers already in the engine — explode-free BM25
(functions/text.py) and exact/ANN cosine search
(functions/similarity.py) — are fused the way production search
stacks do it: Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR
2009), ``RRF(d) = Σ_lists 1/(K + rank_list(d))`` with the standard
K=60. RRF needs only RANKS, not comparable scores, which is exactly
why it is the default fusion for heterogeneous scorers (BM25 scores
and cosines live on unrelated scales).

Scale shape: fusion consumes only the top-``RRF_DEPTH`` of each list
(1/(K+r) decays hyperbolically, so depth beyond ~100 cannot change a
top-10), and each list is produced by that tier's own scale path
(TakeOrderedAndProject per-partition heaps for BM25; the IVF/LSH
bucket pruning for the vector side at corpus scale). The fusion
itself — a full-outer join of two ≤RRF_DEPTH-row frames — is
driver-trivial at ANY corpus size; the single-partition rank windows
run on those bounded frames only, never on the corpus.

Doc↔vector linkage: the fixtures carry no explicit mapping, so the
derivable rule ``vec_id = doc_id`` is used on both engines (documented
here, mirrored in the oracle). Docs appearing in only one list get
only that list's RRF term — standard RRF-over-union semantics.

Determinism: both input rankings are already engine-deterministic
(floor4 BM25 scores / round6 cosines, doc_id tie-breaks); the RRF sum
adds the two reciprocal terms in fixed (lex, sem) order and floor6-
snaps, and the final top-k tie-breaks by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wd2duckdb_spark.catalog import tbl

#: RRF smoothing constant (the value from the original RRF paper and
#: the default in Elasticsearch/OpenSearch/Vespa hybrid search).
RRF_K = 60
#: Fusion depth: how deep each ranking contributes. 1/(60+100) per
#: missed doc bounds the error of truncating deeper.
RRF_DEPTH = 100
HYBRID_TOPK = 10


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    k: int = RRF_K,
    topk: int = HYBRID_TOPK,
) -> DataFrame:
    """Fuse two (doc_id, <rank>) frames — ``lex_rank`` / ``sem_rank``
    columns — into the RRF top-``topk``. Inputs must already be
    depth-bounded (the caller's TakeOrdered); the join is tiny."""
    f6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    fused = lex.join(sem, "doc_id", "full_outer")
    rrf = f6(
        F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("sem_rank")), F.lit(0.0))
    )
    return (
        fused.select(
            "doc_id",
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("sem_rank").cast("long").alias("sem_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(topk)
    )


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for the fixed BM25 query-term set + the
    vec_id=0 probe: top-10 docs by RRF over the two top-100 rankings.

    Plan: BM25's two corpus scans end in TakeOrderedAndProject(100);
    the cosine tier's scan ends the same; each 100-row frame gets its
    rank via a single-partition window (bounded input — the
    "no-partition window" warning does not apply at depth 100), and
    the fusion is a full-outer join of two 100-row frames. No corpus
    row ever shuffles.
    """
    from wd2duckdb_spark.functions.similarity import cosine_scored
    from wd2duckdb_spark.functions.text import BM25_TERMS, bm25_scored

    lex100 = (
        bm25_scored(tbl(spark, sf_dir, "documents"), BM25_TERMS)
        .orderBy(F.desc("score"), "doc_id")
        .limit(RRF_DEPTH)
    )
    lex = lex100.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("lex_rank"),
    )
    sem100 = (
        cosine_scored(spark, sf_dir, 0)
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(RRF_DEPTH)
    )
    sem = sem100.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), "vec_id"))
        .alias("sem_rank"),
    )
    return rrf_fuse(lex, sem)


def _hybrid_oracle() -> str:
    """Composes the BM25 SQL template and the brute-force cosine
    oracle VERBATIM at fusion depth — the ann_recall_eval discipline:
    the fusion's ground truth is definitionally the two component
    rankings, so embedding their SQL means the three queries cannot
    drift."""
    from wd2duckdb_spark.functions.similarity import _ann_bf_sql
    from wd2duckdb_spark.functions.text import (
        BM25_TERMS,
        _bm25_sql_base,
        _bm25_sql_scored,
    )

    return f"""
    WITH {_bm25_sql_base(BM25_TERMS)}, {_bm25_sql_scored(BM25_TERMS)},
    lex AS (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY floor((0.0 + raw) * 1e4 + 0.5) / 1e4 DESC, doc_id
               ) AS lex_rank
        FROM scored
        QUALIFY lex_rank <= {RRF_DEPTH}
    ),
    sem AS (
        SELECT vec_id AS doc_id,
               row_number() OVER (ORDER BY cosine DESC, vec_id) AS sem_rank
        FROM ({_ann_bf_sql(RRF_DEPTH)})
    )
    SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(sem_rank AS BIGINT) AS sem_rank,
           floor((coalesce(1.0 / ({RRF_K} + lex_rank), 0.0)
                  + coalesce(1.0 / ({RRF_K} + sem_rank), 0.0))
                 * 1e6 + 0.5) / 1e6 AS rrf
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT {HYBRID_TOPK}
"""


ORACLES: dict[str, str] = {"hybrid_rrf_topk": _hybrid_oracle()}

QUERIES = {"hybrid_rrf_topk": q_hybrid_rrf_topk}
