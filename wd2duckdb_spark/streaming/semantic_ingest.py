"""SEMANTIC dedup AT INGEST: a streaming stage that drops incoming
vectors (documents-by-embedding) cosine-near-duplicating anything
EVER ingested — the vector tier's face of the dedup-at-ingest family
(MinHash: streaming/dedup_ingest.py; SimHash: streaming/simhash_sig.py),
and the streaming twin of the batch ``semantic_dedup`` query
(SemDeDup, Abbas et al. 2023, arXiv:2303.09540).

Keep rule — the batch tier's convention made ONLINE: a vector is a
DUP iff some EARLIER vector in the SAME CELL has
``round(cosine, 4) ≥ threshold``, where "earlier" means any already-
indexed vector (previous batches) or a smaller vec_id inside the
current batch. ALL vectors index (kept AND dropped — same rationale
as the MinHash tier: a later vector near a DROPPED one still
near-duplicates previously seen content and must drop, so keep
decisions do not depend on where micro-batch boundaries fell). When
arrival order is vec_id order, this reproduces the batch rule
``∃ u < v in cell : cos(u, v) ≥ t`` — EXACTLY ``semantic_dedup``'s
dup predicate — so stream and batch cannot drift: parity with the
registered oracle-backed query is pinned across micro-batch layouts
in tests/test_ann_dedup_ingest.py, with the index bootstrapped from
``trained_centroids()`` under the ``assign="l2"`` Lloyd rule
(:func:`wd2duckdb_spark.functions.ann_index.l2_assign_col` — floor-6
squared-L2 argmin, bit-identical to the batch clustering).

Scale: the history probe joins the micro-batch (broadcast — bounded
at one batch of vectors) against ONLY the index cells the batch
touches (``cell IN (…)`` over the Hive cell layout = directory-level
pruning; cells-per-batch ≤ n_cells, a bounded driver-side list).
Per-cell candidate volume is the SemDeDup bound: cluster-bounded,
never corpus-quadratic. In-batch pairs are batch² per cell at worst —
rate-limit the source like the MinHash tier. Writes are the standard
replay-idempotent ``batch=<id>`` overwrites (index, kept corpus, and
the ``_metrics`` accounting sidecar), so a crashed-and-replayed
micro-batch rewrites its own output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.functions.ann_index import (
    _assigned_rows,
    _index_centroids,
)
from wd2duckdb_spark.functions.similarity import SEMDEDUP_THR


def _has_any_assignments(spark: SparkSession, index_dir: str) -> bool:
    """Committed-data check for the assignments tree — the dedup
    tier's crash-dropping discipline (``batch=0/_temporary`` without
    a committed file must read as "no history yet"), but DEPTH-
    UNBOUNDED: this index nests ``batch=<id>/cell=<c>/`` two levels
    deep, where dedup_ingest's one-level helper would see only
    directories and report an existing index as absent (the bug the
    first parity run caught: batch 1 silently skipped the history
    probe and every cross-batch duplicate survived)."""
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/assignments")
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return False
    stack = [root]
    while stack:
        p = stack.pop()
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isFile():
                return True
            stack.append(st.getPath())
    return False


def _batch_vec_dedup(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    threshold: float,
    assign: str,
) -> None:
    from wd2duckdb_spark.functions.dedup import _cosine_fold_sql

    spark = batch_df.sparkSession
    cents = _index_centroids(spark, index_dir)
    history_exists = _has_any_assignments(spark, index_dir)

    batch_df = batch_df.persist()
    assigned = None
    try:
        assigned = _assigned_rows(batch_df, cents, None, assign).persist()

        thr = F.lit(round(float(threshold), 4))
        sim = F.round(F.expr(_cosine_fold_sql("vb", "vh")), 4)
        b = assigned.select(
            "cell", F.col("vec_id").alias("b_id"), F.col("v").alias("vb")
        )
        if history_exists:
            cells = [r.cell for r in assigned.select("cell").distinct().collect()]
            hist = (
                spark.read.parquet(f"{index_dir}/assignments")
                # a REPLAYED batch must not see its own crashed
                # attempt's rows — it would drop its vectors as
                # self-dups (dedup_ingest protocol)
                .filter(F.col("batch") != batch_id)
                .filter(F.col("cell").isin(*cells))  # directory pruning
                .select("cell", F.col("v").alias("vh"))
            )
            # batch side broadcasts (bounded at one micro-batch);
            # the index side STREAMS — same orientation discipline as
            # the SimHash probe (never broadcast history)
            hist_dups = (
                hist.join(F.broadcast(b), "cell")
                .filter(sim >= thr)
                .select(F.col("b_id").alias("vec_id"))
            )
        else:
            hist_dups = assigned.limit(0).select("vec_id")
        a_side = assigned.select(
            "cell", F.col("vec_id").alias("a_id"), F.col("v").alias("vh")
        )
        batch_dups = (
            a_side.join(F.broadcast(b), "cell")
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(sim >= thr)
            .select(F.col("b_id").alias("vec_id"))
        )
        dup_ids = hist_dups.union(batch_dups).distinct().persist()
        try:
            kept = batch_df.join(dup_ids, "vec_id", "left_anti")
            kept.write.mode("overwrite").parquet(
                f"{out_dir}/batch={batch_id}"
            )
            # ALL vectors index — kept and dropped (module docstring)
            assigned.write.mode("overwrite").partitionBy("cell").parquet(
                f"{index_dir}/assignments/batch={batch_id}"
            )
            n_dups = dup_ids.count()
            n_in = batch_df.count()
            spark.createDataFrame(
                [(batch_id, n_in, n_dups, n_in - n_dups)],
                "batch_id long, n_in long, n_dups long, n_kept long",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{out_dir}/_metrics/batch={batch_id}"
            )
        finally:
            dup_ids.unpersist()
    finally:
        batch_df.unpersist()
        if assigned is not None:
            assigned.unpersist()


def semantic_ingest_stream(
    vecs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    threshold: float = SEMDEDUP_THR,
    assign: str = "l2",
    available_now: bool = True,
):
    """Start the semantic dedup-at-ingest stage over a streaming
    embeddings source; returns the StreamingQuery. The index must be
    bootstrapped first (``ivf_index_write`` — typically centroids
    from ``trained_centroids()`` with an EMPTY or historical corpus;
    the centroid read fails fast on a missing index). ``assign``
    must match the bootstrap's rule — ``l2`` is the SemDeDup/Lloyd
    rule that makes stream results equal the batch twin's. Read the
    kept corpus with ``spark.read.parquet(out_dir)``; per-batch drop
    accounting with ``semantic_ingest_metrics``."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        _batch_vec_dedup(
            batch_df, batch_id, index_dir, out_dir, threshold, assign
        )

    writer = vecs.writeStream.foreachBatch(_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def semantic_ingest_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-micro-batch dedup accounting (n_in / n_dups / n_kept)."""
    return (
        spark.read.parquet(f"{out_dir}/_metrics")
        .select("batch_id", "n_in", "n_dups", "n_kept")
        .orderBy("batch_id")
    )
