"""Near-duplicate dedup AT INGEST: a streaming stage that drops
incoming documents near-duplicating anything EVER ingested, using a
persisted MinHash-LSH band-key index.

This is the production shape of training-data dedup (the reference's
pipeline has no streaming tier; this extends the batch
``functions.dedup`` semantics to a feed): ``dedup_stream`` (exact
keys, watermark-bounded state) repairs at-least-once delivery;
THIS stage enforces corpus-level content uniqueness — its state is
the whole history, so it lives in a parquet index on the lake, not in
the state store:

- per micro-batch, compute each doc's LSH band keys
  (:func:`wd2duckdb_spark.functions.dedup.band_keys` — the same
  signature pipeline as the batch pair generator, so batch and stream
  cannot drift);
- a doc is a DUP if any of its band keys exists in the index (seen in
  any earlier batch) or is shared with a smaller doc_id in the same
  batch (bucket-min keep rule — the batch tier's canonical-min
  convention);
- kept docs append to ``out_dir``; their band keys append to
  ``index_dir``. Both writes go to ``batch=<id>`` subdirectories with
  overwrite, so a REPLAYED micro-batch (restart after crash)
  rewrites its own output instead of duplicating it — idempotent,
  exactly-once end to end.

The index's absence is checked EXPLICITLY with the FileSystem API
(same discipline as ``maintenance.upsert_stream``): a transient read
error must fail the batch (Structured Streaming retries it), not be
mistaken for "first batch" — which would silently admit every
near-duplicate of the prior corpus AND poison the index with their
keys.

Scale: the only per-batch joins are (batch-bands ⋈ index) on
(band, key) — at 100 TB the index side is micro-batch-partitioned
parquet and the batch side is micro-batch-sized, so Catalyst
broadcasts the batch side; nothing history-sized ever shuffles. Index
growth is ~N_BANDS rows per kept doc; any maintenance rewrite must
PRESERVE the ``batch=<id>`` partition layout (``partitionBy("batch")``
on the rewrite) — it carries the replay filter.

Docs with fewer than 3 tokens emit no shingles, hence no band keys,
and are always kept — same contract as the batch tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wd2duckdb_spark.functions.dedup import band_keys


def _batch_dedup(
    batch_df: DataFrame, batch_id: int, index_dir: str, out_dir: str
) -> None:
    spark = batch_df.sparkSession
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    idx_path = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = idx_path.getFileSystem(hconf)
    # "exists" must mean "has committed data": a crash mid-first-write
    # can leave only _temporary under the dir, and schema inference
    # over that would fail the batch forever
    index_exists = fs.exists(idx_path) and any(
        not st.getPath().getName().startswith(("_", "."))
        for st in fs.listStatus(idx_path)
    )

    bands = band_keys(batch_df).persist()
    dup_ids = None
    try:
        if index_exists:  # read errors PROPAGATE (batch retried)
            seen = (
                spark.read.parquet(index_dir)
                # a REPLAYED batch must not see its own keys from the
                # crashed attempt — it would drop its docs as self-dups
                .filter(F.col("batch") != batch_id)
                .select("band", "key")
            )
            hist_dups = bands.join(
                seen, ["band", "key"], "left_semi"
            ).select("doc_id")
        else:  # genuinely the first batch
            hist_dups = bands.limit(0).select("doc_id")
        w = Window.partitionBy("band", "key")
        batch_dups = (
            bands.withColumn("_mn", F.min("doc_id").over(w))
            .filter(F.col("doc_id") > F.col("_mn"))
            .select("doc_id")
        )
        dup_ids = hist_dups.union(batch_dups).distinct().persist()

        kept = batch_df.join(dup_ids, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        (
            bands.join(dup_ids, "doc_id", "left_anti")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/batch={batch_id}")
        )
    finally:  # a failed write must not leak cached RDDs across retries
        bands.unpersist()
        if dup_ids is not None:
            dup_ids.unpersist()


def neardup_ingest_stream(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start the dedup-at-ingest stage over a streaming ``documents``
    source; returns the StreamingQuery. Read the kept corpus with
    ``spark.read.parquet(out_dir)`` (the ``batch`` partition column
    records provenance)."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        _batch_dedup(batch_df, batch_id, index_dir, out_dir)

    writer = docs.writeStream.foreachBatch(_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
