"""Corpus-scaling bench: does per-row throughput hold as the corpus
grows 1× → 4× → 16×?

Materializes scaled copies of ``documents`` (doc_id remapped into
disjoint ranges, one token salted per copy so exact-dup semantics
don't degenerate), then times the scan/agg-bound operator tier over
each size with the noop sink. If the engine's plans are right, rows/s
stays ~flat while wall-clock grows linearly — the local[N] proxy for
"would survive 100×". Pair-generating operators (MinHash-LSH) are
deliberately excluded: duplicating a corpus k× multiplies its
NEAR-DUP PAIRS quadratically, which is a semantics change, not a
scaling test.

Usage: python tools/bench_corpus_scale.py [sf_dir] [multipliers...]
Prints one JSON line:
    {"base_rows": N, "runs": {"4x": {"rows": ..., "queries":
        {name: {"sec": s, "krows_per_sec": r}}}, ...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

BENCH_QUERIES = (
    "text_quality",
    "dedup_exact",
    "simhash",
    "heavy_hitters",
    "boilerplate_prune",
    "pack_sequences",
    "dataset_split",
    "token_count_bpe",
    # round-2 additions (documents-tier)
    "bigram_surprisal",
    "inverted_index",
    "shard_manifest",
    "weighted_sample",
    # round-4 (VERDICT r3 item 6): the streaming dedup tier's batch
    # twin — window-min over band buckets, linear in rows (the PAIR
    # generator stays excluded; the keep rule is not pair-generating)
    "lsh_keep_list",
    # round-8 documents-tier additions. All linear in rows: the LM
    # sampler and JS divergence are aggregate-bounded; the span
    # queries mark OCCURRENCES of duplicated grams (≤ total
    # occurrences — linear), unlike the excluded pair generators
    # (simhash_hamming_pairs / leakage_safe_split stay out for the
    # same quadratic-pairs reason as MinHash-LSH).
    "perplexity_bucket_sample",
    "vocab_divergence",
    "repeated_ngram_spans",
    "dedup_span_removal",
    "ngram_novelty",
    # round-9: real BPE counting — training is a vocabulary-bounded
    # collect (flat in corpus size), encoding is a linear mapInPandas
    # pass. The pair generators added this round (simhash_wide_pairs,
    # containment_join) stay excluded like every other pair generator;
    # their scale story is measured by tools/bench_simhash_bands.py
    # (candidate volume) instead.
    "token_count_real_bpe",
    # round-10: both linear in rows — CDC chunking is one in-row
    # expression + one chunk-md5 groupBy; the quota cap is one
    # source-keyed WindowGroupLimit exchange (the quota dict is a
    # |sources|-bounded collect, flat in corpus size)
    "cdc_chunk_dedup",
    "domain_cap_quota",
)

#: Embeddings-tier queries, scaled by duplicating vectors under fresh
#: vec_ids offset by copy*emb_rows, so ids 0..K-1 — kmeans' seed set —
#: are the same original vectors at every multiplier (centroid
#: geometry really is unchanged then; assignment/update cost scales
#: linearly — the property under test).
EMB_QUERIES = (
    "kmeans_lloyd",
    "embedding_centroids",
    "embedding_quantize",
    # round-8: centroid-nearest prototype — one (label × dim) partial
    # agg + broadcast-back scan scoring, linear in vectors
    "label_exemplars",
    # semantic_dedup deliberately excluded: like MinHash-LSH it is
    # pair-generating, and duplicating vectors k× multiplies in-cluster
    # pairs quadratically — a semantics change, not a scaling test.
)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    from pyspark.sql import functions as F

    from wd2duckdb_spark import get_spark
    from wd2duckdb_spark.functions import similarity
    from wd2duckdb_spark.registry import all_queries

    spark = get_spark(
        app_name="bench_corpus_scale",
        # status REST API on: the dedup_ingest_probe row reports
        # BYTES READ, the scale property under test (seconds alone
        # drown in host noise)
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tools.metrics import StageMetrics

    stage_metrics = StageMetrics(spark)
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    queries = all_queries()
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_rows = base.count()
    emb_rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    stage = tempfile.mkdtemp(prefix="corpus_scale_")
    out: dict[str, dict] = {}
    try:
        for m in mults:
            scaled_dir = os.path.join(stage, f"x{m}")
            os.makedirs(scaled_dir)
            # disjoint doc_id ranges per copy; salt one token per copy
            # so copies are near- but not exact-duplicates
            copies = base.crossJoin(
                spark.range(m).withColumnRenamed("id", "copy")
            ).select(
                (F.col("doc_id") * m + F.col("copy")).alias("doc_id"),
                F.concat(
                    F.col("text"),
                    F.lit(" salt"),
                    F.col("copy").cast("string"),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            copies.repartition(
                max(m, spark.sparkContext.defaultParallelism)
            ).write.parquet(f"{scaled_dir}/documents.parquet")
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            emb.crossJoin(
                spark.range(m).withColumnRenamed("id", "copy")
            ).select(
                # vec_id + copy*emb_rows (NOT vec_id*m + copy): kmeans
                # seeds on vec_id < K, so ids 0..K-1 must stay the
                # ORIGINAL first K vectors at every multiplier — the
                # interleaved remap made the seed set m duplicates of
                # only ceil(K/m) originals, skewing cross-scale
                # comparisons (ADVICE r2).
                (F.col("vec_id") + F.col("copy") * F.lit(emb_rows)).alias(
                    "vec_id"
                ),
                "embedding",
                "label",
            ).repartition(
                max(m, spark.sparkContext.defaultParallelism)
            ).write.parquet(f"{scaled_dir}/embeddings.parquet")
            # the query tier touches documents + embeddings; link the rest
            for t in (
                "region nation customer supplier part orders lineitem "
                "events"
            ).split():
                os.symlink(
                    f"{sf_dir}/{t}.parquet", f"{scaled_dir}/{t}.parquet"
                )
            n_rows = base_rows * m

            per_q: dict[str, dict] = {}
            for name in BENCH_QUERIES:
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    queries[name](spark, scaled_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                per_q[name] = {
                    "sec": round(best, 3),
                    "krows_per_sec": round(n_rows / best / 1000, 1),
                }
            # Dedup-at-ingest probe cost vs index size (VERDICT r3
            # item 6): build a band-key index over the m×-scaled
            # corpus, then time a FIXED-size micro-batch through
            # _batch_dedup. With the round-4 probe orientation (batch
            # side broadcast, index streamed) this should stay
            # flat-to-linear in m — measured here, not asserted.
            from wd2duckdb_spark.streaming.dedup_ingest import (
                _batch_dedup,
                compact_index,
            )

            ingest_root = os.path.join(stage, f"ingest_x{m}")
            idx_dir = f"{ingest_root}/idx"
            ing_out = f"{ingest_root}/out"
            hist = spark.read.parquet(f"{scaled_dir}/documents.parquet")
            _batch_dedup(hist, 0, idx_dir, ing_out)  # m×-sized history
            # operational steady state: history compacted to few large
            # key-sorted files — the layout the probe's row-group
            # pruning is designed against (probe bytes ≈ n_files ×
            # n_probe_keys × row-group size, independent of m)
            compact_index(spark, idx_dir, target_file_bytes=1 << 30)
            index_rows = spark.read.parquet(idx_dir).count()
            # steady-state shape: a RATE-LIMITED micro-batch (few
            # hundred docs → pruned probe regime), replayed under the
            # SAME batch_id for both reps so min() compares identical
            # workloads (ADVICE r4: distinct batch_ids made rep 2
            # probe a larger index where every doc was a history dup;
            # the replay filter excludes the batch's own keys, so a
            # replay re-does exactly the same probe work)
            probe = base.limit(16).select(
                # ids above every history id: bucket-min must see the
                # probe docs as the newer side
                (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            best, probe_bytes = float("inf"), None
            for _ in range(2):
                stage_metrics.snapshot()
                t0 = time.perf_counter()
                _batch_dedup(probe, 1, idx_dir, ing_out)
                el = time.perf_counter() - t0
                if el < best:
                    best = el
                    d = stage_metrics.delta()
                    probe_bytes = None if d is None else d["inputBytes"]
            per_q["dedup_ingest_probe"] = {
                "sec": round(best, 3),
                "index_rows": index_rows,
                # THE scale number: must stay ~flat as index_rows
                # grows m× (IN-pushdown row-group pruning against the
                # key-sorted index layout). delta() returns None when
                # no stable status-store reading existed — record the
                # sample as invalid, never as a number (ADVICE r5).
                "probe_input_mb": (
                    "invalid"
                    if probe_bytes is None
                    else round(probe_bytes / 1e6, 1)
                ),
            }

            # VERDICT r5 item 1: the MID-BAND probe — a ~5k-key burst
            # (1,250 docs × 4 band keys), past the old 16-chunk cap —
            # must now ALSO show pruned bytes, not a full-index scan
            # (MAX_PROBE_CHUNKS raised to 64 → pruned through 12.8k
            # keys). Same replay discipline as the steady-state row.
            probe_mid = base.limit(1250).select(
                (F.col("doc_id") + F.lit(2_000_000_000)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            best, probe_bytes = float("inf"), None
            for _ in range(2):
                stage_metrics.snapshot()
                t0 = time.perf_counter()
                _batch_dedup(probe_mid, 2, idx_dir, ing_out)
                el = time.perf_counter() - t0
                if el < best:
                    best = el
                    d = stage_metrics.delta()
                    probe_bytes = None if d is None else d["inputBytes"]
            per_q["dedup_ingest_probe_midband"] = {
                "sec": round(best, 3),
                "index_rows": index_rows,
                "probe_input_mb": (
                    "invalid"
                    if probe_bytes is None
                    else round(probe_bytes / 1e6, 1)
                ),
            }

            n_vecs = emb_rows * m
            for name in EMB_QUERIES:
                best = float("inf")
                for _ in range(2):
                    # kmeans_lloyd's assignment is memoized per
                    # (app, dir) since round 5 — drop ONLY that memo so
                    # every rep re-runs the Lloyd chain (the scaling
                    # under test). A blanket clear_memos() here would
                    # also wipe the scan cache and the IVF/PQ memos,
                    # silently changing what EVERY row measures.
                    similarity._asg_memo.clear()
                    t0 = time.perf_counter()
                    queries[name](spark, scaled_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                per_q[name] = {
                    "sec": round(best, 3),
                    "krows_per_sec": round(n_vecs / best / 1000, 1),
                }
            out[f"{m}x"] = {"rows": n_rows, "queries": per_q}

        # VERDICT r5 item 4: archive_index's file-count claim,
        # measured. The probe-bytes rows above vary index SIZE at
        # fixed batch count; this varies BATCH COUNT at fixed size —
        # after B micro-batches the index holds ≥ B files and probe
        # cost carries a per-file term, so bytes grow with B until
        # archive_index folds history into one range-partitioned
        # archive, after which bytes/files must drop back ~flat.
        out["archive"] = _bench_archive(spark, stage_metrics, base, stage)
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    print(json.dumps({"base_rows": base_rows, "runs": out}))


def _bench_archive(spark, stage_metrics, base, stage) -> dict:
    """Probe bytes/files before vs after archive_index, at a fixed
    corpus size ingested as MANY SMALL batches (the steady-state
    stream shape archive_index exists for)."""
    import glob

    from pyspark.sql import functions as F

    from wd2duckdb_spark.streaming.dedup_ingest import (
        _batch_dedup,
        archive_index,
    )

    root = os.path.join(stage, "archive_bench")
    idx_dir, out_dir = f"{root}/idx", f"{root}/out"
    n_batches, per = 24, 50
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per
        sl = base.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1)
        _batch_dedup(sl, b, idx_dir, out_dir)

    def _n_files() -> int:
        return len(
            [
                p
                for p in glob.glob(f"{idx_dir}/batch=*/*")
                if not os.path.basename(p).startswith(("_", "."))
            ]
        )

    probe = base.limit(16).select(
        (F.col("doc_id") + F.lit(3_000_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )

    def _measure(batch_id: int) -> dict:
        best, probe_bytes = float("inf"), None
        for _ in range(2):  # same-batch-id replay (identical work)
            stage_metrics.snapshot()
            t0 = time.perf_counter()
            _batch_dedup(probe, batch_id, idx_dir, out_dir)
            el = time.perf_counter() - t0
            if el < best:
                best = el
                d = stage_metrics.delta()
                probe_bytes = None if d is None else d["inputBytes"]
        return {
            "sec": round(best, 3),
            "index_files": _n_files(),
            "probe_input_mb": (
                "invalid"
                if probe_bytes is None
                else round(probe_bytes / 1e6, 2)
            ),
        }

    before = _measure(n_batches)
    # fold everything but the most recent real batch (and the probe's
    # own batch) into the batch=-1 archive, then re-probe
    archive_index(spark, idx_dir, through_batch=n_batches - 2)
    after = _measure(n_batches + 1)
    return {"n_batches": n_batches, "before": before, "after": after}


if __name__ == "__main__":
    main()
