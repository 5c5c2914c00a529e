"""Corpus-scaling bench for the PREFIX-FILTER joins (VERDICT r9
item 1 done-criteria): after de-broadcasting the corpus-linear
shingle-DF table, candidate volume and per-row wall-clock must stay
flat as the corpus — and therefore the DF table itself — grows
1× → 4× → 16×.

Unlike tools/bench_corpus_scale.py's salted copies (which leave
cross-copy documents near-identical, so a pair generator would gain
quadratic cross-copy pairs — a semantics change), every copy here
gets its OWN TOKEN NAMESPACE (tokens prefixed ``c<i>~`` for copy
i>0): cross-copy shingle sets are disjoint, so true pairs and
candidate pairs both scale exactly k× while the distinct-shingle DF
table — the table the old ``F.broadcast(dfc)`` pinned everywhere —
grows k× too. Flat per-row numbers at 16× are the local[N] proxy for
"the shuffle-join plan survives the DF table outgrowing broadcast".

Usage: python tools/bench_prefix_join.py [sf_dir] [multipliers...]
Prints one JSON line:
    {"base_rows": N, "runs": {"4x": {"rows": ...,
        "jaccard": {"sec": s, "candidates": c, "pairs": p},
        "containment": {...}}, ...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    from pyspark.sql import functions as F

    from wd2duckdb_spark import get_spark
    from wd2duckdb_spark.functions.dedup import (
        CONTAIN_DEN,
        CONTAIN_NUM,
        JACCARD_DEN,
        JACCARD_NUM,
        _prefix_frames,
        q_containment_join,
        q_jaccard_prefix_join,
    )

    spark = get_spark(app_name="bench_prefix_join")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_rows = base.count()

    stage = tempfile.mkdtemp(prefix="prefix_join_scale_")
    out: dict[str, dict] = {}
    try:
        for m in mults:
            scaled_dir = os.path.join(stage, f"x{m}")
            os.makedirs(scaled_dir)
            # per-copy token namespace: copy 0 keeps the original text
            # (so 1x is exactly the base corpus); copies i>0 prefix
            # every token with "c<i>~" — within-copy shingle structure
            # (and therefore pair structure) is IDENTICAL to base,
            # cross-copy shingle sets are disjoint.
            ns = F.when(
                F.col("copy") == 0, F.col("text")
            ).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.trim("text"), " "),
                        lambda t: F.concat(
                            F.lit("c"),
                            F.col("copy").cast("string"),
                            F.lit("~"),
                            t,
                        ),
                    ),
                    " ",
                )
            )
            base.crossJoin(
                spark.range(m).withColumnRenamed("id", "copy")
            ).select(
                (F.col("doc_id") * m + F.col("copy")).alias("doc_id"),
                ns.alias("text"),
                "lang",
                "source",
                "n_chars",
            ).repartition(
                max(m, spark.sparkContext.defaultParallelism)
            ).write.parquet(f"{scaled_dir}/documents.parquet")

            row: dict[str, dict] = {"rows": base_rows * m}
            for name, qfn, num, den, self_join in (
                (
                    "jaccard",
                    q_jaccard_prefix_join,
                    JACCARD_NUM,
                    JACCARD_DEN,
                    True,
                ),
                (
                    "containment",
                    q_containment_join,
                    CONTAIN_NUM,
                    CONTAIN_DEN,
                    False,
                ),
            ):
                # candidate volume: the distinct pair set the prefix
                # filter hands to exact verification
                sets, toks, prefix = _prefix_frames(
                    spark, scaled_dir, num, den
                )
                other = prefix if self_join else toks
                cond = (
                    (F.col("a.doc_id") < F.col("b.doc_id"))
                    if self_join
                    else (F.col("a.doc_id") != F.col("b.doc_id"))
                )
                n_cand = (
                    prefix.alias("a")
                    .join(other.alias("b"), "tok")
                    .filter(cond)
                    .select("a.doc_id", "b.doc_id")
                    .distinct()
                    .count()
                )
                sets.unpersist()
                spark.catalog.clearCache()

                best, n_pairs = float("inf"), -1
                for _ in range(2):
                    t0 = time.perf_counter()
                    n_pairs = qfn(spark, scaled_dir).count()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                row[name] = {
                    "sec": round(best, 3),
                    "candidates": n_cand,
                    "pairs": n_pairs,
                }
            out[f"{m}x"] = row
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    print(json.dumps({"base_rows": base_rows, "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
