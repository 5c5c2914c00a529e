"""Skew-mitigation bench (SURVEY §4.3): measured evidence for the
three-tier story on a pathologically skewed join key (the P31/Q5 hub
shape — 90% of the fact rows on ONE key).

Tiers measured on the same data, broadcast disabled (a broadcast dim
has no skew problem by construction — salting exists for the cases
where broadcast is infeasible and for engines/paths AQE's skew-join
cannot reach, e.g. stream-static joins):

1. plain shuffle join, AQE skew-join OFF — the hot key's entire
   probe side lands in one reduce task (the failure mode);
2. plain shuffle join, AQE skew-join ON — runtime partition splitting
   (the first line of defense, zero code);
3. operators/skew.salted_join — deterministic spread, works where AQE
   can't (and its plan is fixed at compile time, so it also guards
   paths AQE does not re-plan).

A second tier benches the SELF-join regime (the dedup/pair-expansion
shape: few hot block keys, quadratic in-block fan-out) head-to-head:
plain AQE shuffle join vs salted_join vs grid_self_join — the grid
reaches the salted per-task pair bound with √S replication per side
instead of S on one side (VERDICT r3 item 2), so its exchange writes
~2√S/S of the salted bytes.

Prints one JSON line:
  {"metric": "skew_join", "rows": N,
   "plain_no_aqe_sec": ..., "aqe_sec": ..., "salted_sec": ...,
   "self_join": {"rows": M, "pairs": P, "plain_aqe_sec": ...,
                 "salted_sec": ..., "grid_sec": ...}}

Usage: python tools/bench_skew.py [n_rows] [reps]  (default 8M, 3)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from wd2duckdb_spark import get_spark
    from wd2duckdb_spark.operators.skew import salted_join

    spark = get_spark(
        app_name="bench_skew",
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # status REST on: the self-join tier reports EXCHANGE
            # BYTES per plan (VERDICT r4 item 4 — at local sizes the
            # 2√S-vs-S shuffle-volume difference between grid and
            # salted is invisible in seconds; bytes are deterministic)
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tools.metrics import StageMetrics

    stage_metrics = StageMetrics(spark)

    # 90% of rows on key 31, the rest (ids divisible by 10) uniform
    # over all 1000 cold keys via id/10; a payload expression gives
    # the reducer real per-row work
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 10 != 0, F.lit(31))
        .otherwise(F.pmod((F.col("id") / 10).cast("long"), F.lit(1000)))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("label"),
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_fact.parquet")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim.parquet")
    f = spark.read.parquet("/tmp/skew_fact.parquet")
    d = spark.read.parquet("/tmp/skew_dim.parquet")

    # pmod keeps the running sum inside long range (ANSI overflow)
    work = F.sum(
        F.pmod(F.xxhash64("payload", "label"), F.lit(1_000_003))
    ).alias("h")

    def run(df) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df.agg(work).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def set_skew(on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    THRESH = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    ADVISORY = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    try:
        set_skew(False)
        plain_no_aqe = run(f.join(d, "k"))
        set_skew(True)
        aqe_default = run(f.join(d, "k"))
        # AQE's default split threshold is 256 MB: a hot partition
        # SMALLER than that never splits, yet still serializes one
        # reducer — exactly the sub-threshold regime this bench sits
        # in. Tune the thresholds down and AQE splits for real.
        spark.conf.set(THRESH, "16m")
        spark.conf.set(ADVISORY, "16m")
        aqe_tuned = run(f.join(d, "k"))
        spark.conf.unset(THRESH)
        spark.conf.unset(ADVISORY)
        salted = run(salted_join(f, d, "k", n_salts=32))

        # --- self-join tier: 8 hot blocks, quadratic pair fan-out ---
        from wd2duckdb_spark.operators.skew import grid_self_join

        self_rows = max(n_rows // 500, 4000)  # ~|block|² pairs per block
        sj = spark.range(self_rows).select(
            F.pmod(F.col("id"), F.lit(8)).alias("k"),
            F.col("id").alias("a_id"),
        )
        sj.write.mode("overwrite").parquet("/tmp/skew_self.parquet")
        sa = spark.read.parquet("/tmp/skew_self.parquet")
        sb = sa.select("k", F.col("a_id").alias("b_id"))
        pair_work = F.sum(
            F.pmod(F.xxhash64("a_id", "b_id"), F.lit(1_000_003))
        ).alias("h")

        def run_pairs(df) -> tuple[float, float]:
            """(best seconds, shuffle-write MB). Bytes are a
            deterministic property of the plan, so one measured rep
            suffices; seconds stay min-of-reps."""
            best = float("inf")
            shuffle_mb = None
            for _ in range(reps):
                stage_metrics.snapshot()
                t0 = time.perf_counter()
                df.agg(pair_work).collect()
                best = min(best, time.perf_counter() - t0)
                if shuffle_mb is None:
                    d = stage_metrics.delta()
                    # delta() is None when no stable reading existed —
                    # record the sample as invalid, not 0.0 (ADVICE r5)
                    shuffle_mb = (
                        "invalid"
                        if d is None
                        else round(d["shuffleWriteBytes"] / 1e6, 2)
                    )
            return round(best, 3), shuffle_mb

        n_cells = 256
        set_skew(True)
        self_plain, plain_mb = run_pairs(sa.join(sb, "k"))
        self_salted, salted_mb = run_pairs(
            salted_join(sa, sb, "k", n_salts=n_cells, join_hint="shuffle_hash")
        )
        self_grid, grid_mb = run_pairs(
            grid_self_join(sa, sb, "k", n_cells=n_cells, join_hint="shuffle_hash")
        )
        n_pairs = self_rows * self_rows // 8

        # --- diagnostic tier (round 7): exact hot-key report vs the
        # Misra-Gries sketch probe, on a HIGH-CARDINALITY skewed key
        # (10% of rows on one hot key, the rest unique). This is the
        # regime the sketch exists for: the exact groupBy's map-side
        # partials are ~one record per distinct key per partition
        # (≈ N records when keys are mostly unique), while the sketch
        # ships ≤ counters rows per partition regardless of N — the
        # BYTES are the scale signal; local seconds can favor the JVM
        # groupBy because the sketch pays the Arrow hop (the trade is
        # shuffle volume and hot-reducer immunity, not local CPU).
        from wd2duckdb_spark.operators.skew import (
            _hot_keys_tail,
            hot_keys_sketch,
        )

        dd = spark.range(n_rows).select(
            F.when(F.pmod("id", F.lit(10)) == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("u"), F.col("id")))
            .alias("key")
        )
        dd.write.mode("overwrite").parquet("/tmp/skew_diag.parquet")
        dread = spark.read.parquet("/tmp/skew_diag.parquet")
        diag_counters = 4096  # heavy-hitter floor = N/4097 ≈ 0.02% share

        def run_report(mk) -> tuple[float, float, list]:
            """mk: thunk building a FRESH DataFrame per rep — reps on
            one DataFrame object ride Spark's shuffle-output reuse
            (later reps skip the scan + map stages entirely), turning
            min-of-N into a cache benchmark. Bytes from rep 1 (fresh),
            three decimals: the sketch's whole shuffle is ~KBs and
            would round to a fabricated-looking 0.0 at two."""
            best, shuffle_mb, rows = float("inf"), None, None
            for _ in range(reps):
                stage_metrics.snapshot()
                t0 = time.perf_counter()
                rows = mk().collect()
                best = min(best, time.perf_counter() - t0)
                if shuffle_mb is None:
                    d = stage_metrics.delta()
                    shuffle_mb = (
                        "invalid"
                        if d is None
                        else round(d["shuffleWriteBytes"] / 1e6, 3)
                    )
            return round(best, 3), shuffle_mb, rows

        exact_sec, exact_mb, exact_rows = run_report(
            lambda: _hot_keys_tail(
                dread.groupBy("key").agg(F.count("*").alias("n_rows"))
            )
        )
        sketch_sec, sketch_mb, sketch_rows = run_report(
            lambda: hot_keys_sketch(dread, "key", counters=diag_counters)
        )
        # correctness cross-check inside the bench: same hot key, and
        # the estimate within the Misra-Gries undercount bound
        hot_exact = exact_rows[0]
        hot_sketch = sketch_rows[0]
        mg_bound = n_rows // (diag_counters + 1)
        diag_ok = (
            hot_sketch.key == hot_exact.key
            and 0 <= hot_exact.n_rows - hot_sketch.n_rows <= mg_bound
        )
    finally:
        set_skew(True)  # restore the engine default
        spark.stop()

    print(
        json.dumps(
            {
                "metric": "skew_join",
                "rows": n_rows,
                "reps": reps,
                "plain_no_aqe_sec": plain_no_aqe,
                "aqe_default_sec": aqe_default,
                "aqe_tuned_16m_sec": aqe_tuned,
                "salted_sec": salted,
                "self_join": {
                    "rows": self_rows,
                    "pairs": n_pairs,
                    "n_cells": n_cells,
                    "plain_aqe_sec": self_plain,
                    "salted_sec": self_salted,
                    "grid_sec": self_grid,
                    # the scale argument in a deterministic number:
                    # grid replicates each side √cells ways (≈2√S·N
                    # rows through the exchange) vs salted's S·N on
                    # one side — grid_shuffle_mb < salted_shuffle_mb
                    "plain_shuffle_mb": plain_mb,
                    "salted_shuffle_mb": salted_mb,
                    "grid_shuffle_mb": grid_mb,
                },
                "diagnostic": {
                    "rows": n_rows,
                    "counters": diag_counters,
                    "exact_sec": exact_sec,
                    "sketch_sec": sketch_sec,
                    # the scale signal: exact's map-side partials ship
                    # ~1 record per distinct key per partition; the
                    # sketch ships <= counters rows per partition
                    "exact_shuffle_mb": exact_mb,
                    "sketch_shuffle_mb": sketch_mb,
                    "hot_key_agrees_within_bound": diag_ok,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
