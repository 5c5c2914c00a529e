"""Isolated per-query bench + plan dump for the optimization loop.

Usage:
    python tools/bench_one.py [--sf DIR] [--reps N] [--plan OUTDIR] q1 q2 ...

Times each named query through the noop sink (min over N reps,
clearCache between queries — same methodology as bench.py), and with
--plan writes `<OUTDIR>/<query>.txt` containing .explain("formatted").
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plan", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from wd2duckdb_spark import get_spark
    from wd2duckdb_spark.registry import all_queries

    spark = get_spark(app_name="bench_one")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Same warm-up as bench.py so numbers are comparable.
    lw = spark.read.parquet(f"{args.sf}/lineitem.parquet").limit(1000)
    dim = spark.range(100).withColumnRenamed("id", "l_orderkey")
    (
        lw.join(F.broadcast(dim), "l_orderkey", "left")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("c"))
        .orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
    )

    for name in args.queries:
        fn = qs[name]
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        best, runs = float("inf"), []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_one: {name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        spark.catalog.clearCache()
        print(f"{name}\t{best:.3f}\t{runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
