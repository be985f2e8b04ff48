#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times named catalog entries
into a noop sink (best of N) and optionally captures
``explain("formatted")`` into plans/<tag>/<name>_<suffix>.txt.

This file is NOT the driver's bench — bench.py stays frozen.  Usage:

    python bench_extra.py [--passes N] [--plans TAG --suffix before|after]
                          [--sf DIR] name [name ...]

Prints one JSON line {"queries": {...}, "sf_dir": ...} at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, help="plans subdir tag, e.g. r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--plans-only", action="store_true",
                    help="skip the timing passes; just capture plans")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("occular-ocr-spark-bench-extra")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from occular_ocr_spark.queries import QUERIES, release_persists

    if not args.no_warmup:
        for name in ("scan_prune", "groupby_agg", "extract_plain_docs"):
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()

    plans_dir = None
    if args.plans:
        plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "plans", args.plans)
        os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in args.names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = None
        for _ in range(0 if args.plans_only else args.passes):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if plans_dir:
            df = fn(spark, args.sf)
            with open(os.path.join(plans_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        release_persists()
        spark.sparkContext.setJobDescription(None)
        if best is not None:
            timings[name] = round(best, 3)
            print(f"{name}: {best:.3f}s", file=sys.stderr)
    spark.stop()
    print(json.dumps({"queries": timings, "sf_dir": args.sf,
                      "passes": args.passes}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
