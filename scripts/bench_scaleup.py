#!/usr/bin/env python
"""sf0.1 -> sf1 scale-up evidence (round 5, VERDICT r4 #5): run the
flagship + the full headline bench tier at sf0.1 and at the 10x sf1
fixture (scripts/make_sf1.py), record per-entry wall-time ratios, and
name every entry whose time grows super-linearly — those are the next
round's fix list.

Classification (data is 10x; constant factors dominate small entries):
  ratio <= 12   ok            (at-or-below linear in data)
  12 < r <= 15  linear+       (linear with measurable overhead growth)
  ratio > 15    SUPER-LINEAR  (flagged)

Outputs BENCH/scaleup_sf1.json + BENCH/SCALEUP.md.
Usage: python scripts/bench_scaleup.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
PASSES = 2


def _run_tier(spark, names, sf_dir: str) -> dict[str, float]:
    from occular_ocr_spark.queries import QUERIES, release_persists

    import bench

    bench.warmup(spark, sf_dir)
    out: dict[str, float] = {}
    for name in names:
        if name == "pipeline_e2e":
            # the catalog entry memoizes its staged artifact per
            # (session, sf_dir) — correct for the gate, but here the
            # number of interest is the CHAIN BUILD, so time a fresh
            # run_pipeline into a new directory (single pass: the
            # chain is 8 materialized stages, not a steady-state scan)
            import tempfile

            from occular_ocr_spark import pipeline_e2e as P

            t0 = time.perf_counter()
            P.run_pipeline(spark, sf_dir, tempfile.mkdtemp(prefix="occ_e2e_su_"))
            out[name] = round(time.perf_counter() - t0, 3)
            print(f"  {name}: {out[name]:.3f}s (fresh chain)", file=sys.stderr)
            continue
        fn = QUERIES[name]
        best = None
        for _ in range(PASSES):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name == "extract_transcripts":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        release_persists()
        out[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", file=sys.stderr)
    return out


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/occ_sf1"
    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        from scripts.make_sf1 import build

        build(sf1_dir)

    import bench

    headline, _ = bench._tiers()
    names = headline

    from pyspark.sql import SparkSession

    load_start = bench._wait_quiet_host()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("occular-ocr-spark-scaleup")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print("== sf0.1 pass ==", file=sys.stderr)
        t01 = _run_tier(spark, names, SF01)
        print("== sf1 pass ==", file=sys.stderr)
        t1 = _run_tier(spark, names, sf1_dir)
    finally:
        spark.stop()

    rows = []
    for name in names:
        a, b = t01[name], t1[name]
        ratio = round(b / a, 2) if a > 0 else None
        cls = (
            "ok" if ratio is None or ratio <= 12
            else ("linear+" if ratio <= 15 else "SUPER-LINEAR")
        )
        rows.append({"entry": name, "sf0.1_sec": a, "sf1_sec": b,
                     "ratio": ratio, "class": cls})
    rows.sort(key=lambda r: -(r["ratio"] or 0))
    flagged = [r["entry"] for r in rows if r["class"] == "SUPER-LINEAR"]

    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
    )
    os.makedirs(bench_dir, exist_ok=True)
    out = {
        "ts": round(time.time(), 1),
        "sf1_dir": sf1_dir,
        "passes": PASSES,
        "host_load_1m_start": round(load_start, 2),
        "host_load_1m_end": round(os.getloadavg()[0], 2),
        "n_entries": len(rows),
        "super_linear": flagged,
        "entries": rows,
    }
    with open(os.path.join(bench_dir, "scaleup_sf1.json"), "w") as f:
        json.dump(out, f, indent=1)

    md = [
        "# sf0.1 -> sf1 scale-up (10x data, headline tier, best of "
        f"{PASSES} passes)",
        "",
        f"Fixture: `{sf1_dir}` (scripts/make_sf1.py — key-shifted 10-copy "
        "replication of sf0.1; copies are NOT near-duplicates: every 5th "
        "token is copy-tagged, so dedup entries see 10x data, not a 10x-"
        "denser duplicate graph).  Host 1-min load at start: "
        f"{out['host_load_1m_start']}.",
        "",
        "An entry is flagged SUPER-LINEAR when its wall time grows more "
        "than 15x on 10x data; sub-second sf0.1 entries are fixed-"
        "overhead-dominated, so most ratios land well under 10.",
        "",
        f"**Super-linear entries ({len(flagged)}):** "
        + (", ".join(f"`{n}`" for n in flagged) if flagged else "none"),
        "",
        "| entry | sf0.1 s | sf1 s | ratio | class |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['entry']} | {r['sf0.1_sec']} | {r['sf1_sec']} | "
            f"{r['ratio']} | {r['class']} |"
        )
    with open(os.path.join(bench_dir, "SCALEUP.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"super_linear": flagged, "n_entries": len(rows),
                      "file": "BENCH/SCALEUP.md"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
