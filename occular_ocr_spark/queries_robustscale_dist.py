"""Distributed two-pass selection twins for the robust-scale trio
(round 5, VERDICT r4 #3): ``hodges_lehmann_dist``, ``qn_scale_dist``,
``sn_scale_dist`` compute EXACTLY the same order statistics as the
wave-64 originals — the HL location (lower median of Walsh sums), the
Rousseeuw-Croux Qn (k-th smallest pairwise gap) and Sn (lowmed of
per-anchor highmed gaps) — WITHOUT ever materializing the O(n²) pair
frame.  Same DuckDB oracles, same output columns; the originals are
hereby demoted to oracle scaffolds (queries_robustscale.py docstrings).

Algorithm (the form the wave-64 module header promised): binary search
over the ANSWER VALUE with a count-pairs-below predicate per probe —
the classical selection-in-X+Y / selection-in-|X−Y| technique
(Johnson & Mizoguchi 1978; same job shape as ``group_quantiles_dist``'s
two-pass histogram selection):

1. ONE per-row pass compresses the input to per-(lang, value) counts
   (partial-agg shuffle; the only stage that touches row data).  Doc
   lengths are bounded integers, so this table is K langs × V distinct
   values — bounded regardless of row count (a 10^12-row corpus still
   compresses to ≤ max-length rows per lang).
2. A driver loop holds only (lo, hi, k) per lang — K constants — and
   runs a C-way (C=16) value search: each pass evaluates
   count_pairs_le(lang, t) at ≤ C−1 pivots per unconverged lang in ONE
   Spark job over the persisted compressed table, collecting K×C count
   rows (bounded).  Passes needed: ceil(log_C(value range)) ≈ 3.
3. count_pairs_le never expands pairs.  With cnt_v / cum_less(v) /
   cum_le(v) from the compressed table and an as-of rank lookup at the
   shifted probe values (union-merge running-sum window per lang over
   the bounded compressed rows):

   * gaps   (Qn): Σ_v [ cnt_v·(cum_less(v) − cum_less(v−t)) + C(cnt_v,2) ]
   * Walsh  (HL): Σ_u [ cnt_u·(cum_le(s−u) − cum_le(u)) · 1[s−u > u]
                        + C(cnt_u+1,2) · 1[2u ≤ s] ]
   * Sn anchors:  Σ_v cnt_v · 1[ cum_le(v+t) − cum_less(v−t) − 1 ≥ h ]
     (an anchor's highmed ≤ t iff ≥ h = ⌊n/2⌋+1 neighbours lie within t)

   Gaps/sums/highmeds are integers, so the smallest t with
   count ≥ k IS the k-th order statistic — the search is exact.

Scale: the only O(rows) work is step 1's partial agg; every search
pass runs over the compressed table (per-lang windows bounded by the
value range, documented) and collects O(K·C) constants — the
anti-pattern doctrine's "bounded constant fetch".  Contrast the
scaffolds' O(n²) pair joins: a 10⁹-row lang group is a 10¹⁸-pair
frame there, and ~60 bounded micro-jobs here.

House contract: DuckDB value-hash oracles (identical to the scaffold
entries' oracles — the point is bit-identical answers from a different
physical plan), self-registration into queries.QUERIES / ORACLES,
semantics + equality tests in tests/test_robustscale_dist.py.

Cross-engine float policy: none needed — integer order statistics
end-to-end; HL's point value is one half-up halving.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import queries as _q
from .queries import _t
from .queries_robustscale import (
    ORACLE_HODGES_LEHMANN,
    ORACLE_QN_SCALE,
    ORACLE_SN_SCALE,
)

# search fan-out per pass (pivots per lang per Spark job): each pass is
# a fixed-cost micro-job (~1 s dominated by scheduling, not data), so a
# wider fan-out directly cuts rounds — 32 pivots resolves a 10^9 value
# range in <=6 passes and the fixture's ~500-wide range in 2
_C = 32


def _compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, value) counts with strict/inclusive cumulative ranks.

    The one per-row pass: groupBy partial-agg shuffle.  The cumulative
    window runs over DISTINCT values per lang — bounded by the integer
    value range, not the row count (module docstring step 1).
    """
    g = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", F.col("n_chars").alias("x"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy("x")
    return _q._persist_tracked(
        g.withColumn(
            "cum_le", F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).withColumn("cum_less", F.col("cum_le") - F.col("cnt"))
    )


def _asof(comp: DataFrame, probes: DataFrame, *, strict: bool, out: str) -> DataFrame:
    """Rank lookup at arbitrary values: for each probe row (lang, tid,
    x, w) return ``out`` = #input rows with value < w (strict) or ≤ w.

    Union-merge: data rows and probe rows sort together per lang; a
    running sum of data counts at each probe position is exactly the
    as-of cumulative.  Probe tag sorts before data at equal values for
    strict (<), after for inclusive (≤).  Window size = compressed
    rows + probe rows — bounded (module docstring step 3).
    """
    probe_tag = 0 if strict else 1
    data = comp.select(
        "lang",
        F.col("x").alias("val"),
        F.col("cnt").alias("wt"),
        F.lit(None).cast("long").alias("tid"),
        F.lit(None).cast("long").alias("px"),
        F.lit(1 - probe_tag).alias("tag"),
    )
    pr = probes.select(
        "lang",
        F.col("w").alias("val"),
        F.lit(0).cast("long").alias("wt"),
        F.col("tid").cast("long").alias("tid"),
        F.col("x").cast("long").alias("px"),
        F.lit(probe_tag).alias("tag"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("val", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        data.unionByName(pr)
        .withColumn(out, F.sum("wt").over(w))
        .where(F.col("tid").isNotNull())
        .select("lang", F.col("tid"), F.col("px").alias("x"), out)
    )


def _search(
    spark: SparkSession,
    bounds: Dict[str, Tuple[int, int, int]],
    count_at: Callable[[DataFrame], DataFrame],
) -> Dict[str, int]:
    """C-way exact value search: smallest t with count_pairs_le(t) ≥ k
    per lang.  ``bounds`` maps lang -> (lo, hi, k) with the invariant
    count(lo−1) < k ≤ count(hi); ``count_at`` maps a broadcastable
    pivot frame (lang, tid, t) to counts (lang, tid, c).  Driver state
    and per-pass collects are K×C constants (module docstring step 2).
    """
    state = dict(bounds)
    while True:
        pivots: List[Tuple[str, int, int]] = []
        for lang, (lo, hi, _k) in state.items():
            if lo >= hi:
                continue
            step = max(1, (hi - lo) // _C)
            cand = sorted({min(lo + i * step, hi) for i in range(1, _C)} - {hi})
            # always include at least one interior probe below hi
            if not cand:
                cand = [lo]
            pivots.extend((lang, tid, t) for tid, t in enumerate(cand))
        if not pivots:
            break
        pdf = spark.createDataFrame(pivots, "lang string, tid long, t long")
        got: Dict[str, List[Tuple[int, int]]] = {}
        for row in count_at(F.broadcast(pdf)).collect():
            got.setdefault(row["lang"], []).append((int(row["tid"]), int(row["c"])))
        by_t = {
            (lang, tid): t for lang, tid, t in pivots
        }
        for lang, counts in got.items():
            lo, hi, k = state[lang]
            for tid, c in sorted(counts, key=lambda tc: by_t[(lang, tc[0])]):
                t = by_t[(lang, tid)]
                if c >= k:
                    hi = min(hi, t)
                else:
                    lo = max(lo, t + 1)
            state[lang] = (lo, hi, k)
    return {lang: lo for lang, (lo, hi, k) in state.items()}


def _stats(comp: DataFrame) -> Dict[str, Tuple[int, int, int]]:
    """K-row (n, min, max) per lang off the compressed table."""
    rows = (
        comp.groupBy("lang")
        .agg(F.sum("cnt").alias("n"), F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    return {r["lang"]: (int(r["n"]), int(r["lo"]), int(r["hi"])) for r in rows}


# ---------------------------------------------------------------------------
# qn_scale_dist
# ---------------------------------------------------------------------------


def q_qn_scale_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Qn per lang — k-th smallest pairwise gap, k = C(h,2),
    h = ⌊n/2⌋+1 — by count-gaps-below value search (module docstring);
    no pair frame.  Oracle: identical to ``qn_scale``.
    """
    comp = _compressed(spark, sf_dir)
    stats = _stats(comp)
    out_schema = "lang string, n_docs bigint, h bigint, k bigint, qn_raw bigint"
    bounds: Dict[str, Tuple[int, int, int]] = {}
    ks: Dict[str, int] = {}
    for lang, (n, lo, hi) in stats.items():
        k = ((n // 2 + 1) * (n // 2)) // 2
        if k < 1:
            continue  # n ≤ 1: the scaffold emits no row either
        bounds[lang] = (0, hi - lo, k)
        ks[lang] = k
    if not bounds:
        return spark.createDataFrame([], out_schema)
    langs = spark.createDataFrame([(l,) for l in bounds], "lang string")
    comp_live = comp.join(F.broadcast(langs), "lang")

    def count_at(pivots) -> DataFrame:
        probes = comp_live.join(pivots, "lang").select(
            "lang", "tid", "x", (F.col("x") - F.col("t")).alias("w")
        )
        looked = _asof(comp_live, probes, strict=True, out="cum_w")
        return (
            comp_live.join(looked, ["lang", "x"])
            .groupBy("lang", "tid")
            .agg(
                F.sum(
                    F.col("cnt") * (F.col("cum_less") - F.col("cum_w"))
                    + F.col("cnt") * (F.col("cnt") - 1) / 2
                )
                .cast("long")
                .alias("c")
            )
        )

    ans = _search(spark, bounds, count_at)
    rows = [
        (lang, n, n // 2 + 1, ks[lang], int(ans[lang]))
        for lang, (n, lo, hi) in stats.items()
        if lang in ans
    ]
    return spark.createDataFrame(rows, out_schema)


# ---------------------------------------------------------------------------
# hodges_lehmann_dist
# ---------------------------------------------------------------------------


def q_hodges_lehmann_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HL location per lang — lower median of the Walsh sums x_i + x_j
    (i ≤ j) — by count-sums-below value search; no pair frame.
    Oracle: identical to ``hodges_lehmann``.
    """
    comp = _compressed(spark, sf_dir)
    stats = _stats(comp)
    out_schema = "lang string, n_pairs bigint, hl_x2 bigint, hl_point bigint"
    bounds: Dict[str, Tuple[int, int, int]] = {}
    ms: Dict[str, int] = {}
    for lang, (n, lo, hi) in stats.items():
        m = n * (n + 1) // 2
        bounds[lang] = (2 * lo, 2 * hi, (m + 1) // 2)
        ms[lang] = m
    if not bounds:
        return spark.createDataFrame([], out_schema)

    def count_at(pivots) -> DataFrame:
        probes = comp.join(pivots, "lang").select(
            "lang", "tid", "x", (F.col("t") - F.col("x")).alias("w"), "t"
        )
        looked = _asof(comp, probes.drop("t"), strict=False, out="cum_w")
        return (
            comp.join(looked, ["lang", "x"])
            .join(pivots, ["lang", "tid"])
            .groupBy("lang", "tid")
            .agg(
                F.sum(
                    F.when(
                        F.col("t") - F.col("x") > F.col("x"),
                        F.col("cnt")
                        * F.greatest(F.lit(0), F.col("cum_w") - F.col("cum_le")),
                    ).otherwise(F.lit(0))
                    + F.when(
                        2 * F.col("x") <= F.col("t"),
                        F.col("cnt") * (F.col("cnt") + 1) / 2,
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("c")
            )
        )

    ans = _search(spark, bounds, count_at)
    rows = [
        (lang, ms[lang], int(s), (2 * int(s) + 2) // 4) for lang, s in ans.items()
    ]
    return spark.createDataFrame(rows, out_schema)


# ---------------------------------------------------------------------------
# sn_scale_dist
# ---------------------------------------------------------------------------


def q_sn_scale_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Sn per lang — lowmed_i highmed_{j≠i} |x_i − x_j| — by value
    search on t: an anchor's highmed ≤ t iff ≥ h = ⌊n/2⌋+1 neighbours
    lie within ±t, so count-anchors-below is one windowed lookup pass;
    the smallest t reaching outer rank ⌊(n+1)/2⌋ is Sn.  No pair
    frame.  Oracle: identical to ``sn_scale``.
    """
    comp = _compressed(spark, sf_dir)
    stats = _stats(comp)
    out_schema = "lang string, n_docs bigint, sn_raw bigint"
    bounds: Dict[str, Tuple[int, int, int]] = {}
    for lang, (n, lo, hi) in stats.items():
        if n - 1 < n // 2 + 1:
            continue  # n < 3: no anchor reaches the inner rank; scaffold emits no row
        bounds[lang] = (0, hi - lo, (n + 1) // 2)
    if not bounds:
        return spark.createDataFrame([], out_schema)
    hs = spark.createDataFrame(
        [(lang, stats[lang][0] // 2 + 1) for lang in bounds], "lang string, h long"
    )
    comp_live = comp.join(F.broadcast(hs), "lang")

    def count_at(pivots) -> DataFrame:
        pr_hi = comp_live.join(pivots, "lang").select(
            "lang", "tid", "x", (F.col("x") + F.col("t")).alias("w")
        )
        pr_lo = comp_live.join(pivots, "lang").select(
            "lang", "tid", "x", (F.col("x") - F.col("t")).alias("w")
        )
        hi_cum = _asof(comp_live, pr_hi, strict=False, out="cum_hi")
        lo_cum = _asof(comp_live, pr_lo, strict=True, out="cum_lo")
        return (
            comp_live.join(hi_cum, ["lang", "x"])
            .join(lo_cum, ["lang", "x", "tid"])
            .groupBy("lang", "tid")
            .agg(
                F.sum(
                    F.when(
                        F.col("cum_hi") - F.col("cum_lo") - 1 >= F.col("h"),
                        F.col("cnt"),
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("c")
            )
        )

    ans = _search(spark, bounds, count_at)
    rows = [(lang, stats[lang][0], int(t)) for lang, t in ans.items()]
    return spark.createDataFrame(rows, out_schema)


ROBUSTSCALE_DIST_QUERIES = {
    "hodges_lehmann_dist": q_hodges_lehmann_dist,
    "qn_scale_dist": q_qn_scale_dist,
    "sn_scale_dist": q_sn_scale_dist,
}

ROBUSTSCALE_DIST_ORACLES = {
    "hodges_lehmann_dist": ORACLE_HODGES_LEHMANN,
    "qn_scale_dist": ORACLE_QN_SCALE,
    "sn_scale_dist": ORACLE_SN_SCALE,
}

_q.QUERIES.update(ROBUSTSCALE_DIST_QUERIES)
_q.ORACLES.update(ROBUSTSCALE_DIST_ORACLES)
