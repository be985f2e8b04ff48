"""Robust location/scale estimator catalog, round 4 (wave 64): five
classical robust statistics over per-lang document lengths — the
estimators a corpus profiler should quote instead of mean/stddev when
lengths are heavy-tailed (they are).  All are EXACT integer rank
selections — no float path exists in any of them.

* ``hodges_lehmann`` — the HL location estimate: lower median of the
  Walsh averages (x_i+x_j)/2 over i ≤ j, carried ×2 as an exact
  integer (``hl_x2``) plus its half-up point value.
* ``qn_scale`` — Rousseeuw-Croux Qn (raw, unscaled): the k-th order
  statistic of the C(n,2) pairwise gaps, k = C(h,2), h = ⌊n/2⌋+1 —
  the 50%-breakdown scale that needs no location estimate.
* ``sn_scale`` — Rousseeuw-Croux Sn (raw): lowmed_i highmed_j
  |x_i - x_j| — the nested-median scale, exact by two rank windows.
* ``shorth_interval`` — the shortest half: minimal-width window
  containing h = ⌊n/2⌋+1 sorted values (ties → lowest start), whose
  midpoint is the LMS location estimate (carried ×2 exact).
* ``gini_mean_diff`` — mean pairwise gap E|x_i - x_j|, computed by
  the sorted-rank identity Σ(2·rk - n - 1)·x — O(n log n), no pair
  materialization — then one half-up micro division.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_robustscale_wave.py.

Cross-engine float policy: none needed — order statistics and integer
sums end-to-end; the only divisions are single half-up micro/half
steps at the very end.

Scale notes: hodges_lehmann / qn_scale / sn_scale materialize the
O(n²) per-lang pair frame — they are ORACLE SCAFFOLDS, not the
production path.  The production twins exist in
queries_robustscale_dist.py (``hodges_lehmann_dist`` /
``qn_scale_dist`` / ``sn_scale_dist``): binary-search-over-value +
count-pairs-below selection on a per-(lang, value) compressed table,
verified against the SAME oracles — a 10⁹-row lang group is ~60
bounded micro-jobs there vs a 10¹⁸-pair frame here.  The scaffolds
stay catalog-gated (they double-check the twins bit-for-bit) but are
excluded from the bench headline (bench.py SCAFFOLD_ENTRIES).  shorth
and gini_mean_diff are already O(n log n): one per-lang sort window
plus arithmetic — production-grade as-is.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t


def _vals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").selectExpr(
        "lang", "doc_id", "n_chars AS x"
    )


_VALS_SQL = "vals AS (SELECT lang, doc_id, n_chars AS x FROM documents)"


# ---------------------------------------------------------------------------
# hodges_lehmann
# ---------------------------------------------------------------------------


def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HL location per lang: lower median of Walsh sums x_i + x_j
    (i ≤ j by doc_id), exact; point value is one half-up halving.

    ORACLE SCAFFOLD — NOT the production HL path: materializes the
    O(n²) per-lang Walsh pair frame.  Production: the bit-identical
    ``hodges_lehmann_dist`` (queries_robustscale_dist.py), value
    search + count-pairs-below, no pair frame.
    """
    v = _q._persist_tracked(_vals(spark, sf_dir))
    a = v.selectExpr("lang", "doc_id AS ia", "x AS xa")
    b = v.selectExpr("lang AS lb", "doc_id AS ib", "x AS xb")
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lb")) & (F.col("ia") <= F.col("ib")),
        )
        .selectExpr("lang", "xa + xb AS w")
        .selectExpr(
            "lang",
            "w",
            "row_number() OVER (PARTITION BY lang ORDER BY w) AS rk",
            "count(*) OVER (PARTITION BY lang) AS m",
        )
        .where("rk = (m + 1) DIV 2")
        .selectExpr(
            "lang",
            "m AS n_pairs",
            "w AS hl_x2",
            "CAST((2 * w + 2) DIV 4 AS BIGINT) AS hl_point",
        )
    )


ORACLE_HODGES_LEHMANN = f"""
WITH {_VALS_SQL},
walsh AS (
  SELECT a.lang, a.x + b.x AS w
  FROM vals a JOIN vals b
    ON b.lang = a.lang AND a.doc_id <= b.doc_id),
ranked AS (
  SELECT lang, w,
         row_number() OVER (PARTITION BY lang ORDER BY w) AS rk,
         count(*) OVER (PARTITION BY lang) AS m
  FROM walsh)
SELECT lang, CAST(m AS BIGINT) AS n_pairs, CAST(w AS BIGINT) AS hl_x2,
       CAST((2 * w + 2) // 4 AS BIGINT) AS hl_point
FROM ranked WHERE rk = (m + 1) // 2
"""


# ---------------------------------------------------------------------------
# qn_scale
# ---------------------------------------------------------------------------


def q_qn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Qn per lang: k-th smallest of the C(n,2) pairwise gaps,
    k = C(h,2), h = ⌊n/2⌋+1 (ties broken by gap value — rank
    selection of a value is tie-stable).

    ORACLE SCAFFOLD — NOT the production Qn path: materializes the
    O(n²) per-lang gap frame.  Production: the bit-identical
    ``qn_scale_dist`` (queries_robustscale_dist.py), value search +
    count-gaps-below, no pair frame.
    """
    v = _q._persist_tracked(_vals(spark, sf_dir))
    n_of = v.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    a = v.selectExpr("lang", "doc_id AS ia", "x AS xa")
    b = v.selectExpr("lang AS lb", "doc_id AS ib", "x AS xb")
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lb")) & (F.col("ia") < F.col("ib")),
        )
        .selectExpr("lang", "abs(xa - xb) AS d")
        .selectExpr(
            "lang",
            "d",
            "row_number() OVER (PARTITION BY lang ORDER BY d) AS rk",
        )
        .join(F.broadcast(n_of), "lang")
        .where(
            "rk = ((n DIV 2 + 1) * (n DIV 2)) DIV 2"
        )
        .selectExpr(
            "lang",
            "n AS n_docs",
            "n DIV 2 + 1 AS h",
            "((n DIV 2 + 1) * (n DIV 2)) DIV 2 AS k",
            "d AS qn_raw",
        )
    )


ORACLE_QN_SCALE = f"""
WITH {_VALS_SQL},
n_of AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY lang),
gaps AS (
  SELECT a.lang, abs(a.x - b.x) AS d
  FROM vals a JOIN vals b
    ON b.lang = a.lang AND a.doc_id < b.doc_id),
ranked AS (
  SELECT lang, d,
         row_number() OVER (PARTITION BY lang ORDER BY d) AS rk
  FROM gaps)
SELECT r.lang, n.n AS n_docs,
       n.n // 2 + 1 AS h,
       ((n.n // 2 + 1) * (n.n // 2)) // 2 AS k,
       CAST(r.d AS BIGINT) AS qn_raw
FROM ranked r JOIN n_of n ON n.lang = r.lang
WHERE r.rk = ((n.n // 2 + 1) * (n.n // 2)) // 2
"""


# ---------------------------------------------------------------------------
# sn_scale
# ---------------------------------------------------------------------------


def q_sn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Sn per lang: lowmed over i of (highmed over j≠i of
    |x_i - x_j|) — highmed rank ⌊n/2⌋+1 of the n-1 gaps per anchor,
    lowmed rank ⌊(n+1)/2⌋ across anchors.

    ORACLE SCAFFOLD — NOT the production Sn path: materializes the
    full i≠j pair frame with nested rank windows.  Production: the
    bit-identical ``sn_scale_dist`` (queries_robustscale_dist.py),
    value search over anchor reach counts, no pair frame.
    """
    v = _q._persist_tracked(_vals(spark, sf_dir))
    n_of = v.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    a = v.selectExpr("lang", "doc_id AS ia", "x AS xa")
    b = v.selectExpr("lang AS lb", "doc_id AS ib", "x AS xb")
    inner = (
        a.join(
            b,
            (F.col("lang") == F.col("lb")) & (F.col("ia") != F.col("ib")),
        )
        .selectExpr("lang", "ia", "abs(xa - xb) AS d")
        .selectExpr(
            "lang",
            "ia",
            "d",
            "row_number() OVER (PARTITION BY lang, ia ORDER BY d) AS rk",
        )
        .join(F.broadcast(n_of), "lang")
        .where("rk = n DIV 2 + 1")
        .selectExpr("lang", "n", "d AS himed")
    )
    return (
        inner.selectExpr(
            "lang",
            "n",
            "himed",
            "row_number() OVER (PARTITION BY lang ORDER BY himed) AS rk",
        )
        .where("rk = (n + 1) DIV 2")
        .selectExpr("lang", "n AS n_docs", "himed AS sn_raw")
    )


ORACLE_SN_SCALE = f"""
WITH {_VALS_SQL},
n_of AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY lang),
gaps AS (
  SELECT a.lang, a.doc_id AS ia, abs(a.x - b.x) AS d
  FROM vals a JOIN vals b
    ON b.lang = a.lang AND a.doc_id <> b.doc_id),
inner_rk AS (
  SELECT g.lang, g.ia, g.d,
         row_number() OVER (PARTITION BY g.lang, g.ia ORDER BY g.d) AS rk,
         n.n
  FROM gaps g JOIN n_of n ON n.lang = g.lang),
himeds AS (
  SELECT lang, n, d AS himed FROM inner_rk WHERE rk = n // 2 + 1),
outer_rk AS (
  SELECT lang, n, himed,
         row_number() OVER (PARTITION BY lang ORDER BY himed) AS rk
  FROM himeds)
SELECT lang, n AS n_docs, CAST(himed AS BIGINT) AS sn_raw
FROM outer_rk WHERE rk = (n + 1) // 2
"""


# ---------------------------------------------------------------------------
# shorth_interval
# ---------------------------------------------------------------------------


def q_shorth_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest half per lang: the minimal-width window over h =
    ⌊n/2⌋+1 consecutive sorted values (ties → lowest start rank);
    midpoint ×2 is the LMS location.

    Scale: one per-lang sort window + a rank-offset self-join on
    (lang, rk) — equi, partition-parallel — then a 1-row-per-lang
    argmin window.
    """
    v = _vals(spark, sf_dir)
    ranked = _q._persist_tracked(
        v.selectExpr(
            "lang",
            "x",
            "row_number() OVER (PARTITION BY lang"
            " ORDER BY x, doc_id) AS rk",
            "count(*) OVER (PARTITION BY lang) AS n",
        )
    )
    lo = ranked.selectExpr("lang", "x AS lo", "rk", "n", "n DIV 2 + 1 AS h")
    hi = ranked.selectExpr(
        "lang AS l2", "x AS hi", "rk - (n DIV 2 + 1) + 1 AS rk2"
    )
    return (
        lo.join(
            hi,
            (F.col("lang") == F.col("l2")) & (F.col("rk") == F.col("rk2")),
        )
        .selectExpr(
            "lang",
            "n",
            "h",
            "rk",
            "lo",
            "hi",
            "hi - lo AS width",
            "row_number() OVER (PARTITION BY lang"
            " ORDER BY hi - lo, rk) AS pick",
        )
        .where("pick = 1")
        .selectExpr(
            "lang",
            "n AS n_docs",
            "h",
            "lo",
            "hi",
            "width",
            "lo + hi AS mid_x2",
        )
    )


ORACLE_SHORTH_INTERVAL = f"""
WITH {_VALS_SQL},
ranked AS (
  SELECT lang, x,
         row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM vals),
windows AS (
  SELECT a.lang, a.n, a.n // 2 + 1 AS h, a.rk, a.x AS lo, b.x AS hi,
         b.x - a.x AS width
  FROM ranked a JOIN ranked b
    ON b.lang = a.lang AND b.rk = a.rk + (a.n // 2 + 1) - 1),
picked AS (
  SELECT lang, n, h, lo, hi, width,
         row_number() OVER (PARTITION BY lang ORDER BY width, rk) AS pick
  FROM windows)
SELECT lang, CAST(n AS BIGINT) AS n_docs, CAST(h AS BIGINT) AS h,
       CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
       CAST(width AS BIGINT) AS width,
       CAST(lo + hi AS BIGINT) AS mid_x2
FROM picked WHERE pick = 1
"""


# ---------------------------------------------------------------------------
# gini_mean_diff
# ---------------------------------------------------------------------------


def q_gini_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini mean difference per lang via the sorted-rank identity
    Σ_{{i<j}} |x_i - x_j| = Σ_i (2·rk_i - n - 1)·x_(i): one sort
    window, one partial agg, one half-up micro mean over the
    n(n-1)/2 pairs — the O(n²) kernel without the pairs.
    """
    return (
        _vals(spark, sf_dir)
        .selectExpr(
            "lang",
            "x",
            "row_number() OVER (PARTITION BY lang"
            " ORDER BY x, doc_id) AS rk",
            "count(*) OVER (PARTITION BY lang) AS n",
        )
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.sum(F.expr("(2 * rk - n - 1) * x")).cast("long").alias("s"),
        )
        .selectExpr(
            "lang",
            "n_docs",
            "s AS gap_sum",
            "CAST((2 * 2000000 * s + n_docs * (n_docs - 1))"
            " DIV (2 * n_docs * (n_docs - 1)) AS BIGINT) AS gmd_micro",
        )
    )


ORACLE_GINI_MEAN_DIFF = f"""
WITH {_VALS_SQL},
ranked AS (
  SELECT lang, x,
         row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM vals),
agg AS (
  SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
         CAST(sum((2 * rk - n - 1) * x) AS BIGINT) AS s
  FROM ranked GROUP BY lang)
SELECT lang, n_docs, s AS gap_sum,
       CAST((2 * 2000000 * s + n_docs * (n_docs - 1))
            // (2 * n_docs * (n_docs - 1)) AS BIGINT) AS gmd_micro
FROM agg
"""


ROBUSTSCALE_QUERIES = {
    "hodges_lehmann": q_hodges_lehmann,
    "qn_scale": q_qn_scale,
    "sn_scale": q_sn_scale,
    "shorth_interval": q_shorth_interval,
    "gini_mean_diff": q_gini_mean_diff,
}

ROBUSTSCALE_ORACLES = {
    "hodges_lehmann": ORACLE_HODGES_LEHMANN,
    "qn_scale": ORACLE_QN_SCALE,
    "sn_scale": ORACLE_SN_SCALE,
    "shorth_interval": ORACLE_SHORTH_INTERVAL,
    "gini_mean_diff": ORACLE_GINI_MEAN_DIFF,
}

_q.QUERIES.update(ROBUSTSCALE_QUERIES)
_q.ORACLES.update(ROBUSTSCALE_ORACLES)
