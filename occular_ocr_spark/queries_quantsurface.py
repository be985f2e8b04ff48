"""Quantile-surface catalog, round 4 (wave 70): five operators that
complete the order-statistics story around the exact-rank
group_quantiles family — the interpolated/derived quantile surfaces a
corpus report quotes, every one in exact integer fixed point so the
two engines cannot drift (the classic cross-engine trap —
percentile_cont interpolation differs — is avoided by computing the
interpolation OURSELVES in micro arithmetic on both sides).

* ``interpolated_quantiles`` — Type-7 (R/NumPy default) linear
  interpolation at q ∈ {_IQ_QS} micro: h = (n-1)·q, the two
  bracketing order statistics, and the interpolated value carried
  ×1e6 as an exact integer (x_lo·(1e6-frac) + x_hi·frac).
* ``qcd_dispersion`` — quartile coefficient of dispersion
  (Q3-Q1)/(Q3+Q1) per lang from exact lower-rank quartiles.
* ``midhinge_trimean`` — midhinge (Q1+Q3)/2 (×2-exact) and Tukey's
  trimean (Q1+2·Q2+Q3)/4 (×4-exact).
* ``decile_ratios`` — D9/D1 ratio (micro) and D9-D1 spread per lang.
* ``ntile_balance_audit`` — Spark's ``ntile({_NT_K})`` window REPLAYED
  against the arithmetic contract (first n mod k tiles get
  ⌈n/k⌉ rows): per (lang, tile) actual vs expected sizes and the
  match flag — pinning that both engines' ntile semantics agree.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_quantsurface_wave.py.

Cross-engine float policy: none — order statistics, micro-scaled
interpolation, and ratios are integer end-to-end (single half-up
micro divisions).

Scale notes: every rank window partitions by lang (bounded groups;
the two-pass histogram selection of group_quantiles_dist is the
documented 10^12-row form); ntile audit aggregates to k rows per
group.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_IQ_QS = [250_000, 500_000, 750_000]
_NT_K = 10

_RANKED_SQL = """
ranked AS (
  SELECT lang, n_chars AS x,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
"""


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").selectExpr(
        "lang",
        "n_chars AS x",
        "row_number() OVER (PARTITION BY lang"
        " ORDER BY n_chars, doc_id) AS rk",
        "count(*) OVER (PARTITION BY lang) AS n",
    )


def _rank_pick(spark, sf_dir, q_micro: int, alias: str) -> DataFrame:
    """Exact lower-rank quantile: value at rank max(1, ceil(q*n))."""
    return (
        _ranked(spark, sf_dir)
        .where(
            f"rk = greatest(1L, ({q_micro} * n + 999999) DIV 1000000)"
        )
        .selectExpr("lang", f"x AS {alias}")
    )


def _rank_pick_sql(q_micro: int, alias: str) -> str:
    return (
        f"SELECT lang, x AS {alias} FROM ranked"
        f" WHERE rk = greatest(1, ({q_micro} * n + 999999) // 1000000)"
    )


# ---------------------------------------------------------------------------
# interpolated_quantiles
# ---------------------------------------------------------------------------


def q_interpolated_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-7 interpolation in exact micro: h = (n-1)·q_micro,
    lo = h DIV 1e6 + 1 (1-based), frac = h mod 1e6,
    value×1e6 = x_lo·(1e6-frac) + x_hi·frac.

    Scale: one per-lang rank window; the lo/hi picks join the ≤#langs
    ×#qs bracket frame back by (lang, rank) — equi, broadcastable.
    """
    qs = spark.createDataFrame([(q,) for q in _IQ_QS], "q_micro long")
    ranked = _q._persist_tracked(_ranked(spark, sf_dir))
    brackets = (
        ranked.selectExpr("lang", "n").distinct()
        .crossJoin(F.broadcast(qs))
        .selectExpr(
            "lang",
            "q_micro",
            "(n - 1) * q_micro AS h",
        )
        .selectExpr(
            "lang",
            "q_micro",
            "CAST(h DIV 1000000 + 1 AS BIGINT) AS lo_rank",
            "CAST(h % 1000000 AS BIGINT) AS frac_micro",
        )
    )
    lo = ranked.selectExpr("lang AS l1", "rk AS r1", "x AS x_lo")
    hi = ranked.selectExpr("lang AS l2", "rk AS r2", "x AS x_hi")
    return (
        brackets.join(
            lo,
            (F.col("lang") == F.col("l1"))
            & (F.col("lo_rank") == F.col("r1")),
        )
        .join(
            hi,
            (F.col("lang") == F.col("l2"))
            & (
                F.expr(
                    "CASE WHEN frac_micro = 0 THEN lo_rank"
                    " ELSE lo_rank + 1 END"
                )
                == F.col("r2")
            ),
        )
        .selectExpr(
            "lang",
            "q_micro",
            "lo_rank",
            "frac_micro",
            "x_lo",
            "x_hi",
            "x_lo * (1000000 - frac_micro) + x_hi * frac_micro"
            " AS q_value_x1e6",
        )
    )


ORACLE_INTERPOLATED_QUANTILES = f"""
WITH {_RANKED_SQL},
qs AS (SELECT unnest(ARRAY{_IQ_QS}) AS q_micro),
brackets AS (
  SELECT g.lang, q.q_micro,
         CAST((g.n - 1) * q.q_micro // 1000000 + 1 AS BIGINT) AS lo_rank,
         CAST((g.n - 1) * q.q_micro % 1000000 AS BIGINT) AS frac_micro
  FROM (SELECT DISTINCT lang, n FROM ranked) g CROSS JOIN qs q)
SELECT b.lang, CAST(b.q_micro AS BIGINT) AS q_micro, b.lo_rank,
       b.frac_micro, lo.x AS x_lo, hi.x AS x_hi,
       lo.x * (1000000 - b.frac_micro) + hi.x * b.frac_micro
         AS q_value_x1e6
FROM brackets b
JOIN ranked lo ON lo.lang = b.lang AND lo.rk = b.lo_rank
JOIN ranked hi ON hi.lang = b.lang
  AND hi.rk = CASE WHEN b.frac_micro = 0 THEN b.lo_rank
                   ELSE b.lo_rank + 1 END
"""


# ---------------------------------------------------------------------------
# qcd_dispersion
# ---------------------------------------------------------------------------


def q_qcd_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile coefficient of dispersion (Q3-Q1)/(Q3+Q1) per lang in
    half-up micro, from exact lower-rank quartiles."""
    q1 = _rank_pick(spark, sf_dir, 250_000, "q1")
    q3 = _rank_pick(spark, sf_dir, 750_000, "q3")
    return q1.join(q3, "lang").selectExpr(
        "lang",
        "q1",
        "q3",
        "q3 - q1 AS iqr",
        "CAST((2000000 * (q3 - q1) + (q3 + q1)) DIV (2 * (q3 + q1))"
        " AS BIGINT) AS qcd_micro",
    )


ORACLE_QCD_DISPERSION = f"""
WITH {_RANKED_SQL},
q1 AS ({_rank_pick_sql(250_000, "q1")}),
q3 AS ({_rank_pick_sql(750_000, "q3")})
SELECT q1.lang, q1.q1, q3.q3, q3.q3 - q1.q1 AS iqr,
       CAST((2000000 * (q3.q3 - q1.q1) + (q3.q3 + q1.q1))
            // (2 * (q3.q3 + q1.q1)) AS BIGINT) AS qcd_micro
FROM q1 JOIN q3 ON q3.lang = q1.lang
"""


# ---------------------------------------------------------------------------
# midhinge_trimean
# ---------------------------------------------------------------------------


def q_midhinge_trimean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Midhinge (Q1+Q3)/2 carried ×2 and Tukey's trimean
    (Q1+2·Q2+Q3)/4 carried ×4 — exact integers, plus their half-up
    point values."""
    q1 = _rank_pick(spark, sf_dir, 250_000, "q1")
    q2 = _rank_pick(spark, sf_dir, 500_000, "q2")
    q3 = _rank_pick(spark, sf_dir, 750_000, "q3")
    return (
        q1.join(q2, "lang")
        .join(q3, "lang")
        .selectExpr(
            "lang",
            "q1",
            "q2",
            "q3",
            "q1 + q3 AS midhinge_x2",
            "q1 + 2 * q2 + q3 AS trimean_x4",
            "CAST((2 * (q1 + q3) + 2) DIV 4 AS BIGINT) AS midhinge",
            "CAST((2 * (q1 + 2 * q2 + q3) + 4) DIV 8 AS BIGINT)"
            " AS trimean",
        )
    )


ORACLE_MIDHINGE_TRIMEAN = f"""
WITH {_RANKED_SQL},
q1 AS ({_rank_pick_sql(250_000, "q1")}),
q2 AS ({_rank_pick_sql(500_000, "q2")}),
q3 AS ({_rank_pick_sql(750_000, "q3")})
SELECT q1.lang, q1.q1, q2.q2, q3.q3,
       q1.q1 + q3.q3 AS midhinge_x2,
       q1.q1 + 2 * q2.q2 + q3.q3 AS trimean_x4,
       CAST((2 * (q1.q1 + q3.q3) + 2) // 4 AS BIGINT) AS midhinge,
       CAST((2 * (q1.q1 + 2 * q2.q2 + q3.q3) + 4) // 8 AS BIGINT)
         AS trimean
FROM q1 JOIN q2 ON q2.lang = q1.lang JOIN q3 ON q3.lang = q1.lang
"""


# ---------------------------------------------------------------------------
# decile_ratios
# ---------------------------------------------------------------------------


def q_decile_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail spread per lang: D1, D9, D9-D1, and the D9/D1 half-up
    micro ratio."""
    d1 = _rank_pick(spark, sf_dir, 100_000, "d1")
    d9 = _rank_pick(spark, sf_dir, 900_000, "d9")
    return d1.join(d9, "lang").selectExpr(
        "lang",
        "d1",
        "d9",
        "d9 - d1 AS spread",
        "CAST((2000000 * d9 + d1) DIV (2 * d1) AS BIGINT)"
        " AS ratio_micro",
    )


ORACLE_DECILE_RATIOS = f"""
WITH {_RANKED_SQL},
d1 AS ({_rank_pick_sql(100_000, "d1")}),
d9 AS ({_rank_pick_sql(900_000, "d9")})
SELECT d1.lang, d1.d1, d9.d9, d9.d9 - d1.d1 AS spread,
       CAST((2000000 * d9.d9 + d1.d1) // (2 * d1.d1) AS BIGINT)
         AS ratio_micro
FROM d1 JOIN d9 ON d9.lang = d1.lang
"""


# ---------------------------------------------------------------------------
# ntile_balance_audit
# ---------------------------------------------------------------------------


def q_ntile_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's ntile({_NT_K}) window vs the arithmetic contract: the
    first n mod k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋.  Uses the
    REAL window function on the Spark side and pure arithmetic in the
    oracle — a cross-engine semantics pin.

    Scale: the ntile window partitions by lang; the audit aggregates
    to k rows per group.
    """
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "lang",
            f"ntile({_NT_K}) OVER (PARTITION BY lang"
            " ORDER BY n_chars, doc_id) AS tile",
        )
        .groupBy("lang", "tile")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .selectExpr(
            "lang",
            "CAST(tile AS BIGINT) AS tile",
            "n_rows",
            "CAST(sum(n_rows) OVER (PARTITION BY lang) AS BIGINT) AS n",
        )
        .selectExpr(
            "lang",
            "tile",
            "n_rows",
            f"CASE WHEN tile <= n % {_NT_K} THEN n DIV {_NT_K} + 1"
            f" ELSE n DIV {_NT_K} END AS expected_rows",
        )
        .selectExpr(
            "lang",
            "tile",
            "n_rows",
            "expected_rows",
            "n_rows = expected_rows AS matches",
        )
    )


ORACLE_NTILE_BALANCE_AUDIT = f"""
WITH tiles AS (
  SELECT lang,
         ntile({_NT_K}) OVER (PARTITION BY lang
                              ORDER BY n_chars, doc_id) AS tile
  FROM documents),
cells AS (
  SELECT lang, CAST(tile AS BIGINT) AS tile,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM tiles GROUP BY lang, tile),
with_n AS (
  SELECT lang, tile, n_rows,
         CAST(sum(n_rows) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM cells)
SELECT lang, tile, n_rows,
       CASE WHEN tile <= n % {_NT_K} THEN n // {_NT_K} + 1
            ELSE n // {_NT_K} END AS expected_rows,
       n_rows = CASE WHEN tile <= n % {_NT_K} THEN n // {_NT_K} + 1
                     ELSE n // {_NT_K} END AS matches
FROM with_n
"""


QUANTSURFACE_QUERIES = {
    "interpolated_quantiles": q_interpolated_quantiles,
    "qcd_dispersion": q_qcd_dispersion,
    "midhinge_trimean": q_midhinge_trimean,
    "decile_ratios": q_decile_ratios,
    "ntile_balance_audit": q_ntile_balance_audit,
}

QUANTSURFACE_ORACLES = {
    "interpolated_quantiles": ORACLE_INTERPOLATED_QUANTILES,
    "qcd_dispersion": ORACLE_QCD_DISPERSION,
    "midhinge_trimean": ORACLE_MIDHINGE_TRIMEAN,
    "decile_ratios": ORACLE_DECILE_RATIOS,
    "ntile_balance_audit": ORACLE_NTILE_BALANCE_AUDIT,
}

_q.QUERIES.update(QUANTSURFACE_QUERIES)
_q.ORACLES.update(QUANTSURFACE_ORACLES)
