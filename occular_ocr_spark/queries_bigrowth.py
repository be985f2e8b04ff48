"""BI growth-reporting catalog, round 4 (wave 82): five classical
business-calendar operators over monthly revenue (Σ⌊l_extendedprice⌋
by ship month) — the MoM/YoY/MAT/fiscal reports every warehouse
serves, each exact-integer with signed half-up growth rationals.

* ``mom_growth_report`` — complete month spine (empty months are 0,
  the ``ts_gapfill`` doctrine at month grain): revenue, previous
  month, signed delta, and signed MoM growth micro
  (sign(Δ)·halfup(10⁶·|Δ|, prev); 0 with a flag when prev = 0).
* ``yoy_growth_report`` — the same-month-last-year comparison via a
  month-key self-join on month − 12 (add_months / INTERVAL
  arithmetic, exact on first-of-month keys): signed YoY growth micro
  for months with a year-ago baseline.
* ``moving_annual_total`` — MAT: the 12-month rolling revenue sum
  (ROWS 11 PRECEDING over the complete spine, so ROWS == RANGE) with
  the window fill count to mark partial leading windows.
* ``fiscal_quarter_rollup`` — fiscal calendar with FY starting July:
  FY and fiscal quarter labels from month+6 arithmetic, revenue per
  (FY, quarter), and each quarter's half-up micro share of its FY.
* ``topk_revenue_movers`` — the top {_MOVERS_K} (part, month) pairs
  by |MoM revenue change| — per-part month series with lag over the
  bounded per-part month frame, global top-K via
  TakeOrderedAndProject with a deterministic
  (|Δ| DESC, part, month) tie-break, never a global sort.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_bigrowth_wave.py.

Cross-engine float policy: pure exact BIGINT half-up micro; signed
growths are sign-split CASEs over the non-negative half-up kernel —
no floating point in this wave.

Scale notes: one lineitem partial-agg scan to the ≤#months (or
#parts×#months) frame; the month spine expands from a 1-row min/max
aggregate; windows order only month frames (≤ a century of months);
the movers top-K is TakeOrdered, not a sort; joins after the partial
agg are broadcast-sized.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_MOVERS_K = 10


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete month spine with revenue (0 on empty months)."""
    m = (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(date_trunc('month', l_shipdate) AS DATE) AS month",
            "CAST(floor(l_extendedprice) AS BIGINT) AS r",
        )
        .groupBy("month")
        .agg(F.sum("r").cast("long").alias("revenue"))
    )
    span = m.agg(F.min("month").alias("lo"), F.max("month").alias("hi"))
    cal = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias("month")
    )
    return cal.join(m, "month", "left").selectExpr(
        "month", "coalesce(revenue, 0L) AS revenue"
    )


_MONTHLY_SQL = """
m AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS revenue
  FROM lineitem GROUP BY date_trunc('month', l_shipdate)),
span AS (SELECT min(month) AS lo, max(month) AS hi FROM m),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH))
         AS DATE) AS month FROM span),
monthly AS (
  SELECT c.month, coalesce(x.revenue, 0) AS revenue
  FROM cal c LEFT JOIN m x ON x.month = c.month)
"""

# signed growth micro: sign(cur-prev) * halfup(1e6*|cur-prev|, prev)
_GROWTH = (
    "CASE WHEN {prev} > 0 THEN"
    " CASE WHEN {cur} >= {prev} THEN"
    "  CAST((2000000 * ({cur} - {prev}) + {prev}) {div} (2 * {prev})"
    "   AS BIGINT)"
    " ELSE"
    "  -CAST((2000000 * ({prev} - {cur}) + {prev}) {div} (2 * {prev})"
    "   AS BIGINT)"
    " END ELSE 0 END"
)


def _growth(cur: str, prev: str, dialect: str) -> str:
    return _GROWTH.format(
        cur=cur, prev=prev, div="DIV" if dialect == "spark" else "//"
    )


# ---------------------------------------------------------------------------
# mom_growth_report
# ---------------------------------------------------------------------------


def q_mom_growth_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas and signed growth micro over
    the complete month spine."""
    d = _monthly(spark, sf_dir)
    lagd = d.selectExpr(
        "month",
        "revenue",
        "lag(revenue) OVER (ORDER BY month) AS prev_revenue",
    ).where("prev_revenue IS NOT NULL")
    return lagd.selectExpr(
        "month",
        "revenue",
        "prev_revenue",
        "revenue - prev_revenue AS delta",
        f"CAST({_growth('revenue', 'prev_revenue', 'spark')} AS BIGINT)"
        " AS growth_micro",
        "CASE WHEN prev_revenue = 0 THEN 1L ELSE 0L END AS prev_zero",
    )


ORACLE_MOM_GROWTH_REPORT = f"""
WITH {_MONTHLY_SQL},
lagd AS (
  SELECT month, revenue,
         lag(revenue) OVER (ORDER BY month) AS prev_revenue
  FROM monthly)
SELECT month, revenue, prev_revenue,
       revenue - prev_revenue AS delta,
       CAST({_growth('revenue', 'prev_revenue', 'duck')} AS BIGINT)
         AS growth_micro,
       CAST(CASE WHEN prev_revenue = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS prev_zero
FROM lagd WHERE prev_revenue IS NOT NULL
"""


# ---------------------------------------------------------------------------
# yoy_growth_report
# ---------------------------------------------------------------------------


def q_yoy_growth_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-month-last-year comparison via a month−12 self-join on
    the bounded month frame."""
    d = _q._persist_tracked(_monthly(spark, sf_dir))
    prev = d.selectExpr(
        "add_months(month, 12) AS month", "revenue AS prev_revenue"
    )
    return d.join(prev, "month").selectExpr(
        "month",
        "revenue",
        "prev_revenue",
        "revenue - prev_revenue AS delta",
        f"CAST({_growth('revenue', 'prev_revenue', 'spark')} AS BIGINT)"
        " AS yoy_growth_micro",
    )


ORACLE_YOY_GROWTH_REPORT = f"""
WITH {_MONTHLY_SQL},
prev AS (
  SELECT CAST(month + INTERVAL 12 MONTH AS DATE) AS month,
         revenue AS prev_revenue
  FROM monthly)
SELECT d.month, d.revenue, p.prev_revenue,
       d.revenue - p.prev_revenue AS delta,
       CAST({_growth('d.revenue', 'p.prev_revenue', 'duck')} AS BIGINT)
         AS yoy_growth_micro
FROM monthly d JOIN prev p ON p.month = d.month
"""


# ---------------------------------------------------------------------------
# moving_annual_total
# ---------------------------------------------------------------------------


def q_moving_annual_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-month rolling revenue (MAT) over the complete spine with
    the window fill count."""
    return _monthly(spark, sf_dir).selectExpr(
        "month",
        "revenue",
        "CAST(sum(revenue) OVER (ORDER BY month ROWS BETWEEN 11"
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS mat",
        "CAST(count(*) OVER (ORDER BY month ROWS BETWEEN 11 PRECEDING"
        " AND CURRENT ROW) AS BIGINT) AS months_in_window",
    )


ORACLE_MOVING_ANNUAL_TOTAL = f"""
WITH {_MONTHLY_SQL}
SELECT month, revenue,
       CAST(sum(revenue) OVER (ORDER BY month ROWS BETWEEN 11
         PRECEDING AND CURRENT ROW) AS BIGINT) AS mat,
       CAST(count(*) OVER (ORDER BY month ROWS BETWEEN 11 PRECEDING
         AND CURRENT ROW) AS BIGINT) AS months_in_window
FROM monthly
"""


# ---------------------------------------------------------------------------
# fiscal_quarter_rollup
# ---------------------------------------------------------------------------


def q_fiscal_quarter_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """July-start fiscal calendar: revenue per (FY, quarter) and each
    quarter's micro share of its FY."""
    d = _monthly(spark, sf_dir)
    fq = d.selectExpr(
        "CAST(year(add_months(month, 6)) AS BIGINT) AS fy",
        "CAST((month(add_months(month, 6)) - 1) DIV 3 + 1 AS BIGINT)"
        " AS fq",
        "revenue",
    ).groupBy("fy", "fq").agg(F.sum("revenue").cast("long").alias("revenue"))
    return fq.selectExpr(
        "fy",
        "fq",
        "revenue",
        "sum(revenue) OVER (PARTITION BY fy) AS fy_revenue",
    ).selectExpr(
        "fy",
        "fq",
        "revenue",
        "CAST(fy_revenue AS BIGINT) AS fy_revenue",
        "CASE WHEN fy_revenue > 0 THEN CAST((2000000 * revenue"
        " + fy_revenue) DIV (2 * fy_revenue) AS BIGINT) ELSE 0L END"
        " AS fy_share_micro",
    )


ORACLE_FISCAL_QUARTER_ROLLUP = f"""
WITH {_MONTHLY_SQL},
fq AS (
  SELECT CAST(year(CAST(month + INTERVAL 6 MONTH AS DATE)) AS BIGINT)
           AS fy,
         CAST((month(CAST(month + INTERVAL 6 MONTH AS DATE)) - 1)
              // 3 + 1 AS BIGINT) AS fq,
         CAST(sum(revenue) AS BIGINT) AS revenue
  FROM monthly
  GROUP BY 1, 2),
sh AS (
  SELECT fy, fq, revenue,
         sum(revenue) OVER (PARTITION BY fy) AS fy_revenue
  FROM fq)
SELECT fy, fq, revenue, CAST(fy_revenue AS BIGINT) AS fy_revenue,
       CASE WHEN fy_revenue > 0 THEN CAST((2000000 * revenue
         + fy_revenue) // (2 * fy_revenue) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS fy_share_micro
FROM sh
"""


# ---------------------------------------------------------------------------
# topk_revenue_movers
# ---------------------------------------------------------------------------


def q_topk_revenue_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K (part, month) pairs by |MoM revenue change| — per-part
    lag then a global TakeOrdered with deterministic tie-break."""
    pm = (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_partkey",
            "CAST(date_trunc('month', l_shipdate) AS DATE) AS month",
            "CAST(floor(l_extendedprice) AS BIGINT) AS r",
        )
        .groupBy("l_partkey", "month")
        .agg(F.sum("r").cast("long").alias("revenue"))
    )
    lagd = pm.selectExpr(
        "l_partkey",
        "month",
        "revenue",
        "lag(revenue) OVER (PARTITION BY l_partkey ORDER BY month)"
        " AS prev_revenue",
    ).where("prev_revenue IS NOT NULL")
    deltas = lagd.selectExpr(
        "l_partkey",
        "month",
        "revenue",
        "prev_revenue",
        "abs(revenue - prev_revenue) AS abs_delta",
    )
    return deltas.orderBy(
        F.desc("abs_delta"), F.asc("l_partkey"), F.asc("month")
    ).limit(_MOVERS_K)


ORACLE_TOPK_REVENUE_MOVERS = f"""
WITH pm AS (
  SELECT l_partkey,
         CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS revenue
  FROM lineitem GROUP BY l_partkey, date_trunc('month', l_shipdate)),
lagd AS (
  SELECT l_partkey, month, revenue,
         lag(revenue) OVER (PARTITION BY l_partkey ORDER BY month)
           AS prev_revenue
  FROM pm)
SELECT l_partkey, month, revenue, prev_revenue,
       CAST(abs(revenue - prev_revenue) AS BIGINT) AS abs_delta
FROM lagd WHERE prev_revenue IS NOT NULL
ORDER BY abs_delta DESC, l_partkey, month
LIMIT {_MOVERS_K}
"""


BIGROWTH_QUERIES = {
    "mom_growth_report": q_mom_growth_report,
    "yoy_growth_report": q_yoy_growth_report,
    "moving_annual_total": q_moving_annual_total,
    "fiscal_quarter_rollup": q_fiscal_quarter_rollup,
    "topk_revenue_movers": q_topk_revenue_movers,
}

BIGROWTH_ORACLES = {
    "mom_growth_report": ORACLE_MOM_GROWTH_REPORT,
    "yoy_growth_report": ORACLE_YOY_GROWTH_REPORT,
    "moving_annual_total": ORACLE_MOVING_ANNUAL_TOTAL,
    "fiscal_quarter_rollup": ORACLE_FISCAL_QUARTER_ROLLUP,
    "topk_revenue_movers": ORACLE_TOPK_REVENUE_MOVERS,
}

_q.QUERIES.update(BIGROWTH_QUERIES)
_q.ORACLES.update(BIGROWTH_ORACLES)
