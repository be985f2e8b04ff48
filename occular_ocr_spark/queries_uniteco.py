"""Unit-economics catalog, round 4 (wave 89): five SaaS-style
cohort/LTV operators over customer order revenue — the reporting
suite (cohort LTV, CAC payback, retention fits, the ARPU triangle,
NRR/GRR) that sits on top of the wave-82 growth and the
cohort-retention entries.  Customer-month revenue = Σ⌊o_totalprice⌋
by (o_custkey, order month); a customer's cohort is its first order
month; age = months since cohort.

* ``cohort_ltv_table`` — per cohort: size, observed ages, the
  undiscounted revenue-per-member sum, and the discounted LTV
  Σ_age ARPU_age·δ^age at δ = {_LTV_DELTA} (the discount power is a
  row-local IEEE ``power`` on exact integers, micro-quantized — the
  ``bloom_size_calibration`` cross-engine precedent).
* ``payback_period`` — per cohort: the data-derived CAC proxy
  (2× the corpus mean customer-month revenue, exact rational micro)
  and the first age whose cumulative per-member revenue covers it
  (-1 if never inside the horizon).
* ``retention_curve_fit`` — per cohort: the geometric-retention MLE
  p̂ = Σ_k active_{{k+1}} / Σ_k active_k (exact rational micro, the
  survived-transitions over exposures estimator) plus the raw
  exposure/survival counts.
* ``arpu_age_triangle`` — the cohort triangle transposed: per age,
  how many cohorts can observe it, members active, exact-rational
  mean ARPU micro — the age curve every LTV model consumes.
* ``nrr_grr_month`` — per month m ≥ 2: net revenue retention
  (rev_m of customers active in m−1 over their rev_{{m−1}}) and gross
  (each customer capped at prior revenue — contraction only), both
  exact rational micro.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_uniteco_wave.py.

Cross-engine float policy: all counts/revenues/rationals exact BIGINT
half-up micro; the one float (δ^age) is an identical row-local IEEE
power on constants, micro-quantized.

Scale notes: one orders partial-agg shuffle to (customer, month);
cohorts via a min-month partial agg joined back on the customer key
(same hash partitioning reused); every window orders the bounded
(cohort × age) or month frames; NRR joins month m to m−1 per
customer via an add_months equi-join on the bounded customer-month
frame.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_LTV_DELTA = "0.99"


def _cm_sql(dialect: str) -> str:
    months_between = (
        "CAST(months_between(cm.month, co.cohort) AS BIGINT)"
        if dialect == "spark"
        else "CAST(datediff('month', co.cohort, cm.month) AS BIGINT)"
    )
    return f"""
cm AS (
  SELECT o_custkey AS cust,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY o_custkey, date_trunc('month', o_orderdate)),
co AS (
  SELECT cust, min(month) AS cohort FROM cm GROUP BY cust),
cma AS (
  SELECT cm.cust, co.cohort, cm.month, cm.rev,
         {months_between} AS age
  FROM cm JOIN co ON co.cust = cm.cust)
"""


# ---------------------------------------------------------------------------
# cohort_ltv_table
# ---------------------------------------------------------------------------


def _ltv_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_cm_sql(dialect)},
size_ AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
  FROM co GROUP BY cohort),
per_age AS (
  SELECT cohort, age, CAST(sum(rev) AS BIGINT) AS rev_age
  FROM cma GROUP BY cohort, age),
scored AS (
  SELECT p.cohort, s.cohort_size, p.age, p.rev_age,
         CAST((2000000 * p.rev_age + s.cohort_size)
              {intdiv} (2 * s.cohort_size) AS BIGINT) AS arpu_micro,
         CAST(floor(CAST((2000000 * p.rev_age + s.cohort_size)
              {intdiv} (2 * s.cohort_size) AS DOUBLE)
              * power(CAST({_LTV_DELTA} AS DOUBLE),
                      CAST(p.age AS DOUBLE)) + 0.5) AS BIGINT)
           AS disc_arpu_micro
  FROM per_age p JOIN size_ s ON s.cohort = p.cohort)
SELECT cohort,
       CAST(max(cohort_size) AS BIGINT) AS cohort_size,
       CAST(count(*) AS BIGINT) AS ages_observed,
       CAST(sum(arpu_micro) AS BIGINT) AS ltv_undiscounted_micro,
       CAST(sum(disc_arpu_micro) AS BIGINT) AS ltv_discounted_micro
FROM scored GROUP BY cohort
"""


def q_cohort_ltv_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per cohort: discounted and undiscounted per-member LTV."""
    _q._register_views(spark, sf_dir, ["orders"])
    return spark.sql(_ltv_sql("spark"))


ORACLE_COHORT_LTV_TABLE = _ltv_sql("duck")


# ---------------------------------------------------------------------------
# payback_period
# ---------------------------------------------------------------------------


def _payback_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_cm_sql(dialect)},
cac AS (
  SELECT CAST(2 * ((2000000 * CAST(sum(rev) AS {('DECIMAL(38,0)' if dialect == 'spark' else 'HUGEINT')}) + count(*))
              {intdiv} (2 * count(*))) AS BIGINT) AS cac_micro
  FROM cm),
size_ AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
  FROM co GROUP BY cohort),
per_age AS (
  SELECT cohort, age, CAST(sum(rev) AS BIGINT) AS rev_age
  FROM cma GROUP BY cohort, age),
cum AS (
  SELECT p.cohort, s.cohort_size, p.age,
         CAST((2000000 * sum(p.rev_age) OVER (PARTITION BY p.cohort
           ORDER BY p.age ROWS BETWEEN UNBOUNDED PRECEDING AND
           CURRENT ROW) + s.cohort_size) {intdiv} (2 * s.cohort_size)
           AS BIGINT) AS cum_arpu_micro
  FROM per_age p JOIN size_ s ON s.cohort = p.cohort),
hit AS (
  SELECT c.cohort,
         CAST(min(c.age) AS BIGINT) AS payback_age
  FROM cum c CROSS JOIN cac x
  WHERE c.cum_arpu_micro >= x.cac_micro
  GROUP BY c.cohort)
SELECT s.cohort, s.cohort_size,
       (SELECT cac_micro FROM cac) AS cac_micro,
       coalesce(h.payback_age, -1) AS payback_age
FROM size_ s LEFT JOIN hit h ON h.cohort = s.cohort
"""


def q_payback_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First age whose cumulative per-member revenue covers the
    data-derived CAC proxy; -1 if never."""
    _q._register_views(spark, sf_dir, ["orders"])
    return spark.sql(_payback_sql("spark"))


ORACLE_PAYBACK_PERIOD = _payback_sql("duck")


# ---------------------------------------------------------------------------
# retention_curve_fit
# ---------------------------------------------------------------------------


def _retfit_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_cm_sql(dialect)},
act AS (
  SELECT cohort, age, CAST(count(*) AS BIGINT) AS active
  FROM cma GROUP BY cohort, age),
pairs AS (
  SELECT a.cohort,
         CAST(sum(a.active) AS BIGINT) AS exposures,
         CAST(sum(coalesce(b.active, 0)) AS BIGINT) AS survived
  FROM act a LEFT JOIN act b
    ON b.cohort = a.cohort AND b.age = a.age + 1
  GROUP BY a.cohort)
SELECT cohort, exposures, survived,
       CAST((2000000 * survived + exposures) {intdiv} (2 * exposures)
            AS BIGINT) AS p_hat_micro
FROM pairs
"""


def q_retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric-retention MLE per cohort from survived transitions
    over exposures."""
    _q._register_views(spark, sf_dir, ["orders"])
    return spark.sql(_retfit_sql("spark"))


ORACLE_RETENTION_CURVE_FIT = _retfit_sql("duck")


# ---------------------------------------------------------------------------
# arpu_age_triangle
# ---------------------------------------------------------------------------


def _triangle_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_cm_sql(dialect)}
SELECT age,
       CAST(count(DISTINCT cohort) AS BIGINT) AS cohorts_observing,
       CAST(count(*) AS BIGINT) AS member_months,
       CAST(sum(rev) AS BIGINT) AS revenue,
       CAST((2000000 * sum(rev) + count(*)) {intdiv} (2 * count(*))
            AS BIGINT) AS mean_rev_micro
FROM cma GROUP BY age
"""


def q_arpu_age_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The age curve across cohorts: observers, active member-months,
    exact mean revenue micro per age."""
    _q._register_views(spark, sf_dir, ["orders"])
    return spark.sql(_triangle_sql("spark"))


ORACLE_ARPU_AGE_TRIANGLE = _triangle_sql("duck")


# ---------------------------------------------------------------------------
# nrr_grr_month
# ---------------------------------------------------------------------------


def _nrr_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        next_a = "add_months(a.month, 1)"
        next_prev = "add_months(prev_month, 1)"
    else:
        next_a = "CAST(a.month + INTERVAL 1 MONTH AS DATE)"
        next_prev = "CAST(prev_month + INTERVAL 1 MONTH AS DATE)"
    return f"""
WITH {_cm_sql(dialect)},
link AS (
  SELECT a.month AS prev_month, b.month AS month, a.cust,
         a.rev AS prev_rev, coalesce(b.rev, 0) AS cur_rev
  FROM cm a LEFT JOIN cm b
    ON b.cust = a.cust AND b.month = {next_a}),
agg AS (
  SELECT CAST({next_prev} AS DATE) AS month,
         CAST(sum(prev_rev) AS BIGINT) AS base_rev,
         CAST(sum(cur_rev) AS BIGINT) AS retained_rev,
         CAST(sum(least(cur_rev, prev_rev)) AS BIGINT) AS capped_rev
  FROM link GROUP BY prev_month)
SELECT month, base_rev, retained_rev, capped_rev,
       CAST((2000000 * retained_rev + base_rev) {intdiv}
            (2 * base_rev) AS BIGINT) AS nrr_micro,
       CAST((2000000 * capped_rev + base_rev) {intdiv}
            (2 * base_rev) AS BIGINT) AS grr_micro
FROM agg
"""


def q_nrr_grr_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net and gross revenue retention per month from the
    customer-month self-join on month−1."""
    _q._register_views(spark, sf_dir, ["orders"])
    return spark.sql(_nrr_sql("spark"))


ORACLE_NRR_GRR_MONTH = _nrr_sql("duck")


UNITECO_QUERIES = {
    "cohort_ltv_table": q_cohort_ltv_table,
    "payback_period": q_payback_period,
    "retention_curve_fit": q_retention_curve_fit,
    "arpu_age_triangle": q_arpu_age_triangle,
    "nrr_grr_month": q_nrr_grr_month,
}

UNITECO_ORACLES = {
    "cohort_ltv_table": ORACLE_COHORT_LTV_TABLE,
    "payback_period": ORACLE_PAYBACK_PERIOD,
    "retention_curve_fit": ORACLE_RETENTION_CURVE_FIT,
    "arpu_age_triangle": ORACLE_ARPU_AGE_TRIANGLE,
    "nrr_grr_month": ORACLE_NRR_GRR_MONTH,
}

_q.QUERIES.update(UNITECO_QUERIES)
_q.ORACLES.update(UNITECO_ORACLES)
