"""Pricing-analytics catalog, round 4 (wave 102): five operators
from the revenue-management toolbox — empirical demand curves, arc
elasticities, revenue-maximizing bands, law-of-one-price dispersion,
and discount-depth lift — over the lineitem unit economics.  Unit
price = ⌊1000·l_extendedprice / l_quantity⌋ milli-units (one IEEE
division + floor, identical on both engines); discounts bucket to
integer percent via ⌊100·l_discount + 0.5⌋.

* ``price_band_demand_curve`` — the unit-price decile bands (ceil-
  rank boundaries from the milli-price value histogram): per band
  the line count, total quantity, total revenue, and the exact mean
  milli-price — the empirical demand curve.
* ``arc_elasticity_curve`` — adjacent-band arc elasticity
  ((Δq/q̄)/(Δp/p̄) as the exact cross-product rational
  (q₂−q₁)(p₂+p₁) / ((q₂+q₁)(p₂−p₁)), sign-split half-up micro) —
  where demand actually bends.
* ``revenue_max_band`` — the argmax band by revenue via
  min(struct(−revenue, band)) — the one-row pricing answer.
* ``price_dispersion_by_part`` — per part: unit-price CV² micro
  from exact milli-price moments — the law-of-one-price violation
  audit (same part, different realized prices).
* ``discount_depth_analysis`` — per integer discount percent: lines,
  quantity, revenue, and the mean-quantity lift vs the 0%-discount
  baseline (exact rational micro) — does discounting move volume.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_pricing_wave.py.

Cross-engine float policy: one IEEE division+floor per row for the
milli price and one multiply+floor for the discount bucket; all
moments/ratios exact BIGINT / DECIMAL(38,0)-vs-HUGEINT half-up
micro.

Scale notes: one lineitem scan to the milli-price histogram (value-
bounded) and per-part/per-bucket partial aggs; the decile bounds
broadcast; windows order only the ≤10-band frames.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_NBANDS = 10


def _milli_sql(dialect: str) -> str:
    return """
li AS (
  SELECT l_partkey,
         CAST(floor(1000 * l_extendedprice / l_quantity) AS BIGINT)
           AS p,
         CAST(floor(l_quantity) AS BIGINT) AS q,
         CAST(floor(l_extendedprice) AS BIGINT) AS r,
         CAST(floor(100 * l_discount + 0.5) AS BIGINT) AS disc
  FROM lineitem WHERE l_quantity > 0)
"""


def _bands_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    ks = (
        f"SELECT explode(sequence(1, {_NBANDS})) AS k"
        if dialect == "spark"
        else f"SELECT unnest(generate_series(1, {_NBANDS})) AS k"
    )
    return f"""
hist AS (
  SELECT p AS v, CAST(count(*) AS BIGINT) AS m FROM li GROUP BY p),
ranked AS (
  SELECT v, m,
         sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS cum,
         sum(m) OVER () AS n
  FROM hist),
ks AS ({ks}),
bounds AS (
  SELECT k, min(v) AS ub FROM ranked CROSS JOIN ks
  WHERE cum >= (k * n + {_NBANDS} - 1) {intdiv} {_NBANDS}
  GROUP BY k),
bands AS (
  SELECT k, coalesce(lag(ub) OVER (ORDER BY k),
           (SELECT min(v) - 1 FROM hist)) AS lb, ub
  FROM bounds),
banded AS (
  SELECT b.k AS band, li.p, li.q, li.r
  FROM li JOIN bands b ON li.p > b.lb AND li.p <= b.ub)
"""


# ---------------------------------------------------------------------------
# price_band_demand_curve
# ---------------------------------------------------------------------------


def _curve_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_milli_sql(dialect)},
{_bands_sql(dialect)}
SELECT band,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(q) AS BIGINT) AS quantity,
       CAST(sum(r) AS BIGINT) AS revenue,
       CAST((2 * sum(p) + count(*)) {intdiv} (2 * count(*))
            AS BIGINT) AS mean_price_milli
FROM banded GROUP BY band
"""


def q_price_band_demand_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The decile-band empirical demand curve."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_curve_sql("spark"))


ORACLE_PRICE_BAND_DEMAND_CURVE = _curve_sql("duck")


# ---------------------------------------------------------------------------
# arc_elasticity_curve
# ---------------------------------------------------------------------------


def _elastic_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_milli_sql(dialect)},
{_bands_sql(dialect)},
per AS (
  SELECT band, CAST(sum(q) AS BIGINT) AS qty,
         CAST(sum(p) AS BIGINT) AS psum,
         CAST(count(*) AS BIGINT) AS n
  FROM banded GROUP BY band),
adj AS (
  SELECT a.band AS band_lo, b.band AS band_hi,
         a.qty AS q1, b.qty AS q2,
         -- mean prices scaled by the common denominator n1*n2 so
         -- the arc formula stays an exact integer rational:
         CAST(a.psum AS {wide}) * b.n AS p1s,
         CAST(b.psum AS {wide}) * a.n AS p2s
  FROM per a JOIN per b ON b.band = a.band + 1)
SELECT band_lo, band_hi, q1, q2,
       -- sign via separate comparisons (q2+q1 and p2s+p1s are
       -- positive, so sign(e) = sign(q2-q1)·sign(p2s-p1s)) —
       -- never a product of two wide products
       CASE WHEN p2s <> p1s THEN
         CASE WHEN (q2 >= q1) = (p2s > p1s)
         THEN CAST((2000000 * abs(CAST(q2 - q1 AS {wide})
              * (p2s + p1s)) + abs(CAST(q2 + q1 AS {wide})
              * (p2s - p1s))) {intdiv} (2 * abs(CAST(q2 + q1
              AS {wide}) * (p2s - p1s))) AS BIGINT)
         ELSE -CAST((2000000 * abs(CAST(q2 - q1 AS {wide})
              * (p2s + p1s)) + abs(CAST(q2 + q1 AS {wide})
              * (p2s - p1s))) {intdiv} (2 * abs(CAST(q2 + q1
              AS {wide}) * (p2s - p1s))) AS BIGINT) END
       ELSE CAST(0 AS BIGINT) END AS arc_elasticity_micro
FROM adj
"""


def q_arc_elasticity_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rational arc elasticity between adjacent price bands."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_elastic_sql("spark"))


ORACLE_ARC_ELASTICITY_CURVE = _elastic_sql("duck")


# ---------------------------------------------------------------------------
# revenue_max_band
# ---------------------------------------------------------------------------


def _revmax_sql(dialect: str) -> str:
    st = (
        "named_struct('nr', -revenue, 'band', band)"
        if dialect == "spark"
        else "struct_pack(nr := -revenue, band := band)"
    )
    return f"""
WITH {_milli_sql(dialect)},
{_bands_sql(dialect)},
per AS (
  SELECT band, CAST(sum(r) AS BIGINT) AS revenue
  FROM banded GROUP BY band),
best AS (SELECT min({st}) AS b FROM per)
SELECT CAST(b.band AS BIGINT) AS best_band,
       CAST(-b.nr AS BIGINT) AS best_revenue
FROM best
"""


def q_revenue_max_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax revenue band via min(struct)."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_revmax_sql("spark"))


ORACLE_REVENUE_MAX_BAND = _revmax_sql("duck")


# ---------------------------------------------------------------------------
# price_dispersion_by_part
# ---------------------------------------------------------------------------


def _disp_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_milli_sql(dialect)}
SELECT l_partkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(min(p) AS BIGINT) AS min_price_milli,
       CAST(max(p) AS BIGINT) AS max_price_milli,
       CAST((2000000 * (CAST(count(*) AS {wide})
            * sum(CAST(p AS {wide}) * p)
            - CAST(sum(p) AS {wide}) * sum(p))
            + CAST(sum(p) AS {wide}) * sum(p))
            {intdiv} (2 * CAST(sum(p) AS {wide}) * sum(p))
            AS BIGINT) AS cv2_micro
FROM li GROUP BY l_partkey HAVING count(*) >= 2
"""


def q_price_dispersion_by_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unit-price CV² per part — law-of-one-price audit."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_disp_sql("spark"))


ORACLE_PRICE_DISPERSION_BY_PART = _disp_sql("duck")


# ---------------------------------------------------------------------------
# discount_depth_analysis
# ---------------------------------------------------------------------------


def _discount_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_milli_sql(dialect)},
per AS (
  SELECT disc, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(q) AS BIGINT) AS quantity,
         CAST(sum(r) AS BIGINT) AS revenue
  FROM li GROUP BY disc),
base AS (
  SELECT n_lines AS n0, quantity AS q0 FROM per WHERE disc = 0)
SELECT p.disc AS discount_pct, p.n_lines, p.quantity, p.revenue,
       CASE WHEN b.q0 > 0 AND p.n_lines > 0 THEN
         CAST((2000000 * CAST(p.quantity AS {wide}) * b.n0
              + CAST(p.n_lines AS {wide}) * b.q0)
              {intdiv} (2 * CAST(p.n_lines AS {wide}) * b.q0)
              AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS qty_lift_micro
FROM per p CROSS JOIN base b
"""


def q_discount_depth_analysis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per discount percent: volume and the mean-quantity lift vs
    the undiscounted baseline."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_discount_sql("spark"))


ORACLE_DISCOUNT_DEPTH_ANALYSIS = _discount_sql("duck")


PRICING_QUERIES = {
    "price_band_demand_curve": q_price_band_demand_curve,
    "arc_elasticity_curve": q_arc_elasticity_curve,
    "revenue_max_band": q_revenue_max_band,
    "price_dispersion_by_part": q_price_dispersion_by_part,
    "discount_depth_analysis": q_discount_depth_analysis,
}

PRICING_ORACLES = {
    "price_band_demand_curve": ORACLE_PRICE_BAND_DEMAND_CURVE,
    "arc_elasticity_curve": ORACLE_ARC_ELASTICITY_CURVE,
    "revenue_max_band": ORACLE_REVENUE_MAX_BAND,
    "price_dispersion_by_part": ORACLE_PRICE_DISPERSION_BY_PART,
    "discount_depth_analysis": ORACLE_DISCOUNT_DEPTH_ANALYSIS,
}

_q.QUERIES.update(PRICING_QUERIES)
_q.ORACLES.update(PRICING_ORACLES)
