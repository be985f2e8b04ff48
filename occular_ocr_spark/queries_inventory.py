"""Inventory-economics catalog, round 4 (wave 77): five operators
from classical operations research (newsvendor, EOQ, ABC,
Syntetos-Boylan demand classification) over the lineitem demand
series — the decision tables a supply-chain warehouse derives from
the same TPC-H-shaped facts.  Daily demand d_t = Σ⌊l_quantity⌋ by
ship date; part revenue = Σ⌊l_extendedprice⌋ (explicit floor before
integer cast — the engines' double→int casts round differently).

* ``newsvendor_quantile`` — for (underage, overage) cost pairs
  {_NV_COSTS}: the critical fractile cu/(cu+co) in micro and the
  optimal stock = the exact ceil-rank demand quantile at it.
* ``stockout_cost_curve`` — the piecewise-linear newsvendor cost
  curve: at each candidate stock level (the demand deciles), total
  underage Σmax(0, d-s) and overage Σmax(0, s-d) units.
* ``eoq_grid`` — economic order quantity √(2·D·S/H) on a
  (setup, holding) grid via exact integer isqrt (IEEE sqrt is
  correctly rounded, so floor(sqrt(x)) is engine-identical), with
  the radicand kept for audit.
* ``abc_classification`` — parts Pareto-ranked by revenue:
  A = cumulative ≤ {_ABC_A} micro, B ≤ {_ABC_B}, C rest; per class
  part counts and revenue shares.
* ``demand_interval_profile`` — per part: ADI (average inter-demand
  interval, micro), non-zero-demand CV² (micro², exact moment sums),
  and the Syntetos-Boylan class (smooth / intermittent / erratic /
  lumpy at ADI 1.32, CV² 0.49).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_inventory_wave.py.

Cross-engine float policy: integers end-to-end (floored money and
quantities, micro ratios); the single sqrt is IEEE-exact on both
engines and immediately floored.

Scale notes: the daily/part aggregations are partial aggs to
≤#days/#parts rows; rank windows run over those bounded frames; the
cost curve joins a ≤10-row stock grid against the day frame.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_NV_COSTS = [(1, 4), (1, 1), (4, 1)]
_EOQ_GRID = [(100, 2), (400, 2), (400, 8)]
_ABC_A = 800_000
_ABC_B = 950_000
_ADI_CUT = 1_320_000
_CV2_CUT = 490_000


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_shipdate AS DATE) AS d",
            "CAST(floor(l_quantity) AS BIGINT) AS q",
        )
        .groupBy("d")
        .agg(F.sum("q").cast("long").alias("demand"))
    )


_DAILY_SQL = """
daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS demand
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE))
"""

_RANKED_SQL = """
ranked AS (
  SELECT d, demand,
         row_number() OVER (ORDER BY demand, d) AS rk,
         count(*) OVER () AS n
  FROM daily)
"""


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _daily(spark, sf_dir).selectExpr(
        "d",
        "demand",
        "row_number() OVER (ORDER BY demand, d) AS rk",
        "count(*) OVER () AS n",
    )


# ---------------------------------------------------------------------------
# newsvendor_quantile
# ---------------------------------------------------------------------------


def q_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal stock per (cu, co): the ceil-rank daily-demand
    quantile at the critical fractile cu/(cu+co)."""
    costs = spark.createDataFrame(
        [(cu, co) for cu, co in _NV_COSTS], "cu long, co long"
    )
    ranked = _q._persist_tracked(_ranked(spark, sf_dir))
    return (
        ranked.crossJoin(F.broadcast(costs))
        .selectExpr(
            "cu",
            "co",
            "demand",
            "rk",
            "n",
            "CAST((2000000 * cu + (cu + co)) DIV (2 * (cu + co))"
            " AS BIGINT) AS fractile_micro",
        )
        .where(
            "rk = greatest(1L, (((2000000 * cu + (cu + co))"
            " DIV (2 * (cu + co))) * n + 999999) DIV 1000000)"
        )
        .selectExpr(
            "cu",
            "co",
            "fractile_micro",
            "n AS n_days",
            "demand AS optimal_stock",
        )
    )


ORACLE_NEWSVENDOR_QUANTILE = f"""
WITH {_DAILY_SQL},
{_RANKED_SQL},
costs AS (
  SELECT * FROM (VALUES {", ".join(f"({cu}, {co})" for cu, co in _NV_COSTS)})
    AS t(cu, co))
SELECT CAST(c.cu AS BIGINT) AS cu, CAST(c.co AS BIGINT) AS co,
       CAST((2000000 * c.cu + (c.cu + c.co)) // (2 * (c.cu + c.co))
            AS BIGINT) AS fractile_micro,
       r.n AS n_days,
       r.demand AS optimal_stock
FROM ranked r CROSS JOIN costs c
WHERE r.rk = greatest(1, (((2000000 * c.cu + (c.cu + c.co))
       // (2 * (c.cu + c.co))) * r.n + 999999) // 1000000)
"""


# ---------------------------------------------------------------------------
# stockout_cost_curve
# ---------------------------------------------------------------------------


def q_stockout_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Underage/overage unit totals at each decile stock level — the
    exact piecewise-linear curve the newsvendor fractile minimizes."""
    ranked = _q._persist_tracked(_ranked(spark, sf_dir))
    grid = (
        ranked.crossJoin(
            F.broadcast(
                ranked.sparkSession.range(1, 10).selectExpr(
                    "CAST(id AS BIGINT) AS decile"
                )
            )
        )
        .where("rk = greatest(1L, (decile * n + 9) DIV 10)")
        .selectExpr("decile", "demand AS stock")
    )
    return (
        _daily(spark, sf_dir)
        .crossJoin(F.broadcast(grid))
        .groupBy("decile", "stock")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(F.expr("greatest(demand - stock, 0L)"))
            .cast("long")
            .alias("underage_units"),
            F.sum(F.expr("greatest(stock - demand, 0L)"))
            .cast("long")
            .alias("overage_units"),
        )
    )


ORACLE_STOCKOUT_COST_CURVE = f"""
WITH {_DAILY_SQL},
{_RANKED_SQL},
grid AS (
  SELECT g.decile, r.demand AS stock
  FROM ranked r CROSS JOIN (
    SELECT unnest(generate_series(1, 9)) AS decile) g
  WHERE r.rk = greatest(1, (g.decile * r.n + 9) // 10))
SELECT CAST(g.decile AS BIGINT) AS decile, g.stock,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(greatest(d.demand - g.stock, 0)) AS BIGINT)
         AS underage_units,
       CAST(sum(greatest(g.stock - d.demand, 0)) AS BIGINT)
         AS overage_units
FROM daily d CROSS JOIN grid g
GROUP BY g.decile, g.stock
"""


# ---------------------------------------------------------------------------
# eoq_grid
# ---------------------------------------------------------------------------


def q_eoq_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EOQ = ⌊√(2·D·S/H)⌋ per (setup S, holding H): the radicand is
    exact integer arithmetic, the sqrt IEEE-correctly-rounded on both
    engines, immediately floored."""
    total = _daily(spark, sf_dir).agg(
        F.sum("demand").cast("long").alias("annual_demand")
    )
    grid = spark.createDataFrame(
        [(s, h) for s, h in _EOQ_GRID], "setup long, holding long"
    )
    return total.crossJoin(F.broadcast(grid)).selectExpr(
        "setup",
        "holding",
        "annual_demand",
        "(2 * annual_demand * setup) DIV holding AS radicand",
        "CAST(floor(sqrt(CAST((2 * annual_demand * setup) DIV holding"
        " AS DOUBLE))) AS BIGINT) AS eoq",
    )


ORACLE_EOQ_GRID = f"""
WITH {_DAILY_SQL},
total AS (
  SELECT CAST(sum(demand) AS BIGINT) AS annual_demand FROM daily),
grid AS (
  SELECT * FROM (VALUES {", ".join(f"({s}, {h})" for s, h in _EOQ_GRID)})
    AS t(setup, holding))
SELECT CAST(g.setup AS BIGINT) AS setup,
       CAST(g.holding AS BIGINT) AS holding,
       t.annual_demand,
       (2 * t.annual_demand * g.setup) // g.holding AS radicand,
       CAST(floor(sqrt(CAST((2 * t.annual_demand * g.setup) // g.holding
            AS DOUBLE))) AS BIGINT) AS eoq
FROM total t CROSS JOIN grid g
"""


# ---------------------------------------------------------------------------
# abc_classification
# ---------------------------------------------------------------------------


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto ABC: parts ranked by floored revenue, classified by the
    half-up micro cumulative share; per class counts and shares."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_partkey",
            "CAST(floor(l_extendedprice) AS BIGINT) AS r",
        )
        .groupBy("l_partkey")
        .agg(F.sum("r").cast("long").alias("revenue"))
    )
    ranked = rev.selectExpr(
        "l_partkey",
        "revenue",
        "sum(revenue) OVER (ORDER BY revenue DESC, l_partkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum",
        "sum(revenue) OVER () AS total",
    ).selectExpr(
        "l_partkey",
        "revenue",
        "CAST((2000000 * cum + total) DIV (2 * total) AS BIGINT)"
        " AS cum_micro",
        "total",
    )
    classed = ranked.selectExpr(
        "revenue",
        "total",
        f"CASE WHEN cum_micro <= {_ABC_A} THEN 'A'"
        f" WHEN cum_micro <= {_ABC_B} THEN 'B'"
        " ELSE 'C' END AS abc_class",
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("revenue").cast("long").alias("class_revenue"),
        F.expr(
            "CAST((2000000 * sum(revenue) + max(total))"
            " DIV (2 * max(total)) AS BIGINT)"
        ).alias("revenue_share_micro"),
    )


ORACLE_ABC_CLASSIFICATION = f"""
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS revenue
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT l_partkey, revenue,
         CAST((2000000 * sum(revenue) OVER (ORDER BY revenue DESC,
                l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) + sum(revenue) OVER ())
              // (2 * sum(revenue) OVER ()) AS BIGINT) AS cum_micro,
         sum(revenue) OVER () AS total
  FROM rev),
classed AS (
  SELECT revenue, total,
         CASE WHEN cum_micro <= {_ABC_A} THEN 'A'
              WHEN cum_micro <= {_ABC_B} THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(revenue) AS BIGINT) AS class_revenue,
       CAST((2000000 * sum(revenue) + max(total)) // (2 * max(total))
            AS BIGINT) AS revenue_share_micro
FROM classed GROUP BY abc_class
"""


# ---------------------------------------------------------------------------
# demand_interval_profile
# ---------------------------------------------------------------------------


def q_demand_interval_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan per part: ADI = span/(k-1) micro over the k
    demand days, CV² of the non-zero daily demands in micro² via
    exact moment sums, and the four-way class."""
    per_day = (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_partkey",
            "CAST(l_shipdate AS DATE) AS d",
            "CAST(floor(l_quantity) AS BIGINT) AS q",
        )
        .groupBy("l_partkey", "d")
        .agg(F.sum("q").cast("long").alias("dem"))
    )
    per_part = per_day.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("k_days"),
        F.expr("CAST(datediff(max(d), min(d)) AS BIGINT)").alias("span"),
        F.sum("dem").cast("long").alias("s1"),
        F.sum(F.expr("dem * dem")).cast("long").alias("s2"),
    )
    return (
        per_part.where("k_days >= 2")
        .selectExpr(
            "l_partkey",
            "k_days",
            "span",
            "CAST((2000000 * span + (k_days - 1)) DIV (2 * (k_days - 1))"
            " AS BIGINT) AS adi_micro",
            # CV^2 = (k*s2 - s1^2) / s1^2 exactly (population variance
            # over mean^2 cancels the k)... kept as the k*s2/s1^2 - 1
            # rational in one half-up step:
            "CAST((2000000 * (k_days * s2 - s1 * s1) + s1 * s1)"
            " DIV (2 * s1 * s1) AS BIGINT) AS cv2_micro",
        )
        .selectExpr(
            "l_partkey",
            "k_days",
            "span",
            "adi_micro",
            "cv2_micro",
            f"CASE WHEN adi_micro < {_ADI_CUT} AND cv2_micro"
            f" < {_CV2_CUT} THEN 'smooth'"
            f" WHEN adi_micro < {_ADI_CUT} THEN 'erratic'"
            f" WHEN cv2_micro < {_CV2_CUT} THEN 'intermittent'"
            " ELSE 'lumpy' END AS sb_class",
        )
    )


ORACLE_DEMAND_INTERVAL_PROFILE = f"""
WITH per_day AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS dem
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
per_part AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS k_days,
         CAST(max(d) - min(d) AS BIGINT) AS span,
         CAST(sum(dem) AS BIGINT) AS s1,
         CAST(sum(dem * dem) AS BIGINT) AS s2
  FROM per_day GROUP BY l_partkey),
scored AS (
  SELECT l_partkey, k_days, span,
         CAST((2000000 * span + (k_days - 1)) // (2 * (k_days - 1))
              AS BIGINT) AS adi_micro,
         CAST((2000000 * (k_days * s2 - s1 * s1) + s1 * s1)
              // (2 * s1 * s1) AS BIGINT) AS cv2_micro
  FROM per_part WHERE k_days >= 2)
SELECT l_partkey, k_days, span, adi_micro, cv2_micro,
       CASE WHEN adi_micro < {_ADI_CUT} AND cv2_micro < {_CV2_CUT}
            THEN 'smooth'
            WHEN adi_micro < {_ADI_CUT} THEN 'erratic'
            WHEN cv2_micro < {_CV2_CUT} THEN 'intermittent'
            ELSE 'lumpy' END AS sb_class
FROM scored
"""


INVENTORY_QUERIES = {
    "newsvendor_quantile": q_newsvendor_quantile,
    "stockout_cost_curve": q_stockout_cost_curve,
    "eoq_grid": q_eoq_grid,
    "abc_classification": q_abc_classification,
    "demand_interval_profile": q_demand_interval_profile,
}

INVENTORY_ORACLES = {
    "newsvendor_quantile": ORACLE_NEWSVENDOR_QUANTILE,
    "stockout_cost_curve": ORACLE_STOCKOUT_COST_CURVE,
    "eoq_grid": ORACLE_EOQ_GRID,
    "abc_classification": ORACLE_ABC_CLASSIFICATION,
    "demand_interval_profile": ORACLE_DEMAND_INTERVAL_PROFILE,
}

_q.QUERIES.update(INVENTORY_QUERIES)
_q.ORACLES.update(INVENTORY_ORACLES)
