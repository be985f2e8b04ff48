"""Intermittent-demand forecasting catalog, round 4 (wave 85): five
operators completing the wave-77 inventory program with the
forecasting side — Croston's method (the standard for intermittent
series), an SES grid, safety stock / reorder points, the tracking
signal, and a point-forecast bakeoff.  Per-series recursions run as
bounded folds (Spark ``F.aggregate`` over the day-sorted array /
DuckDB ``WITH RECURSIVE`` replay — the ``holt_smoothing`` doctrine),
with ALL-INTEGER micro state (no float in any fold).

* ``croston_forecast`` — per part with ≥2 demand days: SES
  (α = 1/{_CR_ALPHA_INV}) on non-zero demand sizes z and on
  inter-demand gaps p (exact half-up micro recursions; init
  z₀ = size₁·10⁶, p₀ = 10⁶ by convention), Croston forecast z/p and
  the Syntetos-Boylan approximation (1 − α/2)·z/p as half-up micros.
* ``ses_demand_forecast`` — total daily demand under the SES α grid
  {_SES_ALPHAS} (exact integer recursion per α): final level and the
  one-step-ahead MAE of the run.
* ``safety_stock_table`` — per part over the global horizon H (zero
  days included via the s1/s2-only identity — no spine join needed):
  lead-time demand μ·L, safety stock z·σ·√L at z = 1.645, L =
  {_SS_LEAD} days (one row-local IEEE sqrt on the exact integer
  radicand), and the reorder point.
* ``tracking_signal`` — per part: naive-forecast errors over the
  demand-size sequence; TS = Σe/(Σ|e|/n) as a sign-split exact
  rational micro, with the |TS| > {_TS_LIMIT} bias flag.
* ``forecast_method_bakeoff`` — naive-1 / seasonal-naive-7 /
  expanding-mean point forecasts of daily demand on the complete day
  spine: per method the evaluation count and exact MAE micro (the
  expanding-mean error is a per-row exact rational, half-up before
  averaging).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_demandfc_wave.py.

Cross-engine float policy: every recursion and ratio is exact BIGINT
half-up micro; the one float (safety-stock sqrt) is IEEE-correctly-
rounded sqrt on an exact integer, identical on both engines,
micro-quantized in a fixed operation order.

Scale notes: per-part series are demand-DAY sequences (calendar-
bounded, not corpus-bounded); the corpus-sized work is one lineitem
partial-agg shuffle; folds are row-local over those bounded arrays;
the daily bakeoff windows order only the day spine.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_CR_ALPHA_INV = 5
_SES_ALPHAS = [(1, 10), (3, 10), (1, 2)]
_SS_LEAD = 7
_SS_Z = "1.645"
_TS_LIMIT = 4


def _part_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_partkey",
            "CAST(l_shipdate AS DATE) AS d",
            "CAST(floor(l_quantity) AS BIGINT) AS q",
        )
        .groupBy("l_partkey", "d")
        .agg(F.sum("q").cast("long").alias("size"))
    )


_PART_DAYS_SQL = """
pd AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
           AS size
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE))
"""


# ---------------------------------------------------------------------------
# croston_forecast
# ---------------------------------------------------------------------------


def q_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston + SBA per part via an all-integer (z, p) micro fold
    over the (size, gap) demand sequence."""
    pd_ = _part_days(spark, sf_dir)
    seq = pd_.selectExpr(
        "l_partkey",
        "d",
        "size",
        "CAST(datediff(d, lag(d) OVER (PARTITION BY l_partkey"
        " ORDER BY d)) AS BIGINT) AS gap",
    )
    series = (
        seq.groupBy("l_partkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("d", "size", "gap"))
            ).alias("s")
        )
        .where(F.size("s") >= 2)
    )
    a = _CR_ALPHA_INV
    init = F.struct(
        (F.element_at("s", 1)["size"] * F.lit(1_000_000))
        .cast("long")
        .alias("z"),
        F.lit(1_000_000).cast("long").alias("p"),
    )

    def step(acc, x):
        z_new = (
            (
                2 * (x["size"] * F.lit(1_000_000) + (a - 1) * acc["z"])
                + F.lit(a)
            )
            / F.lit(2 * a)
        ).cast("long")
        p_new = (
            (
                2 * (x["gap"] * F.lit(1_000_000) + (a - 1) * acc["p"])
                + F.lit(a)
            )
            / F.lit(2 * a)
        ).cast("long")
        return F.struct(z_new.alias("z"), p_new.alias("p"))

    fin = F.aggregate(F.slice(F.col("s"), 2, F.size("s") - 1), init, step)
    return series.select(
        "l_partkey",
        F.size("s").cast("long").alias("n_demands"),
        fin["z"].alias("z_micro"),
        fin["p"].alias("p_micro"),
    ).selectExpr(
        "l_partkey",
        "n_demands",
        "z_micro",
        "p_micro",
        "CAST((2000000 * z_micro + p_micro) DIV (2 * p_micro)"
        " AS BIGINT) AS croston_micro",
        f"CAST(((2 * {_CR_ALPHA_INV} - 1)"
        " * ((2000000 * z_micro + p_micro) DIV (2 * p_micro))"
        f" + {_CR_ALPHA_INV}) DIV (2 * {_CR_ALPHA_INV}) AS BIGINT)"
        " AS sba_micro",
    )


ORACLE_CROSTON_FORECAST = f"""
WITH RECURSIVE {_PART_DAYS_SQL},
seq AS (
  SELECT l_partkey, size,
         CAST(d - lag(d) OVER (PARTITION BY l_partkey ORDER BY d)
              AS BIGINT) AS gap,
         row_number() OVER (PARTITION BY l_partkey ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY l_partkey) AS n
  FROM pd),
rec AS (
  SELECT l_partkey, rn, n,
         CAST(size * 1000000 AS BIGINT) AS z,
         CAST(1000000 AS BIGINT) AS p
  FROM seq WHERE rn = 1 AND n >= 2
  UNION ALL
  SELECT s.l_partkey, s.rn, s.n,
         (2 * (s.size * 1000000 + {_CR_ALPHA_INV - 1} * r.z)
          + {_CR_ALPHA_INV}) // (2 * {_CR_ALPHA_INV}) AS z,
         (2 * (s.gap * 1000000 + {_CR_ALPHA_INV - 1} * r.p)
          + {_CR_ALPHA_INV}) // (2 * {_CR_ALPHA_INV}) AS p
  FROM rec r JOIN seq s
    ON s.l_partkey = r.l_partkey AND s.rn = r.rn + 1)
SELECT l_partkey, CAST(n AS BIGINT) AS n_demands,
       z AS z_micro, p AS p_micro,
       CAST((2000000 * z + p) // (2 * p) AS BIGINT) AS croston_micro,
       CAST(((2 * {_CR_ALPHA_INV} - 1)
            * ((2000000 * z + p) // (2 * p))
            + {_CR_ALPHA_INV}) // (2 * {_CR_ALPHA_INV}) AS BIGINT)
         AS sba_micro
FROM rec WHERE rn = n
"""


# ---------------------------------------------------------------------------
# ses_demand_forecast
# ---------------------------------------------------------------------------


def q_ses_demand_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SES over total daily demand at each α = num/den in the grid:
    exact integer level recursion + one-step MAE."""
    daily = (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_shipdate AS DATE) AS d",
            "CAST(floor(l_quantity) AS BIGINT) AS q",
        )
        .groupBy("d")
        .agg(F.sum("q").cast("long").alias("x"))
    )
    series = daily.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("s")
    )
    grid = spark.createDataFrame(
        [(n, dn) for n, dn in _SES_ALPHAS], "a_num long, a_den long"
    )
    base = series.crossJoin(F.broadcast(grid))
    init = F.struct(
        (F.element_at("s", 1)["x"] * F.lit(1_000_000))
        .cast("long")
        .alias("l"),
        F.lit(0).cast("long").alias("sae"),
    )

    def step(acc, x):
        err = F.abs(x["x"] * F.lit(1_000_000) - acc["l"]).cast("long")
        l_new = (
            (
                2
                * (
                    F.col("a_num") * x["x"] * F.lit(1_000_000)
                    + (F.col("a_den") - F.col("a_num")) * acc["l"]
                )
                + F.col("a_den")
            )
            / (2 * F.col("a_den"))
        ).cast("long")
        return F.struct(l_new.alias("l"), (acc["sae"] + err).alias("sae"))

    fin = F.aggregate(F.slice(F.col("s"), 2, F.size("s") - 1), init, step)
    return base.select(
        "a_num",
        "a_den",
        F.size("s").cast("long").alias("n_days"),
        fin["l"].alias("level_micro"),
        fin["sae"].alias("sae_micro"),
    ).selectExpr(
        "a_num",
        "a_den",
        "n_days",
        "level_micro",
        "CAST((2 * sae_micro + (n_days - 1)) DIV (2 * (n_days - 1))"
        " AS BIGINT) AS mae_micro",
    )


ORACLE_SES_DEMAND_FORECAST = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)),
series AS (
  SELECT x, row_number() OVER (ORDER BY d) AS rn,
         count(*) OVER () AS n
  FROM daily),
grid AS (
  SELECT * FROM (VALUES {", ".join(f"({n}, {d})" for n, d in _SES_ALPHAS)})
    AS t(a_num, a_den)),
rec AS (
  SELECT g.a_num, g.a_den, s.rn, s.n,
         CAST(s.x * 1000000 AS BIGINT) AS l,
         CAST(0 AS BIGINT) AS sae
  FROM series s CROSS JOIN grid g WHERE s.rn = 1
  UNION ALL
  SELECT r.a_num, r.a_den, s.rn, s.n,
         (2 * (r.a_num * s.x * 1000000
               + (r.a_den - r.a_num) * r.l)
          + r.a_den) // (2 * r.a_den) AS l,
         r.sae + abs(s.x * 1000000 - r.l) AS sae
  FROM rec r JOIN series s ON s.rn = r.rn + 1)
SELECT CAST(a_num AS BIGINT) AS a_num, CAST(a_den AS BIGINT) AS a_den,
       CAST(n AS BIGINT) AS n_days, l AS level_micro,
       CAST((2 * sae + (n - 1)) // (2 * (n - 1)) AS BIGINT)
         AS mae_micro
FROM rec WHERE rn = n
"""


# ---------------------------------------------------------------------------
# safety_stock_table
# ---------------------------------------------------------------------------


def q_safety_stock_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part: μ·L lead-time demand, z·σ·√L safety stock (zeros
    included via the moments-only identity), reorder point."""
    pd_ = _part_days(spark, sf_dir)
    h = pd_.agg(
        F.expr("CAST(datediff(max(d), min(d)) + 1 AS BIGINT)").alias("H")
    )
    per = pd_.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("k_days"),
        F.sum("size").cast("long").alias("s1"),
        F.sum(F.expr("size * size")).cast("long").alias("s2"),
    )
    return per.crossJoin(F.broadcast(h)).selectExpr(
        "l_partkey",
        "k_days",
        "s1",
        "H",
        f"CAST((2000000 * {_SS_LEAD} * s1 + H) DIV (2 * H) AS BIGINT)"
        " AS leadtime_demand_micro",
        f"CAST(floor({_SS_Z} * sqrt(CAST({_SS_LEAD}"
        " * (H * s2 - s1 * s1) AS DOUBLE)) / H * 1e6 + 0.5) AS BIGINT)"
        " AS safety_stock_micro",
        f"CAST((2000000 * {_SS_LEAD} * s1 + H) DIV (2 * H) AS BIGINT)"
        f" + CAST(floor({_SS_Z} * sqrt(CAST({_SS_LEAD}"
        " * (H * s2 - s1 * s1) AS DOUBLE)) / H * 1e6 + 0.5) AS BIGINT)"
        " AS reorder_point_micro",
    )


ORACLE_SAFETY_STOCK_TABLE = f"""
WITH {_PART_DAYS_SQL},
h AS (SELECT CAST(max(d) - min(d) + 1 AS BIGINT) AS H FROM pd),
per AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS k_days,
         CAST(sum(size) AS BIGINT) AS s1,
         CAST(sum(size * size) AS BIGINT) AS s2
  FROM pd GROUP BY l_partkey)
SELECT p.l_partkey, p.k_days, p.s1, h.H,
       CAST((2000000 * {_SS_LEAD} * p.s1 + h.H) // (2 * h.H)
            AS BIGINT) AS leadtime_demand_micro,
       CAST(floor({_SS_Z} * sqrt(CAST({_SS_LEAD}
            * (h.H * p.s2 - p.s1 * p.s1) AS DOUBLE)) / h.H * 1e6
            + 0.5) AS BIGINT) AS safety_stock_micro,
       CAST((2000000 * {_SS_LEAD} * p.s1 + h.H) // (2 * h.H)
            AS BIGINT)
       + CAST(floor({_SS_Z} * sqrt(CAST({_SS_LEAD}
            * (h.H * p.s2 - p.s1 * p.s1) AS DOUBLE)) / h.H * 1e6
            + 0.5) AS BIGINT) AS reorder_point_micro
FROM per p CROSS JOIN h
"""


# ---------------------------------------------------------------------------
# tracking_signal
# ---------------------------------------------------------------------------


def q_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-forecast tracking signal per part: TS = n·Σe/Σ|e| as a
    sign-split exact rational micro."""
    pd_ = _part_days(spark, sf_dir)
    errs = pd_.selectExpr(
        "l_partkey",
        "size - lag(size) OVER (PARTITION BY l_partkey ORDER BY d)"
        " AS e",
    ).where("e IS NOT NULL")
    agg = errs.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_err"),
        F.sum("e").cast("long").alias("sum_err"),
        F.sum(F.abs(F.col("e"))).cast("long").alias("sum_abs_err"),
    )
    return agg.where("n_err >= 2 AND sum_abs_err > 0").selectExpr(
        "l_partkey",
        "n_err",
        "sum_err",
        "sum_abs_err",
        "CASE WHEN sum_err >= 0 THEN"
        " CAST((2000000 * n_err * sum_err + sum_abs_err)"
        " DIV (2 * sum_abs_err) AS BIGINT)"
        " ELSE -CAST((2000000 * n_err * (-sum_err) + sum_abs_err)"
        " DIV (2 * sum_abs_err) AS BIGINT) END AS ts_micro",
        f"CASE WHEN abs(CASE WHEN sum_err >= 0 THEN"
        " CAST((2000000 * n_err * sum_err + sum_abs_err)"
        " DIV (2 * sum_abs_err) AS BIGINT)"
        " ELSE -CAST((2000000 * n_err * (-sum_err) + sum_abs_err)"
        " DIV (2 * sum_abs_err) AS BIGINT) END)"
        f" > {_TS_LIMIT} * 1000000 THEN 1L ELSE 0L END AS biased",
    )


ORACLE_TRACKING_SIGNAL = f"""
WITH {_PART_DAYS_SQL},
errs AS (
  SELECT l_partkey,
         size - lag(size) OVER (PARTITION BY l_partkey ORDER BY d)
           AS e
  FROM pd),
agg AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n_err,
         CAST(sum(e) AS BIGINT) AS sum_err,
         CAST(sum(abs(e)) AS BIGINT) AS sum_abs_err
  FROM errs WHERE e IS NOT NULL GROUP BY l_partkey),
sc AS (
  SELECT l_partkey, n_err, sum_err, sum_abs_err,
         CASE WHEN sum_err >= 0 THEN
           CAST((2000000 * n_err * sum_err + sum_abs_err)
                // (2 * sum_abs_err) AS BIGINT)
         ELSE -CAST((2000000 * n_err * (-sum_err) + sum_abs_err)
                // (2 * sum_abs_err) AS BIGINT) END AS ts_micro
  FROM agg WHERE n_err >= 2 AND sum_abs_err > 0)
SELECT l_partkey, n_err, sum_err, sum_abs_err, ts_micro,
       CAST(CASE WHEN abs(ts_micro) > {_TS_LIMIT} * 1000000 THEN 1
            ELSE 0 END AS BIGINT) AS biased
FROM sc
"""


# ---------------------------------------------------------------------------
# forecast_method_bakeoff
# ---------------------------------------------------------------------------


def q_forecast_method_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-1 / seasonal-naive-7 / expanding-mean point forecasts of
    daily demand on the complete day spine: per-method exact MAE."""
    daily = (
        _t(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_shipdate AS DATE) AS d",
            "CAST(floor(l_quantity) AS BIGINT) AS q",
        )
        .groupBy("d")
        .agg(F.sum("q").cast("long").alias("x"))
    )
    span = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = span.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    spine = _q._persist_tracked(
        cal.join(daily, "d", "left").selectExpr(
            "d", "coalesce(x, 0L) AS x"
        )
    )
    base = spine.selectExpr(
        "d",
        "x",
        "lag(x, 1) OVER (ORDER BY d) AS f_naive",
        "lag(x, 7) OVER (ORDER BY d) AS f_snaive",
        "sum(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND 1 PRECEDING) AS cum_prev",
        "CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS t_prev",
    )
    naive = base.where("f_naive IS NOT NULL").agg(
        F.count("*").cast("long").alias("n_evals"),
        F.sum(F.expr("abs(x - f_naive)")).cast("long").alias("sae"),
    ).selectExpr(
        "'naive_1' AS method",
        "n_evals",
        "CAST((2000000 * sae + n_evals) DIV (2 * n_evals) AS BIGINT)"
        " AS mae_micro",
    )
    snaive = base.where("f_snaive IS NOT NULL").agg(
        F.count("*").cast("long").alias("n_evals"),
        F.sum(F.expr("abs(x - f_snaive)")).cast("long").alias("sae"),
    ).selectExpr(
        "'seasonal_naive_7' AS method",
        "n_evals",
        "CAST((2000000 * sae + n_evals) DIV (2 * n_evals) AS BIGINT)"
        " AS mae_micro",
    )
    # expanding mean: per-row exact error micro, half-up before summing
    emean = base.where("t_prev >= 1").selectExpr(
        "CAST((2000000 * abs(x * t_prev - cum_prev) + t_prev)"
        " DIV (2 * t_prev) AS BIGINT) AS ae_micro"
    ).agg(
        F.count("*").cast("long").alias("n_evals"),
        F.sum("ae_micro").cast("long").alias("sae_micro"),
    ).selectExpr(
        "'expanding_mean' AS method",
        "n_evals",
        "CAST((2 * sae_micro + n_evals) DIV (2 * n_evals) AS BIGINT)"
        " AS mae_micro",
    )
    return naive.unionAll(snaive).unionAll(emean)


ORACLE_FORECAST_METHOD_BAKEOFF = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)),
span AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
    AS d FROM span),
spine AS (
  SELECT c.d, coalesce(x.x, 0) AS x
  FROM cal c LEFT JOIN daily x ON x.d = c.d),
base AS (
  SELECT d, x,
         lag(x, 1) OVER (ORDER BY d) AS f_naive,
         lag(x, 7) OVER (ORDER BY d) AS f_snaive,
         sum(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING) AS cum_prev,
         CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS t_prev
  FROM spine),
naive AS (
  SELECT 'naive_1' AS method,
         CAST(count(*) AS BIGINT) AS n_evals,
         CAST((2000000 * sum(abs(x - f_naive)) + count(*))
              // (2 * count(*)) AS BIGINT) AS mae_micro
  FROM base WHERE f_naive IS NOT NULL),
snaive AS (
  SELECT 'seasonal_naive_7' AS method,
         CAST(count(*) AS BIGINT) AS n_evals,
         CAST((2000000 * sum(abs(x - f_snaive)) + count(*))
              // (2 * count(*)) AS BIGINT) AS mae_micro
  FROM base WHERE f_snaive IS NOT NULL),
emean AS (
  SELECT 'expanding_mean' AS method,
         CAST(count(*) AS BIGINT) AS n_evals,
         CAST((2 * sum(ae_micro) + count(*)) // (2 * count(*))
              AS BIGINT) AS mae_micro
  FROM (
    SELECT CAST((2000000 * abs(x * t_prev - cum_prev) + t_prev)
                // (2 * t_prev) AS BIGINT) AS ae_micro
    FROM base WHERE t_prev >= 1) t)
SELECT * FROM naive
UNION ALL SELECT * FROM snaive
UNION ALL SELECT * FROM emean
"""


DEMANDFC_QUERIES = {
    "croston_forecast": q_croston_forecast,
    "ses_demand_forecast": q_ses_demand_forecast,
    "safety_stock_table": q_safety_stock_table,
    "tracking_signal": q_tracking_signal,
    "forecast_method_bakeoff": q_forecast_method_bakeoff,
}

DEMANDFC_ORACLES = {
    "croston_forecast": ORACLE_CROSTON_FORECAST,
    "ses_demand_forecast": ORACLE_SES_DEMAND_FORECAST,
    "safety_stock_table": ORACLE_SAFETY_STOCK_TABLE,
    "tracking_signal": ORACLE_TRACKING_SIGNAL,
    "forecast_method_bakeoff": ORACLE_FORECAST_METHOD_BAKEOFF,
}

_q.QUERIES.update(DEMANDFC_QUERIES)
_q.ORACLES.update(DEMANDFC_ORACLES)
