"""Risk-analytics catalog, round 4 (wave 103): five operators from
the financial-risk toolbox read onto the daily revenue series
(Σ⌊l_extendedprice⌋ by ship day on the complete spine; "returns" =
signed day-over-day deltas) — historical VaR/CVaR, drawdowns, a
Sharpe-like ratio, volatility regimes, and the Kelly fraction, each
exact-integer (the ceil-rank quantile and moment doctrines on signed
values).

* ``historical_var_cvar`` — the 5% historical VaR (exact ceil-rank
  lower quantile of the SIGNED delta histogram) and CVaR (exact
  rational mean of the tail at-or-below VaR), plus tail counts.
* ``max_drawdown_curve`` — running peak of cumulative revenue over
  the day spine, the maximum drawdown (exact), its date, and the
  longest underwater stretch in days (gaps-and-islands on the
  below-peak flag).
* ``sharpe_like_ratio`` — mean and population-σ of the deltas from
  exact moments (σ is one IEEE sqrt on the exact integer radicand),
  ratio micro-quantized, sign split.
* ``volatility_regimes`` — |delta| above/below its exact median →
  high/low-vol islands: per regime type the run count, total and
  longest days — volatility clustering made visible.
* ``kelly_fraction`` — binarize days into up/down: p = up share,
  b = (mean up-move)/(mean |down-move|) and f* = p − (1−p)/b, all
  exact rationals sign-split to micro.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_risk_wave.py.

Cross-engine float policy: signed-integer deltas, ceil-rank
quantiles, exact moment rationals; the one float (σ sqrt) is IEEE on
an exact integer, fixed op order, micro-quantized.

Scale notes: one lineitem partial-agg scan to the day spine; every
window orders the calendar-bounded day or delta-histogram frames; no
corpus-sized window, no driver loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_VAR_PCT = 5


def _series_sql(dialect: str) -> str:
    cal = (
        "SELECT explode(sequence(lo, hi)) AS d"
        if dialect == "spark"
        else "SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1"
        " DAY)) AS DATE) AS d"
    )
    return f"""
daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)),
span AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
cal AS ({cal} FROM span),
spine AS (
  SELECT c.d, coalesce(x.rev, 0) AS rev
  FROM cal c LEFT JOIN daily x ON x.d = c.d),
deltas AS (
  SELECT d, rev,
         rev - lag(rev) OVER (ORDER BY d) AS delta
  FROM spine)
"""


# ---------------------------------------------------------------------------
# historical_var_cvar
# ---------------------------------------------------------------------------


def _var_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_series_sql(dialect)},
dh AS (
  SELECT delta AS v, CAST(count(*) AS BIGINT) AS m
  FROM deltas WHERE delta IS NOT NULL GROUP BY delta),
rk AS (
  SELECT v, m,
         sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS cum,
         sum(m) OVER () AS n
  FROM dh),
var_ AS (
  SELECT CAST(min(v) AS BIGINT) AS var_level,
         CAST(max(n) AS BIGINT) AS n_days
  FROM rk WHERE cum >= ({_VAR_PCT} * n + 99) {intdiv} 100),
tail AS (
  SELECT CAST(count(*) AS BIGINT) AS tail_days,
         CAST(sum(delta) AS BIGINT) AS tail_sum
  FROM deltas d CROSS JOIN var_ v
  WHERE d.delta IS NOT NULL AND d.delta <= v.var_level)
SELECT v.n_days, v.var_level, t.tail_days,
       CASE WHEN t.tail_sum >= 0 THEN
         CAST((2000000 * t.tail_sum + t.tail_days)
              {intdiv} (2 * t.tail_days) AS BIGINT)
       ELSE -CAST((2000000 * (-t.tail_sum) + t.tail_days)
              {intdiv} (2 * t.tail_days) AS BIGINT) END
         AS cvar_micro
FROM var_ v CROSS JOIN tail t
"""


def q_historical_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5% historical VaR and the tail-mean CVaR."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_var_sql("spark"))


ORACLE_HISTORICAL_VAR_CVAR = _var_sql("duck")


# ---------------------------------------------------------------------------
# max_drawdown_curve
# ---------------------------------------------------------------------------


def _dd_sql(dialect: str) -> str:
    return f"""
WITH {_series_sql(dialect)},
cum AS (
  SELECT d,
         sum(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS equity
  FROM spine),
peaked AS (
  SELECT d, equity,
         max(equity) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS peak
  FROM cum),
dd AS (
  SELECT d, CAST(peak - equity AS BIGINT) AS drawdown,
         CASE WHEN equity < peak THEN 1 ELSE 0 END AS under
  FROM peaked),
flagged AS (
  SELECT d, drawdown, under,
         CASE WHEN under <> coalesce(lag(under) OVER (ORDER BY d),
           -1) THEN 1 ELSE 0 END AS chg
  FROM dd),
isl AS (
  SELECT d, drawdown, under,
         sum(chg) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS run_id
  FROM flagged),
runs AS (
  SELECT run_id, CAST(max(under) AS BIGINT) AS under,
         CAST(count(*) AS BIGINT) AS run_days
  FROM isl GROUP BY run_id),
worst AS (
  SELECT CAST(max(drawdown) AS BIGINT) AS max_drawdown FROM dd),
wdate AS (
  SELECT min(d.d) AS max_drawdown_date
  FROM dd d CROSS JOIN worst w WHERE d.drawdown = w.max_drawdown)
SELECT w.max_drawdown, x.max_drawdown_date,
       (SELECT CAST(coalesce(max(CASE WHEN under = 1 THEN run_days
          END), 0) AS BIGINT) FROM runs) AS longest_underwater_days
FROM worst w CROSS JOIN wdate x
"""


def q_max_drawdown_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown, its date, and the longest underwater run."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_dd_sql("spark"))


ORACLE_MAX_DRAWDOWN_CURVE = _dd_sql("duck")


# ---------------------------------------------------------------------------
# sharpe_like_ratio
# ---------------------------------------------------------------------------


def _sharpe_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_series_sql(dialect)},
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(delta) AS BIGINT) AS s1,
         CAST(sum(CAST(delta AS {wide}) * delta) AS {wide}) AS s2
  FROM deltas WHERE delta IS NOT NULL)
SELECT n, s1,
       CASE WHEN s1 >= 0 THEN
         CAST((2000000 * s1 + n) {intdiv} (2 * n) AS BIGINT)
       ELSE -CAST((2000000 * (-s1) + n) {intdiv} (2 * n) AS BIGINT)
       END AS mean_micro,
       CAST(floor(sqrt(CAST(CAST(n AS {wide}) * s2
            - CAST(s1 AS {wide}) * s1 AS DOUBLE))
            / CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
         AS sigma_micro,
       CASE WHEN s1 >= 0 THEN
         CAST(floor(CAST(s1 AS DOUBLE)
              / sqrt(CAST(CAST(n AS {wide}) * s2
              - CAST(s1 AS {wide}) * s1 AS DOUBLE)) * 1e6 + 0.5)
              AS BIGINT)
       ELSE -CAST(floor(-CAST(s1 AS DOUBLE)
              / sqrt(CAST(CAST(n AS {wide}) * s2
              - CAST(s1 AS {wide}) * s1 AS DOUBLE)) * 1e6 + 0.5)
              AS BIGINT) END AS sharpe_like_micro
FROM mom
"""


def q_sharpe_like_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/σ of the deltas, exact moments, one IEEE sqrt."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_sharpe_sql("spark"))


ORACLE_SHARPE_LIKE_RATIO = _sharpe_sql("duck")


# ---------------------------------------------------------------------------
# volatility_regimes
# ---------------------------------------------------------------------------


def _vol_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_series_sql(dialect)},
ab AS (
  SELECT d, abs(delta) AS a FROM deltas WHERE delta IS NOT NULL),
ah AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS m FROM ab
       GROUP BY a),
ar AS (
  SELECT v, sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS cum, sum(m) OVER () AS n
  FROM ah),
med AS (SELECT CAST(min(v) AS BIGINT) AS med FROM ar
        WHERE cum >= (n + 1) {intdiv} 2),
st AS (
  SELECT ab.d, CASE WHEN ab.a > m.med THEN 1 ELSE 0 END AS hi
  FROM ab CROSS JOIN med m),
flagged AS (
  SELECT d, hi,
         CASE WHEN hi <> coalesce(lag(hi) OVER (ORDER BY d), -1)
           THEN 1 ELSE 0 END AS chg
  FROM st),
isl AS (
  SELECT d, hi,
         sum(chg) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS run_id
  FROM flagged),
runs AS (
  SELECT run_id, CAST(max(hi) AS BIGINT) AS hi,
         CAST(count(*) AS BIGINT) AS run_days
  FROM isl GROUP BY run_id)
SELECT hi AS high_vol,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(run_days) AS BIGINT) AS total_days,
       CAST(max(run_days) AS BIGINT) AS longest_days
FROM runs GROUP BY hi
"""


def q_volatility_regimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High/low-volatility islands around the exact |delta| median."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_vol_sql("spark"))


ORACLE_VOLATILITY_REGIMES = _vol_sql("duck")


# ---------------------------------------------------------------------------
# kelly_fraction
# ---------------------------------------------------------------------------


def _kelly_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_series_sql(dialect)},
sides AS (
  SELECT CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_up,
         CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dn,
         CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
              AS BIGINT) AS s_up,
         CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
              AS BIGINT) AS s_dn
  FROM deltas WHERE delta IS NOT NULL AND delta <> 0)
SELECT n_up, n_dn, s_up, s_dn,
       CAST((2000000 * n_up + (n_up + n_dn))
            {intdiv} (2 * (n_up + n_dn)) AS BIGINT) AS p_micro,
       -- b = (s_up/n_up)/(s_dn/n_dn) = s_up*n_dn/(s_dn*n_up)
       CAST((2000000 * CAST(s_up AS {wide}) * n_dn
            + CAST(s_dn AS {wide}) * n_up)
            {intdiv} (2 * CAST(s_dn AS {wide}) * n_up) AS BIGINT)
         AS b_micro,
       -- f* = p - (1-p)/b = (p*b - (1-p))/b with exact rationals:
       -- numerator = n_up*s_up*n_dn - n_dn*(s_dn*n_up) ... computed
       -- on the common denominator (n_up+n_dn)*s_up*n_dn
       CASE WHEN CAST(n_up AS {wide}) * s_up * n_dn
                 >= CAST(n_dn AS {wide}) * s_dn * n_up THEN
         CAST((2000000 * (CAST(n_up AS {wide}) * s_up * n_dn
              - CAST(n_dn AS {wide}) * s_dn * n_up)
              + (CAST(n_up + n_dn AS {wide}) * s_up * n_dn))
              {intdiv} (2 * CAST(n_up + n_dn AS {wide}) * s_up
              * n_dn) AS BIGINT)
       ELSE -CAST((2000000 * (CAST(n_dn AS {wide}) * s_dn * n_up
              - CAST(n_up AS {wide}) * s_up * n_dn)
              + (CAST(n_up + n_dn AS {wide}) * s_up * n_dn))
              {intdiv} (2 * CAST(n_up + n_dn AS {wide}) * s_up
              * n_dn) AS BIGINT) END AS kelly_micro
FROM sides
"""


def q_kelly_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rational Kelly fraction from up/down day statistics."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_kelly_sql("spark"))


ORACLE_KELLY_FRACTION = _kelly_sql("duck")


RISK_QUERIES = {
    "historical_var_cvar": q_historical_var_cvar,
    "max_drawdown_curve": q_max_drawdown_curve,
    "sharpe_like_ratio": q_sharpe_like_ratio,
    "volatility_regimes": q_volatility_regimes,
    "kelly_fraction": q_kelly_fraction,
}

RISK_ORACLES = {
    "historical_var_cvar": ORACLE_HISTORICAL_VAR_CVAR,
    "max_drawdown_curve": ORACLE_MAX_DRAWDOWN_CURVE,
    "sharpe_like_ratio": ORACLE_SHARPE_LIKE_RATIO,
    "volatility_regimes": ORACLE_VOLATILITY_REGIMES,
    "kelly_fraction": ORACLE_KELLY_FRACTION,
}

_q.QUERIES.update(RISK_QUERIES)
_q.ORACLES.update(RISK_ORACLES)
