"""Robust grid-fit catalog, round 4 (wave 88): five operators built
on the broadcast-grid × partial-agg × distributed-argmin shape — the
way a cluster fits robust regressions without closed forms.  Series:
total daily demand y_t (Σ⌊l_quantity⌋ by ship day) against the day
index t (row_number over the bounded day frame).  Candidate grids are
DATA-DERIVED exact integers (intercepts around the mean, slopes in
unit steps), so every residual is an exact BIGINT and every loss an
exact integer sum.

* ``quantile_regression_grid`` — pinball-loss fit at τ ∈ {{1/2,
  9/10}}: loss·den = Σ num·r⁺ + (den−num)·r⁻ (exact), per-candidate
  partial agg, argmin via min(struct(loss, b0, b1)) — one row per τ.
* ``huber_regression_grid`` — the same grid under Huber loss with
  data-derived δ = mean/10: r² inside, 2δ|r|−δ² outside, exact
  integers; best candidate row.
* ``lad_vs_ols_compare`` — the robustness trade certified: the
  L1-best grid candidate vs the exact closed-form OLS line (Cramer
  from DECIMAL moment sums, the ``ols_regression`` doctrine), each
  scored on BOTH per-day L1 and L2 micro — LAD wins L1, OLS wins L2,
  emitted as 2 rows × 2 losses.
* ``grid_refinement_audit`` — two-stage search in one DAG: coarse
  argmin, then a fine grid built AROUND the winner (broadcast join of
  the 1-row winner to the refinement offsets); certifies
  fine_loss ≤ coarse_loss and reports both.
* ``breakdown_point_demo`` — contamination study: the {_BP_PCT}% of
  days picked by the portable hash get 10× demand; the OLS slope
  (closed form) and the LAD grid slope are fit on clean AND
  contaminated series in one pass each — the slope shifts show the
  L2 estimator breaking while LAD holds.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_gridfit_wave.py.

Cross-engine float policy: residuals, pinball/Huber losses, and the
Cramer determinants are exact BIGINT / DECIMAL(38,0)-vs-HUGEINT; the
reported per-day means are half-up micro rationals; no libm calls in
this wave.

Scale notes: the series is the calendar-bounded day frame; the grid
(≤ ~10²) broadcasts against it, losses reduce by partial agg to one
row per candidate, and the argmin is a 1-row min(struct) — no sort,
no collect, no corpus-sized window.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_TAUS = [(1, 2), (9, 10)]
_BP_PCT = 5


def _series_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    return """
daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)),
ser AS (
  SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t, y, d
  FROM daily),
anchor AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s1
  FROM ser),
-- data-derived grid: intercepts k/10 of the mean for k=6..14,
-- slopes -5..5 demand-units/day
b0s AS (
  SELECT CAST((a.s1 * k.k) {IDIV} (10 * a.n) AS BIGINT) AS b0
  FROM anchor a CROSS JOIN ({K612}) k),
b1s AS (SELECT CAST(j.j AS BIGINT) AS b1 FROM ({JM55}) j),
grid AS (SELECT b0, b1 FROM b0s CROSS JOIN b1s)
""".format(
        IDIV=idiv,
        K612=(
            "SELECT explode(sequence(6, 14)) AS k"
            if dialect == "spark"
            else "SELECT unnest(generate_series(6, 14)) AS k"
        ),
        JM55=(
            "SELECT explode(sequence(-5, 5)) AS j"
            if dialect == "spark"
            else "SELECT unnest(generate_series(-5, 5)) AS j"
        ),
    )


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# quantile_regression_grid
# ---------------------------------------------------------------------------


def _qrg_sql(dialect: str) -> str:
    taus = ", ".join(f"({n}, {d})" for n, d in _TAUS)
    st = (
        "struct(loss_den, b0, b1)"
        if dialect == "spark"
        else "struct_pack(loss_den := loss_den, b0 := b0, b1 := b1)"
    )
    return f"""
WITH {_series_sql(dialect)},
taus AS (SELECT * FROM (VALUES {taus}) AS t(tau_num, tau_den)),
losses AS (
  SELECT x.tau_num, x.tau_den, g.b0, g.b1,
         CAST(sum(CASE WHEN s.y - (g.b0 + g.b1 * s.t) >= 0
           THEN x.tau_num * (s.y - (g.b0 + g.b1 * s.t))
           ELSE (x.tau_den - x.tau_num)
             * ((g.b0 + g.b1 * s.t) - s.y) END) AS BIGINT)
           AS loss_den
  FROM ser s CROSS JOIN grid g CROSS JOIN taus x
  GROUP BY x.tau_num, x.tau_den, g.b0, g.b1),
best AS (
  SELECT tau_num, tau_den,
         min({st}) AS b
  FROM losses GROUP BY tau_num, tau_den)
SELECT CAST(tau_num AS BIGINT) AS tau_num,
       CAST(tau_den AS BIGINT) AS tau_den,
       b.loss_den AS best_loss_den,
       b.b0 AS best_b0, b.b1 AS best_b1
FROM best
"""


def q_quantile_regression_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pinball-loss grid fit at each τ; exact integer losses,
    min(struct) argmin."""
    return _run(spark, sf_dir, _qrg_sql("spark"))


ORACLE_QUANTILE_REGRESSION_GRID = _qrg_sql("duck")


# ---------------------------------------------------------------------------
# huber_regression_grid
# ---------------------------------------------------------------------------


def _hrg_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    st = (
        "struct(loss, b0, b1)"
        if dialect == "spark"
        else "struct_pack(loss := loss, b0 := b0, b1 := b1)"
    )
    return f"""
WITH {_series_sql(dialect)},
delta AS (
  SELECT CAST(s1 {{IDIV2}} (10 * n) AS BIGINT) AS dlt FROM anchor),
losses AS (
  SELECT g.b0, g.b1,
         CAST(sum(CASE WHEN abs(s.y - (g.b0 + g.b1 * s.t)) <= x.dlt
           THEN (s.y - (g.b0 + g.b1 * s.t))
                * (s.y - (g.b0 + g.b1 * s.t))
           ELSE 2 * x.dlt * abs(s.y - (g.b0 + g.b1 * s.t))
                - x.dlt * x.dlt END) AS BIGINT) AS loss
  FROM ser s CROSS JOIN grid g CROSS JOIN delta x
  GROUP BY g.b0, g.b1),
best AS (SELECT min({st}) AS b FROM losses)
SELECT (SELECT dlt FROM delta) AS delta_units,
       b.loss AS best_loss, b.b0 AS best_b0, b.b1 AS best_b1
FROM best
""".replace("{IDIV2}", idiv)


def q_huber_regression_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber-loss grid fit with data-derived δ = mean/10."""
    return _run(spark, sf_dir, _hrg_sql("spark"))


ORACLE_HUBER_REGRESSION_GRID = _hrg_sql("duck")


# ---------------------------------------------------------------------------
# lad_vs_ols_compare
# ---------------------------------------------------------------------------


def _lvo_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    st1 = (
        "struct(l1, b0, b1)"
        if dialect == "spark"
        else "struct_pack(l1 := l1, b0 := b0, b1 := b1)"
    )
    return f"""
WITH {_series_sql(dialect)},
-- exact OLS via Cramer on wide integers: D = n*Stt - St^2
mom AS (
  SELECT CAST(count(*) AS {wide}) AS n,
         CAST(sum(t) AS {wide}) AS st,
         CAST(sum(t * t) AS {wide}) AS stt,
         CAST(sum(y) AS {wide}) AS sy,
         CAST(sum(t * y) AS {wide}) AS sty
  FROM ser),
ols AS (
  SELECT n * stt - st * st AS dd,
         sy * stt - sty * st AS b0n,
         n * sty - st * sy AS b1n
  FROM mom),
lad AS (
  SELECT min({st1}) AS b FROM (
    SELECT g.b0, g.b1,
           CAST(sum(abs(s.y - (g.b0 + g.b1 * s.t))) AS BIGINT) AS l1
    FROM ser s CROSS JOIN grid g GROUP BY g.b0, g.b1) t),
scored AS (
  SELECT 'lad_grid' AS method,
         CAST((2000000 * sum(CAST(abs(s.y - (l.b.b0 + l.b.b1 * s.t))
              AS {wide})) + count(*)) {intdiv} (2 * count(*))
              AS BIGINT) AS l1_per_day_micro,
         CAST((2000000 * sum(CAST(s.y - (l.b.b0 + l.b.b1 * s.t)
              AS {wide}) * (s.y - (l.b.b0 + l.b.b1 * s.t)))
              + count(*)) {intdiv} (2 * count(*)) AS BIGINT)
           AS l2_per_day_micro
  FROM ser s CROSS JOIN lad l
  UNION ALL
  SELECT 'ols_exact' AS method,
         CAST((2000000 * sum(abs(CAST(o.dd AS {wide}) * s.y
              - (o.b0n + o.b1n * s.t))) + count(*) * o.dd)
              {intdiv} (2 * count(*) * o.dd) AS BIGINT)
           AS l1_per_day_micro,
         CAST(floor(CAST(sum((CAST(o.dd AS {wide}) * s.y
              - (o.b0n + o.b1n * s.t))
              * (CAST(o.dd AS {wide}) * s.y - (o.b0n + o.b1n * s.t)))
              AS DOUBLE) / CAST(count(*) * o.dd * o.dd AS DOUBLE)
              * 1e6 + 0.5) AS BIGINT) AS l2_per_day_micro
  FROM ser s CROSS JOIN ols o
  GROUP BY o.dd, o.b0n, o.b1n)
SELECT method, l1_per_day_micro, l2_per_day_micro FROM scored
"""


def q_lad_vs_ols_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAD grid winner vs the exact closed-form OLS line, both
    scored on per-day L1 and L2 micro."""
    return _run(spark, sf_dir, _lvo_sql("spark"))


ORACLE_LAD_VS_OLS_COMPARE = _lvo_sql("duck")


# ---------------------------------------------------------------------------
# grid_refinement_audit
# ---------------------------------------------------------------------------


def _gra_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    offs = (
        "SELECT explode(sequence(-4, 4)) AS o"
        if dialect == "spark"
        else "SELECT unnest(generate_series(-4, 4)) AS o"
    )
    s1 = (
        "struct(l1, b0, b1)"
        if dialect == "spark"
        else "struct_pack(l1 := l1, b0 := b0, b1 := b1)"
    )
    return f"""
WITH {_series_sql(dialect)},
coarse AS (
  SELECT min({s1}) AS b FROM (
    SELECT g.b0, g.b1,
           CAST(sum(abs(s.y - (g.b0 + g.b1 * s.t))) AS BIGINT) AS l1
    FROM ser s CROSS JOIN grid g GROUP BY g.b0, g.b1) t),
-- fine grid: winner b0 ± 4 steps of (mean/100), winner b1 fixed
step AS (SELECT greatest(CAST(1 AS BIGINT),
         CAST(s1 {{IDIV3}} (100 * n) AS BIGINT)) AS stp FROM anchor),
fine_grid AS (
  SELECT DISTINCT c.b.b0 + o.o * p.stp AS b0, c.b.b1 AS b1
  FROM coarse c CROSS JOIN ({offs}) o CROSS JOIN step p),
fine AS (
  SELECT min({s1}) AS b FROM (
    SELECT g.b0, g.b1,
           CAST(sum(abs(s.y - (g.b0 + g.b1 * s.t))) AS BIGINT) AS l1
    FROM ser s CROSS JOIN fine_grid g GROUP BY g.b0, g.b1) t)
SELECT c.b.l1 AS coarse_loss, c.b.b0 AS coarse_b0,
       c.b.b1 AS coarse_b1,
       f.b.l1 AS fine_loss, f.b.b0 AS fine_b0, f.b.b1 AS fine_b1,
       f.b.l1 <= c.b.l1 AS improved_or_equal
FROM coarse c CROSS JOIN fine f
""".replace("{IDIV3}", idiv)


def q_grid_refinement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse L1 argmin, then a fine grid around the winner; the
    refinement must not regress (flag emitted)."""
    return _run(spark, sf_dir, _gra_sql("spark"))


ORACLE_GRID_REFINEMENT_AUDIT = _gra_sql("duck")


# ---------------------------------------------------------------------------
# breakdown_point_demo
# ---------------------------------------------------------------------------


def _bpd_sql(dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    s1 = (
        "struct(l1, b1)"
        if dialect == "spark"
        else "struct_pack(l1 := l1, b1 := b1)"
    )

    def hexv(j: int) -> str:
        return (
            f"(instr('0123456789abcdef', substr(md5("
            f"CAST(d AS {strtype}) || ':bp'"
            f"), {j}, 1)) - 1)"
        )

    h = (
        f"(((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)})"
        f" * 16 + {hexv(4)}) % 100)"
    )
    return f"""
WITH {_series_sql(dialect)},
both_ AS (
  SELECT t, y, 0 AS contaminated FROM ser
  UNION ALL
  SELECT t, CASE WHEN {h} < {_BP_PCT} THEN 10 * y ELSE y END AS y,
         1 AS contaminated
  FROM ser),
mom AS (
  SELECT contaminated,
         CAST(count(*) AS {wide}) AS n, CAST(sum(t) AS {wide}) AS st,
         CAST(sum(t * t) AS {wide}) AS stt,
         CAST(sum(y) AS {wide}) AS sy,
         CAST(sum(t * y) AS {wide}) AS sty
  FROM both_ GROUP BY contaminated),
ols AS (
  SELECT contaminated,
         CAST((2000000 * (n * sty - st * sy)
              + (n * stt - st * st)) {intdiv}
              (2 * (n * stt - st * st)) AS BIGINT)
           AS ols_slope_micro
  FROM mom),
lad AS (
  SELECT contaminated, min({s1}) AS b FROM (
    SELECT b.contaminated, g.b0, g.b1,
           CAST(sum(abs(b.y - (g.b0 + g.b1 * b.t))) AS BIGINT) AS l1
    FROM both_ b CROSS JOIN grid g
    GROUP BY b.contaminated, g.b0, g.b1) t
  GROUP BY contaminated)
SELECT CAST(o.contaminated AS BIGINT) AS contaminated,
       o.ols_slope_micro,
       1000000 * l.b.b1 AS lad_slope_micro
FROM ols o JOIN lad l ON l.contaminated = o.contaminated
"""


def q_breakdown_point_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS vs LAD slopes on clean and hash-contaminated series —
    the L2 estimator moves, the L1 grid winner barely does."""
    return _run(spark, sf_dir, _bpd_sql("spark"))


ORACLE_BREAKDOWN_POINT_DEMO = _bpd_sql("duck")


GRIDFIT_QUERIES = {
    "quantile_regression_grid": q_quantile_regression_grid,
    "huber_regression_grid": q_huber_regression_grid,
    "lad_vs_ols_compare": q_lad_vs_ols_compare,
    "grid_refinement_audit": q_grid_refinement_audit,
    "breakdown_point_demo": q_breakdown_point_demo,
}

GRIDFIT_ORACLES = {
    "quantile_regression_grid": ORACLE_QUANTILE_REGRESSION_GRID,
    "huber_regression_grid": ORACLE_HUBER_REGRESSION_GRID,
    "lad_vs_ols_compare": ORACLE_LAD_VS_OLS_COMPARE,
    "grid_refinement_audit": ORACLE_GRID_REFINEMENT_AUDIT,
    "breakdown_point_demo": ORACLE_BREAKDOWN_POINT_DEMO,
}

_q.QUERIES.update(GRIDFIT_QUERIES)
_q.ORACLES.update(GRIDFIT_ORACLES)
