"""Queueing-theory catalog, round 4 (wave 79): five operators reading
the order→ship pipeline as a G/G/c queueing system — arrivals at
o_orderdate, departures at the order's last lineitem shipdate.  The
fixture's shipdates are not ordered against order dates (291/1473
orders at sf0.001 ship "before" ordering), so every interval op uses
the fulfillment wave's sign-safe doctrine: the active interval is
[least(arr, dep), greatest(arr, dep)] and the wait is the absolute
day difference.

* ``littles_law_audit`` — certifies L = λ·W by computing the same
  order-days mass TWO independent distributed ways: (a) the moment
  route Σᵢ waitᵢ from per-order partial aggs, (b) the step-function
  route ∫backlog(t)dt = Σₖ cumₖ·(dₖ₊₁−dₖ) over the ±1 delta prefix
  sum at distinct interval endpoints.  Reports both, the identity gap
  (exactly 0), and λ / W̄ / L̄ in half-up micro.
* ``erlang_blocking_grid`` — Erlang-B blocking probability B(c, a)
  at the measured offered load a = λ·E[S], for a server grid c =
  ⌈a·f⌉ over capacity factors {_EB_FACTORS}% — via the canonical
  recursion B_k = a·B_{k−1}/(k + a·B_{k−1}) run inside a bounded
  fold (Spark ``aggregate`` / DuckDB ``list_reduce``), verified
  bit-identical across engines; utilization a/c as an exact rational
  micro.
* ``peak_backlog_profile`` — per month: the peak and month-end depth
  of the running open-order backlog (the cum step function evaluated
  at its own breakpoints).
* ``kingman_wait_estimate`` — the G/G/1 Kingman approximation
  W_q ≈ ρ/(1−ρ)·(C_a²+C_s²)/2·E[S] with every ingredient exact:
  interarrival moments come from the day histogram alone (telescoping:
  Σgap = span and Σgap² = Σ adjacent-distinct-day gaps², because
  same-day arrival gaps are 0 at day granularity), service moments
  from one per-order scan; C² values as exact rationals in micro; the
  final Kingman product is one row-local IEEE expression on exact
  integers, micro-quantized.
* ``busy_period_profile`` — gaps-and-islands on the backlog step
  function: maximal busy (>0) runs — count, total busy/idle days,
  the longest run, and the idle fraction of the horizon in micro.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus a fold-portability pin in tests/test_queueing_wave.py.

Cross-engine float policy: day arithmetic, delta prefix sums, and all
C² / utilization rationals are exact BIGINT half-up micro; the two
floating computations (Erlang-B fold, Kingman product) are identical
IEEE operation sequences on exact-integer-derived DOUBLEs,
micro-quantized with floor(x·1e6+0.5).

Scale notes: per-order intervals come from one orders⋈lineitem
shuffle on o_orderkey (partial max per order); every window after
that orders only the bounded distinct-endpoint frame (≤ horizon days,
~2.5k rows regardless of order count); the Erlang fold is row-local
over a ≤⌈1.25a⌉-step sequence; no corpus-sized window, no driver
loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_EB_FACTORS = [50, 80, 90, 100, 110, 125]


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-safe per-order active interval [lo, hi] in DATEs plus the
    wait in days — one shuffle on o_orderkey."""
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "CAST(o_orderdate AS DATE) AS arr"
    )
    dep = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.expr("CAST(max(l_shipdate) AS DATE)").alias("dep"))
    )
    return o.join(dep, o.o_orderkey == dep.l_orderkey).selectExpr(
        "o_orderkey",
        "least(arr, dep) AS lo",
        "greatest(arr, dep) AS hi",
        "CAST(datediff(greatest(arr, dep), least(arr, dep)) AS BIGINT)"
        " AS wait_days",
    )


_INTERVALS_SQL = """
iv AS (
  SELECT o.o_orderkey,
         least(CAST(o.o_orderdate AS DATE), d.dep) AS lo,
         greatest(CAST(o.o_orderdate AS DATE), d.dep) AS hi,
         CAST(greatest(CAST(o.o_orderdate AS DATE), d.dep)
              - least(CAST(o.o_orderdate AS DATE), d.dep) AS BIGINT)
           AS wait_days
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(max(l_shipdate) AS DATE) AS dep
        FROM lineitem GROUP BY l_orderkey) d
    ON d.l_orderkey = o.o_orderkey)
"""

# the backlog step function: ±1 deltas at interval endpoints, cum depth
# per distinct breakpoint, and the days until the next breakpoint.
_STEP_SQL = """
deltas AS (
  SELECT d, CAST(sum(dv) AS BIGINT) AS dv FROM (
    SELECT lo AS d, 1 AS dv FROM iv
    UNION ALL
    SELECT hi AS d, -1 AS dv FROM iv) u
  GROUP BY d),
step AS (
  SELECT d,
         CAST(sum(dv) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS depth,
         CAST(lead(d) OVER (ORDER BY d) - d AS BIGINT) AS seg_days
  FROM deltas)
"""


def _step(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _intervals(spark, sf_dir)
    deltas = (
        iv.selectExpr("lo AS d", "1L AS dv")
        .unionAll(iv.selectExpr("hi AS d", "-1L AS dv"))
        .groupBy("d")
        .agg(F.sum("dv").cast("long").alias("dv"))
    )
    return deltas.selectExpr(
        "d",
        "CAST(sum(dv) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS BIGINT) AS depth",
        "CAST(datediff(lead(d) OVER (ORDER BY d), d) AS BIGINT)"
        " AS seg_days",
    )


# ---------------------------------------------------------------------------
# littles_law_audit
# ---------------------------------------------------------------------------


def q_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L = λ·W certified by two independent routes: per-order wait
    sums vs the backlog step integral; identity_gap must be 0."""
    iv = _q._persist_tracked(_intervals(spark, sf_dir))
    mom = iv.agg(
        F.count("*").cast("long").alias("n_jobs"),
        F.sum("wait_days").cast("long").alias("sum_wait_days"),
        F.expr("CAST(datediff(max(hi), min(lo)) AS BIGINT)").alias(
            "horizon_days"
        ),
    )
    integ = (
        _step(spark, sf_dir)
        .where("seg_days IS NOT NULL")
        .agg(
            F.sum(F.expr("depth * seg_days")).cast("long").alias(
                "backlog_integral"
            )
        )
    )
    return mom.crossJoin(F.broadcast(integ)).selectExpr(
        "n_jobs",
        "horizon_days",
        "sum_wait_days",
        "backlog_integral",
        "sum_wait_days - backlog_integral AS identity_gap",
        "CAST((2000000 * n_jobs + horizon_days) DIV (2 * horizon_days)"
        " AS BIGINT) AS lambda_micro",
        "CAST((2000000 * sum_wait_days + n_jobs) DIV (2 * n_jobs)"
        " AS BIGINT) AS wait_mean_micro",
        "CAST((2000000 * sum_wait_days + horizon_days)"
        " DIV (2 * horizon_days) AS BIGINT) AS wip_mean_micro",
    )


ORACLE_LITTLES_LAW_AUDIT = f"""
WITH {_INTERVALS_SQL},
{_STEP_SQL},
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n_jobs,
         CAST(sum(wait_days) AS BIGINT) AS sum_wait_days,
         CAST(max(hi) - min(lo) AS BIGINT) AS horizon_days
  FROM iv),
integ AS (
  SELECT CAST(sum(depth * seg_days) AS BIGINT) AS backlog_integral
  FROM step WHERE seg_days IS NOT NULL)
SELECT n_jobs, horizon_days, sum_wait_days, backlog_integral,
       sum_wait_days - backlog_integral AS identity_gap,
       CAST((2000000 * n_jobs + horizon_days) // (2 * horizon_days)
            AS BIGINT) AS lambda_micro,
       CAST((2000000 * sum_wait_days + n_jobs) // (2 * n_jobs)
            AS BIGINT) AS wait_mean_micro,
       CAST((2000000 * sum_wait_days + horizon_days)
            // (2 * horizon_days) AS BIGINT) AS wip_mean_micro
FROM mom CROSS JOIN integ
"""


# ---------------------------------------------------------------------------
# erlang_blocking_grid
# ---------------------------------------------------------------------------


def q_erlang_blocking_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-B B(c, a) at the measured offered load for c = ⌈a·f⌉
    over the capacity-factor grid, via the bounded canonical fold."""
    iv = _intervals(spark, sf_dir)
    base = iv.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("wait_days").cast("long").alias("sw"),
        F.expr("CAST(datediff(max(hi), min(lo)) AS BIGINT)").alias("span"),
    )
    grid = spark.createDataFrame(
        [(f,) for f in _EB_FACTORS], "f_pct long"
    )
    # offered load a = λ·E[S] = ((n-1)·Σs)/(span·n) — exact BIGINT
    # rational, one IEEE division; c = ceil(a·f%) in exact integers.
    return base.crossJoin(F.broadcast(grid)).selectExpr(
        "f_pct",
        "CAST(((n - 1) * sw * f_pct + span * n * 100 - 1)"
        " DIV (span * n * 100) AS BIGINT) AS c_servers",
        "CAST((2000000 * (CAST(n - 1 AS DECIMAL(38,0)) * sw) + span * n)"
        " DIV (2 * span * n) AS BIGINT) AS offered_load_micro",
        "CAST((2000000 * (CAST(n - 1 AS DECIMAL(38,0)) * sw) + span * n"
        " * (((n - 1) * sw * f_pct + span * n * 100 - 1)"
        " DIV (span * n * 100))) DIV (2 * span * n"
        " * (((n - 1) * sw * f_pct + span * n * 100 - 1)"
        " DIV (span * n * 100))) AS BIGINT) AS utilization_micro",
        "CAST(floor(aggregate(sequence(1, CAST(((n - 1) * sw * f_pct"
        " + span * n * 100 - 1) DIV (span * n * 100) AS INT)),"
        " CAST(1.0 AS DOUBLE),"
        " (acc, k) -> (CAST((n - 1) * sw AS DOUBLE)"
        " / CAST(span * n AS DOUBLE)) * acc / (CAST(k AS DOUBLE)"
        " + (CAST((n - 1) * sw AS DOUBLE) / CAST(span * n AS DOUBLE))"
        " * acc)) * 1e6 + 0.5) AS BIGINT) AS blocking_micro",
    )


ORACLE_ERLANG_BLOCKING_GRID = f"""
WITH {_INTERVALS_SQL},
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(wait_days) AS BIGINT) AS sw,
         CAST(max(hi) - min(lo) AS BIGINT) AS span
  FROM iv),
grid AS (
  SELECT * FROM (VALUES {", ".join(f"({f})" for f in _EB_FACTORS)})
    AS t(f_pct))
SELECT CAST(f_pct AS BIGINT) AS f_pct,
       CAST(((n - 1) * sw * f_pct + span * n * 100 - 1)
            // (span * n * 100) AS BIGINT) AS c_servers,
       CAST((2000000 * (CAST(n - 1 AS HUGEINT) * sw) + span * n)
            // (2 * span * n) AS BIGINT) AS offered_load_micro,
       CAST((2000000 * (CAST(n - 1 AS HUGEINT) * sw) + span * n
            * (((n - 1) * sw * f_pct + span * n * 100 - 1)
               // (span * n * 100))) // (2 * span * n
            * (((n - 1) * sw * f_pct + span * n * 100 - 1)
               // (span * n * 100))) AS BIGINT) AS utilization_micro,
       CAST(floor(list_reduce(
         list_prepend(CAST(1.0 AS DOUBLE),
           [CAST(k AS DOUBLE) FOR k IN range(1,
              CAST(((n - 1) * sw * f_pct + span * n * 100 - 1)
                   // (span * n * 100) AS INT) + 1)]),
         (acc, k) -> (CAST((n - 1) * sw AS DOUBLE)
           / CAST(span * n AS DOUBLE)) * acc / (k
           + (CAST((n - 1) * sw AS DOUBLE) / CAST(span * n AS DOUBLE))
           * acc)) * 1e6 + 0.5) AS BIGINT) AS blocking_micro
FROM base CROSS JOIN grid
"""


# ---------------------------------------------------------------------------
# peak_backlog_profile
# ---------------------------------------------------------------------------


def q_peak_backlog_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak and month-end open-order backlog per month, from the step
    function at its own breakpoints (bounded frame)."""
    step = _step(spark, sf_dir)
    return (
        step.selectExpr(
            "CAST(date_trunc('month', d) AS DATE) AS month",
            "d",
            "depth",
        )
        .groupBy("month")
        .agg(
            F.max("depth").cast("long").alias("peak_backlog"),
            F.min("depth").cast("long").alias("min_backlog"),
            F.expr("max_by(depth, d)").cast("long").alias("end_backlog"),
            F.count("*").cast("long").alias("n_breakpoints"),
        )
    )


ORACLE_PEAK_BACKLOG_PROFILE = f"""
WITH {_INTERVALS_SQL},
{_STEP_SQL}
SELECT CAST(date_trunc('month', d) AS DATE) AS month,
       CAST(max(depth) AS BIGINT) AS peak_backlog,
       CAST(min(depth) AS BIGINT) AS min_backlog,
       CAST(max_by(depth, d) AS BIGINT) AS end_backlog,
       CAST(count(*) AS BIGINT) AS n_breakpoints
FROM step GROUP BY date_trunc('month', d)
"""


# ---------------------------------------------------------------------------
# kingman_wait_estimate
# ---------------------------------------------------------------------------


def q_kingman_wait_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G/G/1 Kingman W_q from exact moment ingredients: interarrival
    C² via the day-histogram telescoping identity, service C² from
    one per-order scan."""
    o = _t(spark, sf_dir, "orders").selectExpr(
        "CAST(o_orderdate AS DATE) AS ad"
    )
    days = o.groupBy("ad").agg(F.count("*").cast("long").alias("m"))
    ia = (
        days.selectExpr(
            "ad",
            "CAST(datediff(ad, lag(ad) OVER (ORDER BY ad)) AS BIGINT)"
            " AS gap",
        )
        .agg(
            F.sum(F.expr("gap * gap")).cast("long").alias("sum_gap2"),
        )
    )
    arr = o.agg(
        F.count("*").cast("long").alias("n_arr"),
        F.expr("CAST(datediff(max(ad), min(ad)) AS BIGINT)").alias("span"),
    )
    sv = _intervals(spark, sf_dir).agg(
        F.count("*").cast("long").alias("n_jobs"),
        F.sum("wait_days").cast("long").alias("s1"),
        F.sum(F.expr("wait_days * wait_days")).cast("long").alias("s2"),
    )
    return (
        arr.crossJoin(F.broadcast(ia))
        .crossJoin(F.broadcast(sv))
        .selectExpr(
            "n_arr",
            "span",
            "n_jobs",
            # interarrival: mean = span/(n-1); CV² exact rational
            "CAST((2000000 * span + (n_arr - 1)) DIV (2 * (n_arr - 1))"
            " AS BIGINT) AS ia_mean_micro",
            "CAST((2000000 * (CAST(n_arr - 1 AS DECIMAL(38,0)) * sum_gap2"
            " - CAST(span AS DECIMAL(38,0)) * span) + span * span)"
            " DIV (2 * span * span) AS BIGINT) AS ia_cv2_micro",
            "CAST((2000000 * s1 + n_jobs) DIV (2 * n_jobs) AS BIGINT)"
            " AS svc_mean_micro",
            "CAST((2000000 * (CAST(n_jobs AS DECIMAL(38,0)) * s2"
            " - CAST(s1 AS DECIMAL(38,0)) * s1) + s1 * s1)"
            " DIV (2 * s1 * s1) AS BIGINT) AS svc_cv2_micro",
            "sum_gap2",
            "s1",
            "s2",
        )
        .selectExpr(
            "n_arr",
            "span",
            "n_jobs",
            "ia_mean_micro",
            "ia_cv2_micro",
            "svc_mean_micro",
            "svc_cv2_micro",
            # ρ = a/c at c = floor(a)+1; Kingman in one IEEE expression
            # over the exact ingredients (a = (n-1)·s1/(span·n_jobs))
            "CAST(floor("
            " ((CAST((n_arr - 1) AS DOUBLE) * CAST(s1 AS DOUBLE)"
            "   / (CAST(span AS DOUBLE) * CAST(n_jobs AS DOUBLE)))"
            "  / (floor(CAST((n_arr - 1) * s1 AS DOUBLE)"
            "       / CAST(span * n_jobs AS DOUBLE)) + 1.0D))"
            " / (1.0D - (CAST((n_arr - 1) AS DOUBLE) * CAST(s1 AS DOUBLE)"
            "   / (CAST(span AS DOUBLE) * CAST(n_jobs AS DOUBLE)))"
            "  / (floor(CAST((n_arr - 1) * s1 AS DOUBLE)"
            "       / CAST(span * n_jobs AS DOUBLE)) + 1.0D))"
            " * ((CAST(ia_cv2_micro AS DOUBLE) + CAST(svc_cv2_micro"
            "     AS DOUBLE)) / 2e6)"
            " * (CAST(s1 AS DOUBLE) / CAST(n_jobs AS DOUBLE))"
            " * 1e6 + 0.5) AS BIGINT) AS kingman_wq_micro",
        )
    )


ORACLE_KINGMAN_WAIT_ESTIMATE = f"""
WITH {_INTERVALS_SQL},
days AS (
  SELECT CAST(o_orderdate AS DATE) AS ad, CAST(count(*) AS BIGINT) AS m
  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
ia AS (
  SELECT CAST(sum(gap * gap) AS BIGINT) AS sum_gap2 FROM (
    SELECT CAST(ad - lag(ad) OVER (ORDER BY ad) AS BIGINT) AS gap
    FROM days) g),
arr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_arr,
         CAST(max(CAST(o_orderdate AS DATE))
              - min(CAST(o_orderdate AS DATE)) AS BIGINT) AS span
  FROM orders),
sv AS (
  SELECT CAST(count(*) AS BIGINT) AS n_jobs,
         CAST(sum(wait_days) AS BIGINT) AS s1,
         CAST(sum(wait_days * wait_days) AS BIGINT) AS s2
  FROM iv),
sc AS (
  SELECT n_arr, span, n_jobs, sum_gap2, s1, s2,
         CAST((2000000 * span + (n_arr - 1)) // (2 * (n_arr - 1))
              AS BIGINT) AS ia_mean_micro,
         CAST((2000000 * (CAST(n_arr - 1 AS HUGEINT) * sum_gap2
              - CAST(span AS HUGEINT) * span) + span * span)
              // (2 * span * span) AS BIGINT) AS ia_cv2_micro,
         CAST((2000000 * s1 + n_jobs) // (2 * n_jobs) AS BIGINT)
           AS svc_mean_micro,
         CAST((2000000 * (CAST(n_jobs AS HUGEINT) * s2
              - CAST(s1 AS HUGEINT) * s1) + s1 * s1)
              // (2 * s1 * s1) AS BIGINT) AS svc_cv2_micro
  FROM arr CROSS JOIN ia CROSS JOIN sv)
SELECT n_arr, span, n_jobs, ia_mean_micro, ia_cv2_micro,
       svc_mean_micro, svc_cv2_micro,
       CAST(floor(
         ((CAST(n_arr - 1 AS DOUBLE) * CAST(s1 AS DOUBLE)
           / (CAST(span AS DOUBLE) * CAST(n_jobs AS DOUBLE)))
          / (floor(CAST((n_arr - 1) * s1 AS DOUBLE)
               / CAST(span * n_jobs AS DOUBLE)) + 1.0))
         / (1.0 - (CAST(n_arr - 1 AS DOUBLE) * CAST(s1 AS DOUBLE)
           / (CAST(span AS DOUBLE) * CAST(n_jobs AS DOUBLE)))
          / (floor(CAST((n_arr - 1) * s1 AS DOUBLE)
               / CAST(span * n_jobs AS DOUBLE)) + 1.0))
         * ((CAST(ia_cv2_micro AS DOUBLE) + CAST(svc_cv2_micro
             AS DOUBLE)) / 2e6)
         * (CAST(s1 AS DOUBLE) / CAST(n_jobs AS DOUBLE))
         * 1e6 + 0.5) AS BIGINT) AS kingman_wq_micro
FROM sc
"""


# ---------------------------------------------------------------------------
# busy_period_profile
# ---------------------------------------------------------------------------


def q_busy_period_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the backlog step function: maximal
    busy (depth>0) runs and the idle fraction of the horizon."""
    seg = (
        _step(spark, sf_dir)
        .where("seg_days IS NOT NULL")
        .selectExpr("d", "seg_days", "CASE WHEN depth > 0 THEN 1 ELSE 0 END AS busy")
    )
    flagged = seg.selectExpr(
        "d",
        "seg_days",
        "busy",
        "CASE WHEN busy <> coalesce(lag(busy) OVER (ORDER BY d), -1)"
        " THEN 1 ELSE 0 END AS chg",
    )
    isl = flagged.selectExpr(
        "d",
        "seg_days",
        "busy",
        "sum(chg) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS isl",
    )
    runs = (
        isl.groupBy("isl")
        .agg(
            F.max("busy").cast("long").alias("busy"),
            F.sum("seg_days").cast("long").alias("run_days"),
        )
    )
    return runs.agg(
        F.sum(F.expr("CASE WHEN busy = 1 THEN 1L ELSE 0L END"))
        .cast("long")
        .alias("n_busy_periods"),
        F.sum(F.expr("CASE WHEN busy = 1 THEN run_days ELSE 0L END"))
        .cast("long")
        .alias("busy_days"),
        F.sum(F.expr("CASE WHEN busy = 0 THEN run_days ELSE 0L END"))
        .cast("long")
        .alias("idle_days"),
        F.max(F.expr("CASE WHEN busy = 1 THEN run_days ELSE 0L END"))
        .cast("long")
        .alias("longest_busy_days"),
    ).selectExpr(
        "n_busy_periods",
        "busy_days",
        "idle_days",
        "longest_busy_days",
        "CAST((2000000 * idle_days + (busy_days + idle_days))"
        " DIV (2 * (busy_days + idle_days)) AS BIGINT) AS idle_micro",
    )


ORACLE_BUSY_PERIOD_PROFILE = f"""
WITH {_INTERVALS_SQL},
{_STEP_SQL},
seg AS (
  SELECT d, seg_days,
         CASE WHEN depth > 0 THEN 1 ELSE 0 END AS busy
  FROM step WHERE seg_days IS NOT NULL),
flagged AS (
  SELECT d, seg_days, busy,
         CASE WHEN busy <> coalesce(lag(busy) OVER (ORDER BY d), -1)
           THEN 1 ELSE 0 END AS chg
  FROM seg),
isl AS (
  SELECT d, seg_days, busy,
         sum(chg) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS isl
  FROM flagged),
runs AS (
  SELECT isl, CAST(max(busy) AS BIGINT) AS busy,
         CAST(sum(seg_days) AS BIGINT) AS run_days
  FROM isl GROUP BY isl),
agg AS (
  SELECT CAST(sum(CASE WHEN busy = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_busy_periods,
         CAST(sum(CASE WHEN busy = 1 THEN run_days ELSE 0 END)
              AS BIGINT) AS busy_days,
         CAST(sum(CASE WHEN busy = 0 THEN run_days ELSE 0 END)
              AS BIGINT) AS idle_days,
         CAST(max(CASE WHEN busy = 1 THEN run_days ELSE 0 END)
              AS BIGINT) AS longest_busy_days
  FROM runs)
SELECT n_busy_periods, busy_days, idle_days, longest_busy_days,
       CAST((2000000 * idle_days + (busy_days + idle_days))
            // (2 * (busy_days + idle_days)) AS BIGINT) AS idle_micro
FROM agg
"""


QUEUEING_QUERIES = {
    "littles_law_audit": q_littles_law_audit,
    "erlang_blocking_grid": q_erlang_blocking_grid,
    "peak_backlog_profile": q_peak_backlog_profile,
    "kingman_wait_estimate": q_kingman_wait_estimate,
    "busy_period_profile": q_busy_period_profile,
}

QUEUEING_ORACLES = {
    "littles_law_audit": ORACLE_LITTLES_LAW_AUDIT,
    "erlang_blocking_grid": ORACLE_ERLANG_BLOCKING_GRID,
    "peak_backlog_profile": ORACLE_PEAK_BACKLOG_PROFILE,
    "kingman_wait_estimate": ORACLE_KINGMAN_WAIT_ESTIMATE,
    "busy_period_profile": ORACLE_BUSY_PERIOD_PROFILE,
}

_q.QUERIES.update(QUEUEING_QUERIES)
_q.ORACLES.update(QUEUEING_ORACLES)
