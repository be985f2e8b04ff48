"""SRE / reliability-analytics catalog, round 4 (wave 81): five
operators reading the events stream as a service health signal
(event_type = 'error' vs the rest) — the SLO machinery from the
Google SRE workbook, each exact-integer and oracle-checked.  The
error budget SLO is {_SLO_MICRO} micro (the fixture's base error rate
is ~20%, so alerts genuinely toggle around it).

* ``slo_burn_rate`` — per calendar day (complete day spine, empty
  days are healthy): 1-day and 7-day error rates and burn rates
  (rate/SLO, half-up micro) with alert flags at burn > 1× — the
  multi-window burn-rate alert rule.  The 7-day window is a ROWS
  6-PRECEDING frame over the gap-filled spine, so ROWS == RANGE.
* ``error_budget_ledger`` — per month: events, errors, the allowed
  budget SLO·n (exact micro-errors), consumed 10⁶·errors, the signed
  remaining budget, and the running balance across months.
* ``incident_mttr_mtbf`` — incidents = maximal runs of consecutive
  degraded HOURS (hour buckets containing ≥1 error, epoch-hour
  integers, gaps-and-islands): count, MTTR (mean incident length,
  micro hours), MTBF (mean start-to-start gap), longest incident,
  total degraded hours.
* ``availability_ladder`` — the nines ladder: for each availability
  threshold in {_NINES} micro, how many spine days meet it and the
  compliance fraction — day availability = 10⁶ − half-up error-rate
  micro, empty days fully available.
* ``alert_flap_audit`` — the pager-fatigue audit at threshold
  {_FLAP_THRESH} micro: alert-state flips between consecutive spine
  days, alert runs (islands), longest run, duty cycle.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_sre_wave.py.

Cross-engine float policy: pure exact BIGINT /
DECIMAL(38,0)-vs-HUGEINT half-up micro throughout — no floating point
anywhere in this wave.

Scale notes: one partial-agg scan to the bounded day (or hour) frame;
the day spine expands from a 1-row min/max aggregate (O(span_days),
calendar-bounded regardless of event count — the ``ts_gapfill``
doctrine); every window orders only spine/month/incident frames; no
corpus-sized window, no driver loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_SLO_MICRO = 200_000
_NINES = [700_000, 750_000, 800_000, 850_000]
_FLAP_THRESH = 800_000


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete day spine with error/total counts (0 on empty days)."""
    e = _t(spark, sf_dir, "events").selectExpr(
        "CAST(ts AS DATE) AS d",
        "CASE WHEN event_type = 'error' THEN 1L ELSE 0L END AS is_err",
    )
    counts = e.groupBy("d").agg(
        F.count("*").cast("long").alias("tot"),
        F.sum("is_err").cast("long").alias("err"),
    )
    span = counts.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = span.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    return cal.join(counts, "d", "left").selectExpr(
        "d",
        "coalesce(tot, 0L) AS tot",
        "coalesce(err, 0L) AS err",
    )


_DAILY_SQL = """
counts AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS tot,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err
  FROM events GROUP BY CAST(ts AS DATE)),
span AS (SELECT min(d) AS lo, max(d) AS hi FROM counts),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
    AS d FROM span),
daily AS (
  SELECT c.d, coalesce(x.tot, 0) AS tot, coalesce(x.err, 0) AS err
  FROM cal c LEFT JOIN counts x ON x.d = c.d)
"""


# ---------------------------------------------------------------------------
# slo_burn_rate
# ---------------------------------------------------------------------------


def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day and 7-day burn rates (rate/SLO micro) over the complete
    day spine, with burn>1x alert flags."""
    d = _daily(spark, sf_dir)
    roll = d.selectExpr(
        "d",
        "tot",
        "err",
        "sum(tot) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND"
        " CURRENT ROW) AS tot7",
        "sum(err) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND"
        " CURRENT ROW) AS err7",
    )
    return roll.selectExpr(
        "d",
        "tot",
        "err",
        "tot7",
        "err7",
        f"CASE WHEN tot > 0 THEN CAST((2000000 * (CAST(err AS"
        f" DECIMAL(38,0)) * 1000000) + tot * {_SLO_MICRO})"
        f" DIV (2 * tot * {_SLO_MICRO}) AS BIGINT) ELSE 0L END"
        " AS burn_1d_micro",
        f"CASE WHEN tot7 > 0 THEN CAST((2000000 * (CAST(err7 AS"
        f" DECIMAL(38,0)) * 1000000) + tot7 * {_SLO_MICRO})"
        f" DIV (2 * tot7 * {_SLO_MICRO}) AS BIGINT) ELSE 0L END"
        " AS burn_7d_micro",
    ).selectExpr(
        "d",
        "tot",
        "err",
        "tot7",
        "err7",
        "burn_1d_micro",
        "burn_7d_micro",
        "CASE WHEN burn_1d_micro > 1000000 THEN 1L ELSE 0L END"
        " AS alert_1d",
        "CASE WHEN burn_7d_micro > 1000000 THEN 1L ELSE 0L END"
        " AS alert_7d",
    )


ORACLE_SLO_BURN_RATE = f"""
WITH {_DAILY_SQL},
roll AS (
  SELECT d, tot, err,
         sum(tot) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND
           CURRENT ROW) AS tot7,
         sum(err) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND
           CURRENT ROW) AS err7
  FROM daily),
sc AS (
  SELECT d, tot, err, CAST(tot7 AS BIGINT) AS tot7,
         CAST(err7 AS BIGINT) AS err7,
         CASE WHEN tot > 0 THEN CAST((2000000 * (CAST(err AS HUGEINT)
           * 1000000) + tot * {_SLO_MICRO})
           // (2 * tot * {_SLO_MICRO}) AS BIGINT)
         ELSE 0 END AS burn_1d_micro,
         CASE WHEN tot7 > 0 THEN CAST((2000000 * (CAST(err7 AS HUGEINT)
           * 1000000) + tot7 * {_SLO_MICRO})
           // (2 * tot7 * {_SLO_MICRO}) AS BIGINT)
         ELSE 0 END AS burn_7d_micro
  FROM roll)
SELECT d, tot, err, tot7, err7, burn_1d_micro, burn_7d_micro,
       CAST(CASE WHEN burn_1d_micro > 1000000 THEN 1 ELSE 0 END
            AS BIGINT) AS alert_1d,
       CAST(CASE WHEN burn_7d_micro > 1000000 THEN 1 ELSE 0 END
            AS BIGINT) AS alert_7d
FROM sc
"""


# ---------------------------------------------------------------------------
# error_budget_ledger
# ---------------------------------------------------------------------------


def q_error_budget_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly error-budget accounting: allowed SLO·n micro-errors,
    consumed, signed remaining, running balance."""
    m = (
        _t(spark, sf_dir, "events")
        .selectExpr(
            "CAST(date_trunc('month', ts) AS DATE) AS month",
            "CASE WHEN event_type = 'error' THEN 1L ELSE 0L END AS is_err",
        )
        .groupBy("month")
        .agg(
            F.count("*").cast("long").alias("tot"),
            F.sum("is_err").cast("long").alias("err"),
        )
    )
    return m.selectExpr(
        "month",
        "tot",
        "err",
        f"{_SLO_MICRO} * tot AS allowed_micro",
        "1000000 * err AS consumed_micro",
        f"{_SLO_MICRO} * tot - 1000000 * err AS remaining_micro",
        f"sum({_SLO_MICRO} * tot - 1000000 * err) OVER (ORDER BY month"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS balance_micro",
    )


ORACLE_ERROR_BUDGET_LEDGER = f"""
WITH m AS (
  SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS tot,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err
  FROM events GROUP BY date_trunc('month', ts))
SELECT month, tot, err,
       {_SLO_MICRO} * tot AS allowed_micro,
       1000000 * err AS consumed_micro,
       {_SLO_MICRO} * tot - 1000000 * err AS remaining_micro,
       CAST(sum({_SLO_MICRO} * tot - 1000000 * err) OVER (
         ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND
         CURRENT ROW) AS BIGINT) AS balance_micro
FROM m
"""


# ---------------------------------------------------------------------------
# incident_mttr_mtbf
# ---------------------------------------------------------------------------


def q_incident_mttr_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incidents = islands of consecutive degraded epoch-hours; MTTR,
    MTBF (start-to-start), longest, total degraded hours."""
    hrs = (
        _t(spark, sf_dir, "events")
        .where("event_type = 'error'")
        .selectExpr("CAST(unix_timestamp(ts) AS BIGINT) DIV 3600 AS hr")
        .groupBy("hr")
        .agg(F.count("*").cast("long").alias("n_err"))
    )
    isl = hrs.selectExpr(
        "hr",
        "CASE WHEN hr - coalesce(lag(hr) OVER (ORDER BY hr), hr - 2)"
        " > 1 THEN 1 ELSE 0 END AS new_inc",
    ).selectExpr(
        "hr",
        "sum(new_inc) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS inc",
    )
    incs = isl.groupBy("inc").agg(
        F.count("*").cast("long").alias("len_hours"),
        F.min("hr").cast("long").alias("start_hr"),
    )
    gaps = incs.selectExpr(
        "len_hours",
        "start_hr - lag(start_hr) OVER (ORDER BY start_hr) AS gap",
    )
    return gaps.agg(
        F.count("*").cast("long").alias("n_incidents"),
        F.sum("len_hours").cast("long").alias("degraded_hours"),
        F.max("len_hours").cast("long").alias("longest_hours"),
        F.sum("gap").cast("long").alias("gap_sum"),
        F.count("gap").cast("long").alias("gap_n"),
    ).selectExpr(
        "n_incidents",
        "degraded_hours",
        "longest_hours",
        "CAST((2000000 * degraded_hours + n_incidents)"
        " DIV (2 * n_incidents) AS BIGINT) AS mttr_micro",
        "CASE WHEN gap_n > 0 THEN CAST((2000000 * gap_sum + gap_n)"
        " DIV (2 * gap_n) AS BIGINT) ELSE 0L END AS mtbf_micro",
    )


ORACLE_INCIDENT_MTTR_MTBF = """
WITH hrs AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
         CAST(count(*) AS BIGINT) AS n_err
  FROM events WHERE event_type = 'error'
  GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 3600),
flags AS (
  SELECT hr,
         CASE WHEN hr - coalesce(lag(hr) OVER (ORDER BY hr), hr - 2)
           > 1 THEN 1 ELSE 0 END AS new_inc
  FROM hrs),
isl AS (
  SELECT hr,
         sum(new_inc) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS inc
  FROM flags),
incs AS (
  SELECT inc, CAST(count(*) AS BIGINT) AS len_hours,
         CAST(min(hr) AS BIGINT) AS start_hr
  FROM isl GROUP BY inc),
gaps AS (
  SELECT len_hours,
         start_hr - lag(start_hr) OVER (ORDER BY start_hr) AS gap
  FROM incs),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_incidents,
         CAST(sum(len_hours) AS BIGINT) AS degraded_hours,
         CAST(max(len_hours) AS BIGINT) AS longest_hours,
         CAST(sum(gap) AS BIGINT) AS gap_sum,
         CAST(count(gap) AS BIGINT) AS gap_n
  FROM gaps)
SELECT n_incidents, degraded_hours, longest_hours,
       CAST((2000000 * degraded_hours + n_incidents)
            // (2 * n_incidents) AS BIGINT) AS mttr_micro,
       CASE WHEN gap_n > 0 THEN CAST((2000000 * gap_sum + gap_n)
            // (2 * gap_n) AS BIGINT) ELSE CAST(0 AS BIGINT) END
         AS mtbf_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# availability_ladder
# ---------------------------------------------------------------------------


def q_availability_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nines ladder: spine days meeting each availability
    threshold; empty days are fully available."""
    d = _daily(spark, sf_dir)
    avail = d.selectExpr(
        "d",
        "CASE WHEN tot > 0 THEN 1000000 - CAST((2000000 * err + tot)"
        " DIV (2 * tot) AS BIGINT) ELSE 1000000L END AS avail_micro",
    )
    grid = spark.createDataFrame(
        [(t,) for t in _NINES], "thresh_micro long"
    )
    return (
        avail.crossJoin(F.broadcast(grid))
        .groupBy("thresh_micro")
        .agg(
            F.sum(
                F.expr("CASE WHEN avail_micro >= thresh_micro THEN 1L"
                       " ELSE 0L END")
            )
            .cast("long")
            .alias("days_meeting"),
            F.count("*").cast("long").alias("days_total"),
        )
        .selectExpr(
            "thresh_micro",
            "days_meeting",
            "days_total",
            "CAST((2000000 * days_meeting + days_total)"
            " DIV (2 * days_total) AS BIGINT) AS compliance_micro",
        )
    )


ORACLE_AVAILABILITY_LADDER = f"""
WITH {_DAILY_SQL},
avail AS (
  SELECT d,
         CASE WHEN tot > 0 THEN 1000000 - CAST((2000000 * err + tot)
           // (2 * tot) AS BIGINT) ELSE 1000000 END AS avail_micro
  FROM daily),
grid AS (
  SELECT * FROM (VALUES {", ".join(f"({t})" for t in _NINES)})
    AS t(thresh_micro))
SELECT CAST(g.thresh_micro AS BIGINT) AS thresh_micro,
       CAST(sum(CASE WHEN a.avail_micro >= g.thresh_micro THEN 1
            ELSE 0 END) AS BIGINT) AS days_meeting,
       CAST(count(*) AS BIGINT) AS days_total,
       CAST((2000000 * sum(CASE WHEN a.avail_micro >= g.thresh_micro
            THEN 1 ELSE 0 END) + count(*)) // (2 * count(*))
            AS BIGINT) AS compliance_micro
FROM avail a CROSS JOIN grid g
GROUP BY g.thresh_micro
"""


# ---------------------------------------------------------------------------
# alert_flap_audit
# ---------------------------------------------------------------------------


def q_alert_flap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pager-fatigue audit: alert-state flips, alert runs, longest
    run, duty cycle over the complete day spine."""
    d = _daily(spark, sf_dir)
    state = d.selectExpr(
        "d",
        f"CASE WHEN tot > 0 AND 1000000 - CAST((2000000 * err + tot)"
        f" DIV (2 * tot) AS BIGINT) < {_FLAP_THRESH} THEN 1 ELSE 0 END"
        " AS alert",
    )
    flagged = state.selectExpr(
        "d",
        "alert",
        "CASE WHEN alert <> coalesce(lag(alert) OVER (ORDER BY d), -1)"
        " THEN 1 ELSE 0 END AS chg",
    )
    isl = flagged.selectExpr(
        "d",
        "alert",
        "chg",
        "sum(chg) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS run_id",
    )
    runs = isl.groupBy("run_id").agg(
        F.max("alert").cast("long").alias("alert"),
        F.count("*").cast("long").alias("run_days"),
    )
    return runs.agg(
        F.sum(F.expr("CASE WHEN alert = 1 THEN run_days ELSE 0L END"))
        .cast("long")
        .alias("n_alert_days"),
        F.sum(F.expr("CASE WHEN alert = 0 THEN run_days ELSE 0L END"))
        .cast("long")
        .alias("n_ok_days"),
        F.sum(F.expr("CASE WHEN alert = 1 THEN 1L ELSE 0L END"))
        .cast("long")
        .alias("n_alert_runs"),
        F.max(F.expr("CASE WHEN alert = 1 THEN run_days ELSE 0L END"))
        .cast("long")
        .alias("longest_run_days"),
        (F.count("*") - 1).cast("long").alias("n_flips"),
    ).selectExpr(
        "n_alert_days",
        "n_ok_days",
        "n_alert_runs",
        "longest_run_days",
        "n_flips",
        "CAST((2000000 * n_alert_days + (n_alert_days + n_ok_days))"
        " DIV (2 * (n_alert_days + n_ok_days)) AS BIGINT)"
        " AS duty_cycle_micro",
    )


ORACLE_ALERT_FLAP_AUDIT = f"""
WITH {_DAILY_SQL},
state AS (
  SELECT d,
         CASE WHEN tot > 0 AND 1000000 - CAST((2000000 * err + tot)
           // (2 * tot) AS BIGINT) < {_FLAP_THRESH} THEN 1 ELSE 0 END
           AS alert
  FROM daily),
flagged AS (
  SELECT d, alert,
         CASE WHEN alert <> coalesce(lag(alert) OVER (ORDER BY d), -1)
           THEN 1 ELSE 0 END AS chg
  FROM state),
isl AS (
  SELECT d, alert, chg,
         sum(chg) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS run_id
  FROM flagged),
runs AS (
  SELECT run_id, CAST(max(alert) AS BIGINT) AS alert,
         CAST(count(*) AS BIGINT) AS run_days
  FROM isl GROUP BY run_id),
agg AS (
  SELECT CAST(sum(CASE WHEN alert = 1 THEN run_days ELSE 0 END)
              AS BIGINT) AS n_alert_days,
         CAST(sum(CASE WHEN alert = 0 THEN run_days ELSE 0 END)
              AS BIGINT) AS n_ok_days,
         CAST(sum(CASE WHEN alert = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alert_runs,
         CAST(max(CASE WHEN alert = 1 THEN run_days ELSE 0 END)
              AS BIGINT) AS longest_run_days,
         CAST(count(*) - 1 AS BIGINT) AS n_flips
  FROM runs)
SELECT n_alert_days, n_ok_days, n_alert_runs, longest_run_days,
       n_flips,
       CAST((2000000 * n_alert_days + (n_alert_days + n_ok_days))
            // (2 * (n_alert_days + n_ok_days)) AS BIGINT)
         AS duty_cycle_micro
FROM agg
"""


SRE_QUERIES = {
    "slo_burn_rate": q_slo_burn_rate,
    "error_budget_ledger": q_error_budget_ledger,
    "incident_mttr_mtbf": q_incident_mttr_mtbf,
    "availability_ladder": q_availability_ladder,
    "alert_flap_audit": q_alert_flap_audit,
}

SRE_ORACLES = {
    "slo_burn_rate": ORACLE_SLO_BURN_RATE,
    "error_budget_ledger": ORACLE_ERROR_BUDGET_LEDGER,
    "incident_mttr_mtbf": ORACLE_INCIDENT_MTTR_MTBF,
    "availability_ladder": ORACLE_AVAILABILITY_LADDER,
    "alert_flap_audit": ORACLE_ALERT_FLAP_AUDIT,
}

_q.QUERIES.update(SRE_QUERIES)
_q.ORACLES.update(SRE_ORACLES)
