"""Survival-analysis extension catalog, round 4 (wave 76): five
operators that complete the user-lifetime story around the existing
``kaplan_meier`` entry, ALL in exact integer arithmetic (the KM entry
quantizes ln terms; these stay rational end-to-end).  The cohort here
is TIME-TO-FIRST-PURCHASE (KM's activity-span cohort degenerates to
all-censored at small SF): duration = days from a user's first event
to their first BIG purchase (event_type = 'purchase' AND value >
{_BIG}), or to their last event if they never make one
(right-censored) — the classic time-to-conversion design with a
genuine event/censor mix at every SF.

* ``nelson_aalen`` — the cumulative-hazard estimator: per distinct
  duration, at-risk count, per-step hazard d/n in half-up micro, and
  the exact prefix sum of those micro steps (documented as the sum
  of per-step roundings).
* ``truncated_lifetime_means`` — E[min(dur, τ)] for τ ∈ {_TAUS}
  days, overall and by censoring status, half-up micro — the
  restricted-mean readout on observed lifetimes.
* ``lifetime_quantiles`` — exact rank-pick quartiles of duration for
  event vs censored users.
* ``life_table_weekly`` — actuarial weekly intervals: entrants,
  events, censored, and the actuarial hazard d / (n - c/2) kept
  integer by the ×2 trick (2e6·d / (2n - c), half-up).
* ``crude_hazard_ratio`` — even/odd user_id cohorts: events per
  person-day (micro) for each and the crude ratio — the
  back-of-envelope two-group hazard comparison.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_survival2_wave.py.

Cross-engine float policy: exact integers end-to-end; every division
is half-up over non-negative operands.

Scale notes: one events shuffle to the per-user frame, then all
windows run over the bounded #durations / #weeks histogram — never
over users; the hazard-ratio entry is two partial aggs.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_TAUS = [7, 14, 30]
_BIG = 150


def _per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, dur, event) — the time-to-first-purchase frame."""
    return (
        _t(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            "CAST(ts AS DATE) AS d",
            "CASE WHEN event_type = 'purchase'"
            f" AND value > {_BIG} THEN CAST(ts AS DATE) END AS pd",
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(datediff(coalesce(min(pd), max(d)), min(d))"
                " AS BIGINT)"
            ).alias("dur"),
            F.expr("min(pd) IS NOT NULL").alias("event"),
        )
    )


_PER_USER_SQL = """
per_user AS (
  SELECT user_id,
         CAST(coalesce(min(pd), max(d)) - min(d) AS BIGINT) AS dur,
         min(pd) IS NOT NULL AS event
  FROM (SELECT user_id, CAST(ts AS DATE) AS d,
               CASE WHEN event_type = 'purchase'
                    AND value > 150 THEN CAST(ts AS DATE) END AS pd
        FROM events) e
  GROUP BY user_id)
"""


# ---------------------------------------------------------------------------
# nelson_aalen
# ---------------------------------------------------------------------------


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the duration histogram:
    n_risk by prefix subtraction, per-step hazard micro, exact prefix
    sum of the micro steps."""
    pu = _per_user(spark, sf_dir)
    hist = pu.groupBy("dur").agg(
        F.sum(F.expr("CASE WHEN event THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("d_n"),
        F.sum(F.expr("CASE WHEN event THEN 0 ELSE 1 END"))
        .cast("long")
        .alias("c_n"),
    )
    total = pu.agg(F.count("*").cast("long").alias("n_users"))
    return (
        hist.crossJoin(F.broadcast(total))
        .selectExpr(
            "dur",
            "d_n",
            "c_n",
            "n_users - coalesce(sum(d_n + c_n) OVER (ORDER BY dur"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            " AS n_risk",
        )
        .selectExpr(
            "dur",
            "d_n",
            "c_n",
            "n_risk",
            "CAST((2000000 * d_n + n_risk) DIV (2 * n_risk) AS BIGINT)"
            " AS hazard_micro",
        )
        .selectExpr(
            "dur",
            "d_n",
            "c_n",
            "n_risk",
            "hazard_micro",
            "sum(hazard_micro) OVER (ORDER BY dur"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS cum_hazard_micro",
        )
    )


ORACLE_NELSON_AALEN = f"""
WITH {_PER_USER_SQL},
hist AS (
  SELECT dur,
         CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d_n,
         CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c_n
  FROM per_user GROUP BY dur),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM per_user),
risk AS (
  SELECT h.dur, h.d_n, h.c_n,
         t.n_users - coalesce(sum(h.d_n + h.c_n) OVER (ORDER BY h.dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM hist h CROSS JOIN total t),
haz AS (
  SELECT dur, d_n, c_n, n_risk,
         CAST((2000000 * d_n + n_risk) // (2 * n_risk) AS BIGINT)
           AS hazard_micro
  FROM risk)
SELECT dur, d_n, c_n, n_risk, hazard_micro,
       CAST(sum(hazard_micro) OVER (ORDER BY dur
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_micro
FROM haz
"""


# ---------------------------------------------------------------------------
# truncated_lifetime_means
# ---------------------------------------------------------------------------


def q_truncated_lifetime_means(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E[min(dur, τ)] per τ and cohort slice (all / event / censored),
    half-up micro days."""
    pu = _q._persist_tracked(_per_user(spark, sf_dir))
    outs = []
    for tau in _TAUS:
        for label, cond in (
            ("all", "TRUE"),
            ("event", "event"),
            ("censored", "NOT event"),
        ):
            outs.append(
                pu.where(cond)
                .agg(
                    F.count("*").cast("long").alias("n_users"),
                    F.sum(F.expr(f"least(dur, {tau}L)"))
                    .cast("long")
                    .alias("s"),
                )
                .selectExpr(
                    f"CAST({tau} AS BIGINT) AS tau_days",
                    f"'{label}' AS cohort",
                    "n_users",
                    "CAST((2000000 * s + n_users) DIV (2 * n_users)"
                    " AS BIGINT) AS mean_trunc_micro",
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _trunc_oracle() -> str:
    sels = []
    for tau in _TAUS:
        for label, cond in (
            ("all", "TRUE"),
            ("event", "event"),
            ("censored", "NOT event"),
        ):
            sels.append(
                f"""
SELECT CAST({tau} AS BIGINT) AS tau_days, '{label}' AS cohort,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST((2000000 * sum(least(dur, {tau})) + count(*))
            // (2 * count(*)) AS BIGINT) AS mean_trunc_micro
FROM per_user WHERE {cond}
"""
            )
    return f"WITH {_PER_USER_SQL}\n" + " UNION ALL ".join(sels)


ORACLE_TRUNCATED_LIFETIME_MEANS = _trunc_oracle()


# ---------------------------------------------------------------------------
# lifetime_quantiles
# ---------------------------------------------------------------------------


def q_lifetime_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-pick quartiles of duration per censoring cohort."""
    pu = _q._persist_tracked(
        _per_user(spark, sf_dir).selectExpr(
            "user_id",
            "dur",
            "CASE WHEN event THEN 'event' ELSE 'censored' END AS cohort",
        )
    )
    ranked = pu.selectExpr(
        "cohort",
        "dur",
        "row_number() OVER (PARTITION BY cohort"
        " ORDER BY dur, user_id) AS rk",
        "count(*) OVER (PARTITION BY cohort) AS n",
    )
    outs = []
    for q, alias in ((250_000, "q1"), (500_000, "q2"), (750_000, "q3")):
        outs.append(
            ranked.where(
                f"rk = greatest(1L, ({q} * n + 999999) DIV 1000000)"
            ).selectExpr(
                "cohort", f"CAST({q} AS BIGINT) AS q_micro", "dur AS days"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


ORACLE_LIFETIME_QUANTILES = f"""
WITH {_PER_USER_SQL},
ranked AS (
  SELECT CASE WHEN event THEN 'event' ELSE 'censored' END AS cohort,
         dur,
         row_number() OVER (
           PARTITION BY CASE WHEN event THEN 'event'
                             ELSE 'censored' END
           ORDER BY dur, user_id) AS rk,
         count(*) OVER (
           PARTITION BY CASE WHEN event THEN 'event'
                             ELSE 'censored' END) AS n
  FROM per_user)
SELECT cohort, CAST(q_micro AS BIGINT) AS q_micro, dur AS days
FROM ranked
CROSS JOIN (SELECT unnest(ARRAY[250000, 500000, 750000]) AS q_micro)
WHERE rk = greatest(1, (q_micro * n + 999999) // 1000000)
"""


# ---------------------------------------------------------------------------
# life_table_weekly
# ---------------------------------------------------------------------------


def q_life_table_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actuarial weekly life table: per week, entrants, events,
    censored, and the actuarial hazard 2e6·d/(2n - c) half-up."""
    pu = _per_user(spark, sf_dir)
    weekly = pu.selectExpr(
        "dur DIV 7 AS week",
        "CASE WHEN event THEN 1 ELSE 0 END AS is_ev",
    ).groupBy("week").agg(
        F.sum("is_ev").cast("long").alias("d_n"),
        F.sum(F.expr("1 - is_ev")).cast("long").alias("c_n"),
    )
    total = pu.agg(F.count("*").cast("long").alias("n_users"))
    return (
        weekly.crossJoin(F.broadcast(total))
        .selectExpr(
            "week",
            "d_n",
            "c_n",
            "n_users - coalesce(sum(d_n + c_n) OVER (ORDER BY week"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            " AS n_enter",
        )
        .selectExpr(
            "week",
            "n_enter",
            "d_n",
            "c_n",
            "CAST((2 * 2000000 * d_n + (2 * n_enter - c_n))"
            " DIV (2 * (2 * n_enter - c_n)) AS BIGINT)"
            " AS actuarial_hazard_micro",
        )
    )


ORACLE_LIFE_TABLE_WEEKLY = f"""
WITH {_PER_USER_SQL},
weekly AS (
  SELECT dur // 7 AS week,
         CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d_n,
         CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c_n
  FROM per_user GROUP BY dur // 7),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM per_user),
risk AS (
  SELECT w.week, w.d_n, w.c_n,
         t.n_users - coalesce(sum(w.d_n + w.c_n) OVER (ORDER BY w.week
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_enter
  FROM weekly w CROSS JOIN total t)
SELECT week, n_enter, d_n, c_n,
       CAST((2 * 2000000 * d_n + (2 * n_enter - c_n))
            // (2 * (2 * n_enter - c_n)) AS BIGINT)
         AS actuarial_hazard_micro
FROM risk
"""


# ---------------------------------------------------------------------------
# crude_hazard_ratio
# ---------------------------------------------------------------------------


def q_crude_hazard_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even/odd user_id cohorts: events per person-day in micro and
    the crude ratio (odd/even, half-up of the micro rates)."""
    pu = _per_user(spark, sf_dir).selectExpr(
        "user_id % 2 AS grp",
        "dur",
        "CASE WHEN event THEN 1 ELSE 0 END AS is_ev",
    )
    per = pu.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("is_ev").cast("long").alias("events"),
        F.sum(F.expr("dur + 1")).cast("long").alias("person_days"),
    ).selectExpr(
        "grp",
        "n_users",
        "events",
        "person_days",
        "CAST((2000000 * events + person_days) DIV (2 * person_days)"
        " AS BIGINT) AS rate_micro",
    )
    even = per.where("grp = 0").selectExpr(
        "n_users AS n_even",
        "events AS events_even",
        "person_days AS days_even",
        "rate_micro AS rate_even_micro",
    )
    odd = per.where("grp = 1").selectExpr(
        "n_users AS n_odd",
        "events AS events_odd",
        "person_days AS days_odd",
        "rate_micro AS rate_odd_micro",
    )
    return even.crossJoin(odd).selectExpr(
        "n_even",
        "events_even",
        "days_even",
        "rate_even_micro",
        "n_odd",
        "events_odd",
        "days_odd",
        "rate_odd_micro",
        "CAST((2000000 * rate_odd_micro + rate_even_micro)"
        " DIV nullif(2 * rate_even_micro, 0) AS BIGINT) AS ratio_micro",
    )


ORACLE_CRUDE_HAZARD_RATIO = f"""
WITH {_PER_USER_SQL},
per AS (
  SELECT user_id % 2 AS grp,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
           AS events,
         CAST(sum(dur + 1) AS BIGINT) AS person_days,
         CAST((2000000 * sum(CASE WHEN event THEN 1 ELSE 0 END)
               + sum(dur + 1)) // (2 * sum(dur + 1)) AS BIGINT)
           AS rate_micro
  FROM per_user GROUP BY user_id % 2)
SELECT e.n_users AS n_even, e.events AS events_even,
       e.person_days AS days_even, e.rate_micro AS rate_even_micro,
       o.n_users AS n_odd, o.events AS events_odd,
       o.person_days AS days_odd, o.rate_micro AS rate_odd_micro,
       CAST((2000000 * o.rate_micro + e.rate_micro)
            // nullif(2 * e.rate_micro, 0) AS BIGINT) AS ratio_micro
FROM (SELECT * FROM per WHERE grp = 0) e
CROSS JOIN (SELECT * FROM per WHERE grp = 1) o
"""


SURVIVAL2_QUERIES = {
    "nelson_aalen": q_nelson_aalen,
    "truncated_lifetime_means": q_truncated_lifetime_means,
    "lifetime_quantiles": q_lifetime_quantiles,
    "life_table_weekly": q_life_table_weekly,
    "crude_hazard_ratio": q_crude_hazard_ratio,
}

SURVIVAL2_ORACLES = {
    "nelson_aalen": ORACLE_NELSON_AALEN,
    "truncated_lifetime_means": ORACLE_TRUNCATED_LIFETIME_MEANS,
    "lifetime_quantiles": ORACLE_LIFETIME_QUANTILES,
    "life_table_weekly": ORACLE_LIFE_TABLE_WEEKLY,
    "crude_hazard_ratio": ORACLE_CRUDE_HAZARD_RATIO,
}

_q.QUERIES.update(SURVIVAL2_QUERIES)
_q.ORACLES.update(SURVIVAL2_ORACLES)
