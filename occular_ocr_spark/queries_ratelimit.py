"""Rate-limit / quota catalog, round 4 (wave 101): five operators
from the API-gateway capacity toolbox read onto the events stream —
token buckets, policy sweeps, burst windows, quota billing, and
Jain's fairness — each exact-integer (microsecond epochs,
micro-token arithmetic, rational fairness).

* ``token_bucket_sim`` — per user: a token-bucket replay folded over
  the time-ordered event array (state = (tokens_micro, last_us);
  refill = ⌊rate·Δus / 3.6e9⌋ micro-tokens at {_RL_RATE_H}/hour,
  cap {_RL_CAP}; spend 10⁶ per event or reject) — admitted and
  rejected counts per user, all integer.
* ``rate_policy_sweep`` — the (rate/hour, cap) grid {_RL_GRID}: the
  same fold per (user, policy), aggregated to total rejects and the
  reject rate micro per policy — the capacity-planning sweep.
* ``burst_profile`` — per user: the maximum events inside any
  rolling 60-minute window (integer-µs RANGE frame over the
  per-user ordered events — the ``window_funnel`` doctrine) and the
  events/active-hours ratio.
* ``quota_ledger_month`` — per (user, month): events vs the
  {_QUOTA}-event included quota, overage units, and tiered billed
  units (1× included, 2× overage) — integer billing.
* ``fair_share_report`` — Jain's fairness index (Σx)²/(n·Σx²) of
  per-user event counts as an exact rational micro, plus min/max
  share — the one-row fairness certificate.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_ratelimit_wave.py.

Cross-engine float policy: integer microsecond epochs (unix_micros /
epoch_us), micro-token arithmetic with floor refills, half-up micro
ratios — no floating point in this wave.

Scale notes: folds run over per-user bounded arrays (the sessionize
doctrine); the policy grid multiplies the ≤users frame, not the
event stream; the burst window is a per-user keyed RANGE frame; the
fairness reduce is one partial agg.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_RL_RATE_H = 1
_RL_CAP = 2
_RL_GRID = [(1, 1), (1, 2), (2, 2), (4, 4)]
_QUOTA = 50
_US_PER_HOUR = 3_600_000_000


def _us(dialect: str) -> str:
    if dialect == "spark":
        return "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
    return "CAST(epoch_us(ts) AS BIGINT)"


def _bucket_fold(dialect: str, rate: str, cap: str) -> str:
    """Fold over the sorted µs array `arr`: the reject count.  State
    is a 3-slot BIGINT array [tokens_micro, last_us, rejects];
    element access is 1-based via element_at on Spark (bracket
    indexing is 0-based there) and native 1-based brackets on DuckDB
    (whose reduce needs homogeneous elements, so the µs items ride as
    [t, 0, 0] triples behind a prepended init)."""
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        refill = (
            f"least(CAST({cap} AS BIGINT) * 1000000, element_at(acc, 1)"
            f" + ((x - element_at(acc, 2)) * CAST({rate} AS BIGINT)"
            f" * 1000000) {idiv} {_US_PER_HOUR})"
        )
        return (
            f"element_at(aggregate(slice(arr, 2, size(arr) - 1),"
            f" array(CAST({cap} AS BIGINT) * 1000000 - 1000000,"
            f" element_at(arr, 1), CAST(0 AS BIGINT)),"
            f" (acc, x) -> CASE WHEN {refill} >= 1000000"
            f" THEN array({refill} - 1000000, x, element_at(acc, 3))"
            f" ELSE array({refill}, x, element_at(acc, 3) + 1) END), 3)"
        )
    refill = (
        f"least(CAST({cap} AS BIGINT) * 1000000, acc[1]"
        f" + ((x[1] - acc[2]) * CAST({rate} AS BIGINT)"
        f" * 1000000) {idiv} {_US_PER_HOUR})"
    )
    return (
        f"list_reduce(list_prepend("
        f" [CAST({cap} AS BIGINT) * 1000000 - 1000000, arr[1],"
        f" CAST(0 AS BIGINT)],"
        f" [[t, CAST(0 AS BIGINT), CAST(0 AS BIGINT)]"
        f" FOR t IN arr[2:]]),"
        f" (acc, x) -> CASE WHEN {refill} >= 1000000"
        f" THEN [{refill} - 1000000, x[1], acc[3]]"
        f" ELSE [{refill}, x[1], acc[3] + 1] END)[3]"
    )


def _arr_sql(dialect: str) -> str:
    us = _us(dialect)
    if dialect == "spark":
        agg = "sort_array(collect_list(t))"
    else:
        agg = "list_sort(list(t))"
    return f"""
ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, {us} AS t FROM events),
arrs AS (
  SELECT u, {agg} AS arr, CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY u)
"""


# ---------------------------------------------------------------------------
# token_bucket_sim
# ---------------------------------------------------------------------------


def _bucket_sql(dialect: str) -> str:
    fold = _bucket_fold(dialect, str(_RL_RATE_H), str(_RL_CAP))
    return f"""
WITH {_arr_sql(dialect)}
SELECT u AS user_id, n_events,
       CAST({fold} AS BIGINT) AS n_rejected,
       n_events - CAST({fold} AS BIGINT) AS n_admitted
FROM arrs
"""


def q_token_bucket_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket replay per user; exact integer state fold."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_bucket_sql("spark"))


ORACLE_TOKEN_BUCKET_SIM = _bucket_sql("duck")


# ---------------------------------------------------------------------------
# rate_policy_sweep
# ---------------------------------------------------------------------------


def _sweep_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    legs = []
    for rate, cap in _RL_GRID:
        fold = _bucket_fold(dialect, str(rate), str(cap))
        legs.append(f"""
SELECT CAST({rate} AS BIGINT) AS rate_per_hour,
       CAST({cap} AS BIGINT) AS cap_tokens,
       CAST(sum(n_events) AS BIGINT) AS total_events,
       CAST(sum({fold}) AS BIGINT) AS total_rejected,
       CAST((2000000 * sum({fold}) + sum(n_events))
            {intdiv} (2 * sum(n_events)) AS BIGINT)
         AS reject_rate_micro
FROM arrs""")
    return f"WITH {_arr_sql(dialect)}\n" + " UNION ALL ".join(legs)


def q_rate_policy_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reject totals across the (rate, cap) policy grid."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_sweep_sql("spark"))


ORACLE_RATE_POLICY_SWEEP = _sweep_sql("duck")


# ---------------------------------------------------------------------------
# burst_profile
# ---------------------------------------------------------------------------


def _burst_sql(dialect: str) -> str:
    us = _us(dialect)
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, {us} AS t FROM events),
win AS (
  SELECT u, t,
         CAST(count(*) OVER (PARTITION BY u ORDER BY t
           RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS in_hour
  FROM ev),
hours AS (
  SELECT u, CAST(count(DISTINCT t {intdiv} {_US_PER_HOUR}) AS BIGINT)
           AS active_hours
  FROM ev GROUP BY u)
SELECT w.u AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(w.in_hour) AS BIGINT) AS max_burst_hour,
       CAST(max(h.active_hours) AS BIGINT) AS active_hours,
       CAST((2000000 * count(*) + max(h.active_hours))
            {intdiv} (2 * max(h.active_hours)) AS BIGINT)
         AS events_per_active_hour_micro
FROM win w JOIN hours h ON h.u = w.u
GROUP BY w.u
"""


def q_burst_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max rolling-hour burst per user via µs RANGE frames."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_burst_sql("spark"))


ORACLE_BURST_PROFILE = _burst_sql("duck")


# ---------------------------------------------------------------------------
# quota_ledger_month
# ---------------------------------------------------------------------------


def _quota_sql(dialect: str) -> str:
    return f"""
WITH m AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(date_trunc('month', ts) AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, date_trunc('month', ts))
SELECT u AS user_id, month, n AS n_events,
       CAST(least(n, {_QUOTA}) AS BIGINT) AS included_units,
       CAST(greatest(n - {_QUOTA}, 0) AS BIGINT) AS overage_units,
       CAST(least(n, {_QUOTA}) + 2 * greatest(n - {_QUOTA}, 0)
            AS BIGINT) AS billed_units
FROM m
"""


def q_quota_ledger_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered quota billing per (user, month)."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_quota_sql("spark"))


ORACLE_QUOTA_LEDGER_MONTH = _quota_sql("duck")


# ---------------------------------------------------------------------------
# fair_share_report
# ---------------------------------------------------------------------------


def _fair_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH per AS (
  SELECT CAST(user_id AS BIGINT) AS u, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(x) AS BIGINT) AS total_events,
       CAST(min(x) AS BIGINT) AS min_events,
       CAST(max(x) AS BIGINT) AS max_events,
       CAST((2000000 * CAST(sum(x) AS {wide}) * sum(x)
            + count(*) * sum(CAST(x AS {wide}) * x))
            {intdiv} (2 * count(*) * sum(CAST(x AS {wide}) * x))
            AS BIGINT) AS jain_index_micro
FROM per
"""


def q_fair_share_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain's fairness index of per-user event counts, exact."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_fair_sql("spark"))


ORACLE_FAIR_SHARE_REPORT = _fair_sql("duck")


RATELIMIT_QUERIES = {
    "token_bucket_sim": q_token_bucket_sim,
    "rate_policy_sweep": q_rate_policy_sweep,
    "burst_profile": q_burst_profile,
    "quota_ledger_month": q_quota_ledger_month,
    "fair_share_report": q_fair_share_report,
}

RATELIMIT_ORACLES = {
    "token_bucket_sim": ORACLE_TOKEN_BUCKET_SIM,
    "rate_policy_sweep": ORACLE_RATE_POLICY_SWEEP,
    "burst_profile": ORACLE_BURST_PROFILE,
    "quota_ledger_month": ORACLE_QUOTA_LEDGER_MONTH,
    "fair_share_report": ORACLE_FAIR_SHARE_REPORT,
}

_q.QUERIES.update(RATELIMIT_QUERIES)
_q.ORACLES.update(RATELIMIT_ORACLES)
