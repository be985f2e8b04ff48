"""Process-mining catalog, round 4 (wave 94): five operators from
the van-der-Aalst / Celonis toolbox read onto the events stream —
each user's time-ordered event types form a process trace; the model
activities are the event types with 'purchase' as the case outcome.

* ``dfg_performance_map`` — the directly-follows graph with its
  performance overlay: per (from, to) activity pair the transition
  count, mean and max gap in micro-seconds (exact integer µs sums —
  the counts-only companion is the existing ``event_markov`` entry;
  the duration overlay is what finds bottlenecks).
* ``declare_conformance_report`` — DECLARE-style constraint
  checking, per constraint the satisfied-trace count and support
  micro: existence(purchase), response(click → later purchase),
  precedence(no purchase before the first signup... i.e. signup
  precedes purchase), absence3(error ≤ 2), responded_existence
  (view ⇒ some click anywhere).
* ``trace_variant_table`` — the top {_VAR_K} trace variants: each
  user's first-{_VAR_CAP} event-type sequence joined with '>',
  counted, deterministic (count DESC, variant) TakeOrdered — the
  variant explorer's head list.
* ``happy_path_fitness`` — per trace: a greedy subsequence
  alignment against the canonical {_HAPPY} path folded over the
  user's time-sorted type array (exact; matched steps / 4 as
  fitness micro), plus the off-model 'error' count; emitted as the
  fitness histogram (matched_steps × has_error → trace counts).
* ``rework_metric_report`` — per activity: immediate self-loop
  transitions (a→a), traces containing one, and the share of traces
  micro — the rework/ping-pong overview.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_procmine_wave.py.

Cross-engine float policy: exact BIGINT counts, integer microsecond
epochs (unix_micros / epoch_us), half-up micro ratios —
no floating point in this wave.

Scale notes: traces order inside per-user windows (bounded by
per-user event counts — the sessionize doctrine); the DFG reduces to
a ≤|types|² frame; the fitness fold runs over per-user bounded
arrays; the variant head list is TakeOrdered, never a global sort.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_VAR_K = 15
_VAR_CAP = 20
_HAPPY = ["view", "click", "signup", "purchase"]


def _us_expr(dialect: str, col: str = "ts") -> str:
    if dialect == "spark":
        return f"CAST(unix_micros(CAST({col} AS TIMESTAMP)) AS BIGINT)"
    return f"CAST(epoch_us({col}) AS BIGINT)"


# ---------------------------------------------------------------------------
# dfg_performance_map
# ---------------------------------------------------------------------------


def _dfg_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    us = _us_expr(dialect)
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, event_type AS a,
         {us} AS t
  FROM events),
seq AS (
  SELECT u, a, t,
         lead(a) OVER (PARTITION BY u ORDER BY t, a) AS b,
         lead(t) OVER (PARTITION BY u ORDER BY t, a) AS t2
  FROM ev)
SELECT a AS from_activity, b AS to_activity,
       CAST(count(*) AS BIGINT) AS transitions,
       CAST((2 * sum(t2 - t) + count(*)) {intdiv} (2 * count(*))
            AS BIGINT) AS mean_gap_us,
       CAST(max(t2 - t) AS BIGINT) AS max_gap_us
FROM seq WHERE b IS NOT NULL
GROUP BY a, b
"""


def q_dfg_performance_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directly-follows graph with exact-µs duration overlay."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_dfg_sql("spark"))


ORACLE_DFG_PERFORMANCE_MAP = _dfg_sql("duck")


# ---------------------------------------------------------------------------
# declare_conformance_report
# ---------------------------------------------------------------------------


def _declare_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    us = _us_expr(dialect)
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, event_type AS a, {us} AS t
  FROM events),
per_u AS (
  SELECT u,
         CAST(sum(CASE WHEN a = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchase,
         CAST(sum(CASE WHEN a = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_click,
         CAST(sum(CASE WHEN a = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_view,
         CAST(sum(CASE WHEN a = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_error,
         max(CASE WHEN a = 'click' THEN t END) AS last_click,
         max(CASE WHEN a = 'purchase' THEN t END) AS last_purchase,
         min(CASE WHEN a = 'purchase' THEN t END) AS first_purchase,
         min(CASE WHEN a = 'signup' THEN t END) AS first_signup
  FROM ev GROUP BY u),
flags AS (
  SELECT u,
         CASE WHEN n_purchase >= 1 THEN 1 ELSE 0 END AS c_existence,
         CASE WHEN n_click = 0 OR (last_purchase IS NOT NULL AND
           last_purchase > last_click) THEN 1 ELSE 0 END AS c_response,
         CASE WHEN n_purchase = 0 OR (first_signup IS NOT NULL AND
           first_signup < first_purchase) THEN 1 ELSE 0 END
           AS c_precedence,
         CASE WHEN n_error <= 2 THEN 1 ELSE 0 END AS c_absence3,
         CASE WHEN n_view = 0 OR n_click >= 1 THEN 1 ELSE 0 END
           AS c_resp_exist
  FROM per_u),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM flags),
rep AS (
  SELECT 'existence_purchase' AS constraint_name,
         CAST(sum(c_existence) AS BIGINT) AS satisfied FROM flags
  UNION ALL
  SELECT 'response_click_purchase',
         CAST(sum(c_response) AS BIGINT) FROM flags
  UNION ALL
  SELECT 'precedence_signup_purchase',
         CAST(sum(c_precedence) AS BIGINT) FROM flags
  UNION ALL
  SELECT 'absence3_error',
         CAST(sum(c_absence3) AS BIGINT) FROM flags
  UNION ALL
  SELECT 'responded_existence_view_click',
         CAST(sum(c_resp_exist) AS BIGINT) FROM flags)
SELECT r.constraint_name, r.satisfied, t.n AS traces,
       CAST((2000000 * r.satisfied + t.n) {intdiv} (2 * t.n)
            AS BIGINT) AS support_micro
FROM rep r CROSS JOIN tot t
"""


def q_declare_conformance_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DECLARE constraint support over user traces."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_declare_sql("spark"))


ORACLE_DECLARE_CONFORMANCE_REPORT = _declare_sql("duck")


# ---------------------------------------------------------------------------
# trace_variant_table
# ---------------------------------------------------------------------------


def _variant_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    us = _us_expr(dialect)
    if dialect == "spark":
        agg = (
            "array_join(transform(slice(sort_array(collect_list("
            f"struct(t, a))), 1, {_VAR_CAP}), x -> x.a), '>')"
        )
    else:
        agg = (
            "list_aggregate([x.a FOR x IN list_sort(list(struct_pack("
            f"t := t, a := a)))[1:{_VAR_CAP}]], 'string_agg', '>')"
        )
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, event_type AS a, {us} AS t
  FROM events),
traces AS (
  SELECT u, {agg} AS variant
  FROM ev GROUP BY u),
counts AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_traces
  FROM traces GROUP BY variant),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM traces)
SELECT c.variant, c.n_traces,
       CAST((2000000 * c.n_traces + t.n) {intdiv} (2 * t.n)
            AS BIGINT) AS share_micro
FROM counts c CROSS JOIN tot t
ORDER BY c.n_traces DESC, c.variant
LIMIT {_VAR_K}
"""


def q_trace_variant_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top trace variants, deterministic TakeOrdered head list."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_variant_sql("spark"))


ORACLE_TRACE_VARIANT_TABLE = _variant_sql("duck")


# ---------------------------------------------------------------------------
# happy_path_fitness
# ---------------------------------------------------------------------------


def _fitness_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    us = _us_expr(dialect)
    model = ", ".join(f"'{a}'" for a in _HAPPY)
    if dialect == "spark":
        fold = (
            "aggregate(transform(sort_array(collect_list(struct(t, a))),"
            " x -> x.a), 0,"
            f" (acc, x) -> CASE WHEN acc < {len(_HAPPY)} AND"
            f" x = element_at(array({model}), acc + 1)"
            " THEN acc + 1 ELSE acc END)"
        )
    else:
        fold = (
            "CAST(list_reduce(list_prepend('0',"
            " [x.a FOR x IN list_sort(list(struct_pack(t := t,"
            " a := a)))]),"
            f" (acc, x) -> CASE WHEN CAST(acc AS INTEGER)"
            f" < {len(_HAPPY)} AND"
            f" x = [{model}][CAST(acc AS INTEGER) + 1]"
            " THEN CAST(CAST(acc AS INTEGER) + 1 AS VARCHAR)"
            " ELSE acc END) AS INTEGER)"
        )
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, event_type AS a, {us} AS t
  FROM events),
per_u AS (
  SELECT u,
         CAST({fold} AS BIGINT) AS matched_steps,
         CAST(sum(CASE WHEN a = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_error
  FROM ev GROUP BY u)
SELECT matched_steps,
       CAST(CASE WHEN n_error > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS has_error,
       CAST(count(*) AS BIGINT) AS n_traces,
       CAST((2000000 * matched_steps + {len(_HAPPY)})
            {intdiv} (2 * {len(_HAPPY)}) AS BIGINT) AS fitness_micro
FROM per_u
GROUP BY matched_steps, CASE WHEN n_error > 0 THEN 1 ELSE 0 END
"""


def q_happy_path_fitness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy subsequence alignment against the canonical path,
    emitted as the fitness histogram."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_fitness_sql("spark"))


ORACLE_HAPPY_PATH_FITNESS = _fitness_sql("duck")


# ---------------------------------------------------------------------------
# rework_metric_report
# ---------------------------------------------------------------------------


def _rework_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    us = _us_expr(dialect)
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, event_type AS a, {us} AS t
  FROM events),
seq AS (
  SELECT u, a,
         lead(a) OVER (PARTITION BY u ORDER BY t, a) AS b
  FROM ev),
loops AS (
  SELECT a, u, CAST(count(*) AS BIGINT) AS self_loops
  FROM seq WHERE b = a GROUP BY a, u),
tot AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM ev)
SELECT l.a AS activity,
       CAST(sum(l.self_loops) AS BIGINT) AS self_loop_transitions,
       CAST(count(*) AS BIGINT) AS traces_with_loop,
       CAST((2000000 * count(*) + t.n) {intdiv} (2 * t.n) AS BIGINT)
         AS trace_share_micro
FROM loops l CROSS JOIN tot t
GROUP BY l.a, t.n
"""


def q_rework_metric_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per activity: immediate self-loop rework metrics."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_rework_sql("spark"))


ORACLE_REWORK_METRIC_REPORT = _rework_sql("duck")


PROCMINE_QUERIES = {
    "dfg_performance_map": q_dfg_performance_map,
    "declare_conformance_report": q_declare_conformance_report,
    "trace_variant_table": q_trace_variant_table,
    "happy_path_fitness": q_happy_path_fitness,
    "rework_metric_report": q_rework_metric_report,
}

PROCMINE_ORACLES = {
    "dfg_performance_map": ORACLE_DFG_PERFORMANCE_MAP,
    "declare_conformance_report": ORACLE_DECLARE_CONFORMANCE_REPORT,
    "trace_variant_table": ORACLE_TRACE_VARIANT_TABLE,
    "happy_path_fitness": ORACLE_HAPPY_PATH_FITNESS,
    "rework_metric_report": ORACLE_REWORK_METRIC_REPORT,
}

_q.QUERIES.update(PROCMINE_QUERIES)
_q.ORACLES.update(PROCMINE_ORACLES)
