"""Data-lifecycle catalog, round 4 (wave 95): five lakehouse
housekeeping operators — freshness profiles, retention ledgers, TTL
forecasts, cold-data candidates, and tiering-policy simulation — the
storage-lifecycle decisions a 100 TB table owner automates, every
number an exact count off the month-partition histogram.  "Now" is
the data's own max ship month (no wall clock — resumable and
deterministic).

* ``table_age_profile`` — per fact table (orders / lineitem /
  events on their own date columns): rows, first/last month, rows in
  the trailing 12 months and their share micro — the freshness
  dashboard row.
* ``partition_retention_ledger`` — per (ship-month partition ×
  retention policy {_RET_GRID} months): age in months, the
  keep/expire action, and the expirable row count — the ledger a
  retention job consumes.
* ``ttl_expiry_forecast`` — for each horizon month k = 1..{_TTL_H}
  ahead at retention {_TTL_RET} months: rows newly crossing the
  boundary at +k and the running total — the capacity-planning
  curve.
* ``cold_data_candidates`` — parts with no shipment in the trailing
  {_COLD_M} months: the count + revenue mass summary row, plus the
  {_COLD_K} coldest parts by (last activity, key) via
  TakeOrderedAndProject.
* ``tiering_policy_sim`` — the (hot, warm) cutoff grid
  {_TIER_GRID}: per policy the partition and row counts per tier and
  the cold-row fraction micro — the policy comparison table.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_lifecycle_wave.py.

Cross-engine float policy: months arithmetic on first-of-month
DATEs, exact BIGINT counts, half-up micro shares — no floating
point in this wave.

Scale notes: everything reduces to the ≤#months partition histogram
(one partial-agg scan per table) or a per-part last-activity partial
agg; the coldest-parts list is TakeOrdered; policy/horizon grids
join in as constants; no corpus-sized window, no driver loop, no
wall-clock dependence.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_RET_GRID = [12, 36, 60]
_TTL_H = 12
_TTL_RET = 36
_COLD_M = 12
_COLD_K = 10
_TIER_GRID = [(6, 24), (3, 12), (12, 48)]


def _mb(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"CAST(months_between({b}, {a}) AS BIGINT)"
    return f"CAST(datediff('month', {a}, {b}) AS BIGINT)"


def _hist_sql(dialect: str) -> str:
    return f"""
hist AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
         CAST(count(*) AS BIGINT) AS rows_
  FROM lineitem GROUP BY date_trunc('month', l_shipdate)),
nowm AS (SELECT max(m) AS now_m FROM hist),
aged AS (
  SELECT h.m, h.rows_, {_mb(dialect, 'h.m', 'n.now_m')} AS age_m
  FROM hist h CROSS JOIN nowm n)
"""


# ---------------------------------------------------------------------------
# table_age_profile
# ---------------------------------------------------------------------------


def _profile_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    legs = []
    for tbl, col in (
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
        ("events", "ts"),
    ):
        mexpr = f"CAST(date_trunc('month', {col}) AS DATE)"
        legs.append(f"""
SELECT '{tbl}' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       min({mexpr}) AS first_month,
       max({mexpr}) AS last_month,
       CAST(sum(CASE WHEN {_mb(dialect, mexpr, f'(SELECT max({mexpr}) FROM {tbl})')}
            < 12 THEN 1 ELSE 0 END) AS BIGINT) AS rows_last_12m,
       CAST((2000000 * sum(CASE WHEN
            {_mb(dialect, mexpr, f'(SELECT max({mexpr}) FROM {tbl})')}
            < 12 THEN 1 ELSE 0 END) + count(*)) {intdiv}
            (2 * count(*)) AS BIGINT) AS fresh_share_micro
FROM {tbl}""")
    return " UNION ALL ".join(legs)


def q_table_age_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness dashboard row per fact table."""
    _q._register_views(spark, sf_dir, ["orders", "lineitem", "events"])
    return spark.sql(_profile_sql("spark"))


ORACLE_TABLE_AGE_PROFILE = _profile_sql("duck")


# ---------------------------------------------------------------------------
# partition_retention_ledger
# ---------------------------------------------------------------------------


def _ledger_sql(dialect: str) -> str:
    grid = ", ".join(f"({p})" for p in _RET_GRID)
    return f"""
WITH {_hist_sql(dialect)},
pol AS (SELECT * FROM (VALUES {grid}) AS t(retention_months))
SELECT a.m AS partition_month,
       CAST(p.retention_months AS BIGINT) AS retention_months,
       a.age_m,
       a.rows_ AS n_rows,
       CASE WHEN a.age_m >= p.retention_months THEN 'expire'
            ELSE 'keep' END AS action,
       CAST(CASE WHEN a.age_m >= p.retention_months THEN a.rows_
            ELSE 0 END AS BIGINT) AS expirable_rows
FROM aged a CROSS JOIN pol p
"""


def q_partition_retention_ledger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per (partition, policy): age, action, expirable rows."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_ledger_sql("spark"))


ORACLE_PARTITION_RETENTION_LEDGER = _ledger_sql("duck")


# ---------------------------------------------------------------------------
# ttl_expiry_forecast
# ---------------------------------------------------------------------------


def _ttl_sql(dialect: str) -> str:
    ks = (
        f"SELECT explode(sequence(1, {_TTL_H})) AS k"
        if dialect == "spark"
        else f"SELECT unnest(generate_series(1, {_TTL_H})) AS k"
    )
    return f"""
WITH {_hist_sql(dialect)},
ks AS ({ks})
SELECT CAST(ks.k AS BIGINT) AS horizon_months,
       CAST(sum(CASE WHEN a.age_m = {_TTL_RET} - ks.k
            THEN a.rows_ ELSE 0 END) AS BIGINT) AS newly_expiring,
       CAST(sum(CASE WHEN a.age_m < {_TTL_RET}
            AND a.age_m + ks.k >= {_TTL_RET}
            THEN a.rows_ ELSE 0 END) AS BIGINT) AS cumulative_expiring
FROM aged a CROSS JOIN ks
GROUP BY ks.k
"""


def q_ttl_expiry_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows crossing the retention boundary at each future month."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_ttl_sql("spark"))


ORACLE_TTL_EXPIRY_FORECAST = _ttl_sql("duck")


# ---------------------------------------------------------------------------
# cold_data_candidates
# ---------------------------------------------------------------------------


def _cold_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
WITH per_part AS (
  SELECT l_partkey,
         max(CAST(date_trunc('month', l_shipdate) AS DATE)) AS last_m,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS revenue
  FROM lineitem GROUP BY l_partkey),
nowm AS (SELECT max(last_m) AS now_m FROM per_part),
aged AS (
  SELECT p.l_partkey, p.last_m, p.revenue,
         {_mb(dialect, 'p.last_m', 'n.now_m')} AS idle_m
  FROM per_part p CROSS JOIN nowm n),
cold AS (SELECT * FROM aged WHERE idle_m >= {_COLD_M}),
summary AS (
  SELECT CAST('_SUMMARY' AS {strtype}) AS label,
         CAST(count(*) AS BIGINT) AS n_parts,
         CAST(coalesce(sum(revenue), 0) AS BIGINT) AS revenue,
         CAST((2000000 * count(*) + (SELECT count(*) FROM aged))
              {intdiv} (2 * (SELECT count(*) FROM aged)) AS BIGINT)
           AS cold_share_micro
  FROM cold),
top AS (
  SELECT CAST(l_partkey AS {strtype}) AS label,
         CAST(idle_m AS BIGINT) AS n_parts,
         revenue,
         CAST(0 AS BIGINT) AS cold_share_micro
  FROM cold ORDER BY last_m, l_partkey LIMIT {_COLD_K})
SELECT * FROM summary UNION ALL SELECT * FROM top
"""


def q_cold_data_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold parts summary + the coldest-K list (TakeOrdered)."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_cold_sql("spark"))


ORACLE_COLD_DATA_CANDIDATES = _cold_sql("duck")


# ---------------------------------------------------------------------------
# tiering_policy_sim
# ---------------------------------------------------------------------------


def _tier_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    grid = ", ".join(f"({h}, {w})" for h, w in _TIER_GRID)
    return f"""
WITH {_hist_sql(dialect)},
pol AS (SELECT * FROM (VALUES {grid}) AS t(hot_m, warm_m))
SELECT CAST(p.hot_m AS BIGINT) AS hot_m,
       CAST(p.warm_m AS BIGINT) AS warm_m,
       CAST(sum(CASE WHEN a.age_m <= p.hot_m THEN 1 ELSE 0 END)
            AS BIGINT) AS hot_partitions,
       CAST(sum(CASE WHEN a.age_m <= p.hot_m THEN a.rows_ ELSE 0
            END) AS BIGINT) AS hot_rows,
       CAST(sum(CASE WHEN a.age_m > p.hot_m AND a.age_m <= p.warm_m
            THEN a.rows_ ELSE 0 END) AS BIGINT) AS warm_rows,
       CAST(sum(CASE WHEN a.age_m > p.warm_m THEN a.rows_ ELSE 0
            END) AS BIGINT) AS cold_rows,
       CAST((2000000 * sum(CASE WHEN a.age_m > p.warm_m THEN a.rows_
            ELSE 0 END) + sum(a.rows_)) {intdiv} (2 * sum(a.rows_))
            AS BIGINT) AS cold_share_micro
FROM aged a CROSS JOIN pol p
GROUP BY p.hot_m, p.warm_m
"""


def q_tiering_policy_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/warm/cold row splits per tiering policy."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_tier_sql("spark"))


ORACLE_TIERING_POLICY_SIM = _tier_sql("duck")


LIFECYCLE_QUERIES = {
    "table_age_profile": q_table_age_profile,
    "partition_retention_ledger": q_partition_retention_ledger,
    "ttl_expiry_forecast": q_ttl_expiry_forecast,
    "cold_data_candidates": q_cold_data_candidates,
    "tiering_policy_sim": q_tiering_policy_sim,
}

LIFECYCLE_ORACLES = {
    "table_age_profile": ORACLE_TABLE_AGE_PROFILE,
    "partition_retention_ledger": ORACLE_PARTITION_RETENTION_LEDGER,
    "ttl_expiry_forecast": ORACLE_TTL_EXPIRY_FORECAST,
    "cold_data_candidates": ORACLE_COLD_DATA_CANDIDATES,
    "tiering_policy_sim": ORACLE_TIERING_POLICY_SIM,
}

_q.QUERIES.update(LIFECYCLE_QUERIES)
_q.ORACLES.update(LIFECYCLE_ORACLES)
