"""Fulfillment-analytics catalog, round 4 (wave 74): five operators
over the orders⋈lineitem date pair (o_orderdate → l_shipdate) — the
order-lifecycle reporting a warehouse ships daily, all in exact
integer day arithmetic (DATE subtraction/datediff agree across the
engines; no timestamp math).

* ``ship_latency_profile`` — per order priority: lineitem count,
  min/max/mean (half-up micro) and exact lower-median ship latency
  in days.
* ``backlog_timeseries`` — daily order backlog: cumulative placed
  minus cumulative fully-shipped, one row per order-activity day —
  the open-work curve an ops dashboard plots.
* ``fill_rate_by_month`` — per order month: lineitems shipped within
  {_FILL_DAYS} days over total, half-up micro fill rate.
* ``cohort_ship_matrix`` — order-month × ship-month lineitem counts
  with per-cohort micro shares — the fulfillment cohort heatmap.
* ``priority_sla_audit`` — per priority, the SLA ladder: share of
  lineitems shipped within {_SLA_DAYS} days (one column per rung).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_fulfillment_wave.py.

Cross-engine float policy: exact integers (day diffs, counts);
ratios are single half-up micro divisions.  Months are formatted
'yyyy-MM' strings on both engines.

Scale notes: the lineitem⋈orders join shuffles on orderkey (neither
side broadcasts at 100 TB — the documented product); every report
then partial-aggregates to ≤#priorities/#days/#months rows; the
backlog prefix window runs over the bounded distinct-day frame only.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_FILL_DAYS = 60
_SLA_DAYS = [30, 60, 90]


def _lat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, priority, o_orderdate, l_shipdate, latency days)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    return o.join(li, o.o_orderkey == li.l_orderkey).selectExpr(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        "l_shipdate",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS lat",
    )


_LAT_SQL = """
lat AS (
  SELECT o.o_orderkey, o.o_orderpriority, o.o_orderdate, l.l_shipdate,
         CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) AS BIGINT) AS lat
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
"""


# ---------------------------------------------------------------------------
# ship_latency_profile
# ---------------------------------------------------------------------------


def q_ship_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority ship latency: count/min/max, half-up micro mean,
    exact lower median by rank selection."""
    lat = _q._persist_tracked(_lat(spark, sf_dir))
    # lower median WITHOUT ranking raw rows in the ≤5 fixed priority
    # partitions (the median_polish r6 fix): compress to (priority,
    # lat) counts — latencies are bounded ints — and read the value at
    # rank (n + 1) DIV 2 off cumulative counts; the o_orderkey
    # tiebreak cannot change the SELECTED lat value, because position
    # k of the (lat, key)-ordered partition carries the same lat as
    # position k of the lat-ordered multiset.
    cnt = lat.groupBy("o_orderpriority", "lat").agg(
        F.count("*").alias("_n")
    )
    med = (
        cnt.selectExpr(
            "o_orderpriority",
            "lat",
            "_n",
            "sum(_n) OVER (PARTITION BY o_orderpriority ORDER BY lat)"
            " AS _cum",
            "(sum(_n) OVER (PARTITION BY o_orderpriority) + 1) DIV 2"
            " AS _tgt",
        )
        .where("_cum >= _tgt AND _cum - _n < _tgt")
        .selectExpr("o_orderpriority", "lat AS median_days")
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.min("lat").cast("long").alias("min_days"),
            F.max("lat").cast("long").alias("max_days"),
            F.sum("lat").cast("long").alias("s"),
        )
        .join(med, "o_orderpriority")
        .selectExpr(
            "o_orderpriority",
            "n_items",
            "min_days",
            "max_days",
            "CASE WHEN s >= 0 THEN"
            " CAST((2000000 * s + n_items) DIV (2 * n_items) AS BIGINT)"
            " ELSE -CAST((-2000000 * s + n_items) DIV (2 * n_items)"
            " AS BIGINT) END AS mean_days_micro",
            "median_days",
        )
    )


ORACLE_SHIP_LATENCY_PROFILE = f"""
WITH {_LAT_SQL},
med AS (
  SELECT o_orderpriority, lat AS median_days FROM (
    SELECT o_orderpriority, lat,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY lat, o_orderkey) AS rk,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM lat) WHERE rk = (n + 1) // 2),
agg AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(min(lat) AS BIGINT) AS min_days,
         CAST(max(lat) AS BIGINT) AS max_days,
         CAST(sum(lat) AS BIGINT) AS s
  FROM lat GROUP BY o_orderpriority)
SELECT a.o_orderpriority, a.n_items, a.min_days, a.max_days,
       CASE WHEN a.s >= 0 THEN
         CAST((2000000 * a.s + a.n_items) // (2 * a.n_items) AS BIGINT)
       ELSE -CAST((-2000000 * a.s + a.n_items) // (2 * a.n_items)
                  AS BIGINT) END AS mean_days_micro,
       m.median_days
FROM agg a JOIN med m ON m.o_orderpriority = a.o_orderpriority
"""


# ---------------------------------------------------------------------------
# backlog_timeseries
# ---------------------------------------------------------------------------


def q_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog: per activity day, orders placed that
    day, orders fully shipped that day (last lineitem ship date), and
    the running backlog — prefix sums over the bounded day frame."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    done = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("done_date"))
    )
    placed = o.groupBy("o_orderdate").agg(
        F.count("*").cast("long").alias("placed")
    ).selectExpr("o_orderdate AS d", "placed")
    finished = done.groupBy("done_date").agg(
        F.count("*").cast("long").alias("shipped")
    ).selectExpr("done_date AS d", "shipped")
    days = placed.join(finished, "d", "full_outer").selectExpr(
        "CAST(d AS STRING) AS day",
        "coalesce(placed, 0L) AS placed",
        "coalesce(shipped, 0L) AS shipped",
    )
    return days.selectExpr(
        "day",
        "placed",
        "shipped",
        "sum(placed - shipped) OVER (ORDER BY day"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS backlog",
    )


ORACLE_BACKLOG_TIMESERIES = """
WITH done AS (
  SELECT l_orderkey, max(l_shipdate) AS done_date
  FROM lineitem GROUP BY l_orderkey),
placed AS (
  SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS placed
  FROM orders GROUP BY o_orderdate),
finished AS (
  SELECT done_date AS d, CAST(count(*) AS BIGINT) AS shipped
  FROM done GROUP BY done_date),
days AS (
  SELECT CAST(coalesce(p.d, f.d) AS VARCHAR) AS day,
         coalesce(p.placed, 0) AS placed,
         coalesce(f.shipped, 0) AS shipped
  FROM placed p FULL OUTER JOIN finished f ON f.d = p.d)
SELECT day, placed, shipped,
       CAST(sum(placed - shipped) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS backlog
FROM days
"""


# ---------------------------------------------------------------------------
# fill_rate_by_month
# ---------------------------------------------------------------------------


def q_fill_rate_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order month: lineitems shipped within {_FILL_DAYS} days /
    total, half-up micro."""
    return (
        _lat(spark, sf_dir)
        .selectExpr(
            "date_format(o_orderdate, 'yyyy-MM') AS order_month",
            f"CASE WHEN lat <= {_FILL_DAYS} THEN 1 ELSE 0 END AS filled",
        )
        .groupBy("order_month")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("filled").cast("long").alias("n_filled"),
        )
        .selectExpr(
            "order_month",
            "n_items",
            "n_filled",
            "CAST((2000000 * n_filled + n_items) DIV (2 * n_items)"
            " AS BIGINT) AS fill_micro",
        )
    )


ORACLE_FILL_RATE_BY_MONTH = f"""
WITH {_LAT_SQL}
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN lat <= {_FILL_DAYS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_filled,
       CAST((2000000 * sum(CASE WHEN lat <= {_FILL_DAYS} THEN 1 ELSE 0
                 END) + count(*)) // (2 * count(*)) AS BIGINT)
         AS fill_micro
FROM lat GROUP BY strftime(o_orderdate, '%Y-%m')
"""


# ---------------------------------------------------------------------------
# cohort_ship_matrix
# ---------------------------------------------------------------------------


def q_cohort_ship_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order-month × ship-month lineitem counts with per-cohort
    half-up micro shares."""
    base = _q._persist_tracked(
        _lat(spark, sf_dir).selectExpr(
            "date_format(o_orderdate, 'yyyy-MM') AS order_month",
            "date_format(l_shipdate, 'yyyy-MM') AS ship_month",
        )
    )
    cell = base.groupBy("order_month", "ship_month").agg(
        F.count("*").cast("long").alias("n_items")
    )
    tot = base.groupBy("order_month").agg(
        F.count("*").cast("long").alias("cohort_total")
    )
    return cell.join(F.broadcast(tot), "order_month").selectExpr(
        "order_month",
        "ship_month",
        "n_items",
        "cohort_total",
        "CAST((2000000 * n_items + cohort_total) DIV (2 * cohort_total)"
        " AS BIGINT) AS share_micro",
    )


ORACLE_COHORT_SHIP_MATRIX = f"""
WITH {_LAT_SQL},
base AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
         strftime(l_shipdate, '%Y-%m') AS ship_month
  FROM lat),
cell AS (
  SELECT order_month, ship_month, CAST(count(*) AS BIGINT) AS n_items
  FROM base GROUP BY order_month, ship_month),
tot AS (
  SELECT order_month, CAST(count(*) AS BIGINT) AS cohort_total
  FROM base GROUP BY order_month)
SELECT c.order_month, c.ship_month, c.n_items, t.cohort_total,
       CAST((2000000 * c.n_items + t.cohort_total)
            // (2 * t.cohort_total) AS BIGINT) AS share_micro
FROM cell c JOIN tot t ON t.order_month = c.order_month
"""


# ---------------------------------------------------------------------------
# priority_sla_audit
# ---------------------------------------------------------------------------


def q_priority_sla_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA ladder per priority: micro share of lineitems shipped
    within each of {_SLA_DAYS} days — one column per rung."""
    aggs = [
        F.count("*").cast("long").alias("n_items"),
    ]
    for d in _SLA_DAYS:
        aggs.append(
            F.sum(F.expr(f"CASE WHEN lat <= {d} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"n_within_{d}")
        )
    sel = ["o_orderpriority", "n_items"]
    for d in _SLA_DAYS:
        sel.append(f"n_within_{d}")
        sel.append(
            f"CAST((2000000 * n_within_{d} + n_items) DIV (2 * n_items)"
            f" AS BIGINT) AS sla{d}_micro"
        )
    return (
        _lat(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(*aggs)
        .selectExpr(*sel)
    )


def _sla_oracle() -> str:
    cols = ["o_orderpriority", "CAST(count(*) AS BIGINT) AS n_items"]
    for d in _SLA_DAYS:
        cols.append(
            f"CAST(sum(CASE WHEN lat <= {d} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_within_{d}"
        )
        cols.append(
            f"CAST((2000000 * sum(CASE WHEN lat <= {d} THEN 1 ELSE 0 END)"
            f" + count(*)) // (2 * count(*)) AS BIGINT) AS sla{d}_micro"
        )
    return (
        f"WITH {_LAT_SQL}\nSELECT "
        + ", ".join(cols)
        + " FROM lat GROUP BY o_orderpriority"
    )


ORACLE_PRIORITY_SLA_AUDIT = _sla_oracle()


FULFILLMENT_QUERIES = {
    "ship_latency_profile": q_ship_latency_profile,
    "backlog_timeseries": q_backlog_timeseries,
    "fill_rate_by_month": q_fill_rate_by_month,
    "cohort_ship_matrix": q_cohort_ship_matrix,
    "priority_sla_audit": q_priority_sla_audit,
}

FULFILLMENT_ORACLES = {
    "ship_latency_profile": ORACLE_SHIP_LATENCY_PROFILE,
    "backlog_timeseries": ORACLE_BACKLOG_TIMESERIES,
    "fill_rate_by_month": ORACLE_FILL_RATE_BY_MONTH,
    "cohort_ship_matrix": ORACLE_COHORT_SHIP_MATRIX,
    "priority_sla_audit": ORACLE_PRIORITY_SLA_AUDIT,
}

_q.QUERIES.update(FULFILLMENT_QUERIES)
_q.ORACLES.update(FULFILLMENT_ORACLES)
