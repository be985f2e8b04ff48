"""Trade-flow catalog, round 4 (wave 104): five operators over the
full 6-table star (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
nation² ⋈ region²) — the TPC-H Q7-shaped shipping-flow analytics:
who ships to whom, balances, concentration, top routes, and the
intra/inter-region split.  Flow value = Σ⌊l_extendedprice⌋ from
supplier nation → customer nation.

* ``supply_flow_matrix`` — the (supp_nation, cust_nation) flow
  matrix: lines, quantity, revenue per directed pair.
* ``trade_balance_report`` — per nation: exports, imports, the
  signed balance, and total trade — Σ balances must be 0 (pinned).
* ``flow_concentration`` — per supplier nation: the HHI of its
  customer-nation revenue mix in half-up micro — export-partner
  concentration.
* ``top_trade_routes`` — the top {_ROUTES_K} directed routes by
  revenue via deterministic TakeOrdered (revenue DESC, pair).
* ``intra_region_share`` — region-level rollup: per supplier
  region, revenue kept inside the region vs exported across regions,
  share micro.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_tradeflow_wave.py.

Cross-engine float policy: exact BIGINT revenue/quantity and
half-up micro shares — no floating point in this wave.

Scale notes: the fact scan shuffles once per key join (order,
customer, supplier keys); nation/region are broadcast-sized dims;
everything reduces to the ≤nations² flow frame before any window;
the route head list is TakeOrdered.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_ROUTES_K = 15

_FLOW_SQL = """
flow AS (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         sr.r_name AS supp_region, cr.r_name AS cust_region,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
           AS quantity,
         CAST(sum(CAST(floor(l.l_extendedprice) AS BIGINT))
              AS BIGINT) AS revenue
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN region cr ON cr.r_regionkey = cn.n_regionkey
  JOIN region sr ON sr.r_regionkey = sn.n_regionkey
  GROUP BY sn.n_name, cn.n_name, sr.r_name, cr.r_name)
"""

_TABLES = [
    "lineitem", "orders", "customer", "supplier", "nation", "region",
]


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    _q._register_views(spark, sf_dir, _TABLES)
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# supply_flow_matrix
# ---------------------------------------------------------------------------

_MATRIX_SQL = f"""
WITH {_FLOW_SQL}
SELECT supp_nation, cust_nation,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       CAST(sum(quantity) AS BIGINT) AS quantity,
       CAST(sum(revenue) AS BIGINT) AS revenue
FROM flow GROUP BY supp_nation, cust_nation
"""


def q_supply_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The directed nation-to-nation shipping matrix."""
    return _run(spark, sf_dir, _MATRIX_SQL)


ORACLE_SUPPLY_FLOW_MATRIX = _MATRIX_SQL


# ---------------------------------------------------------------------------
# trade_balance_report
# ---------------------------------------------------------------------------

_BALANCE_SQL = f"""
WITH {_FLOW_SQL},
ex AS (
  SELECT supp_nation AS nation, CAST(sum(revenue) AS BIGINT)
           AS exports
  FROM flow GROUP BY supp_nation),
im AS (
  SELECT cust_nation AS nation, CAST(sum(revenue) AS BIGINT)
           AS imports
  FROM flow GROUP BY cust_nation)
SELECT coalesce(e.nation, i.nation) AS nation,
       coalesce(e.exports, 0) AS exports,
       coalesce(i.imports, 0) AS imports,
       coalesce(e.exports, 0) - coalesce(i.imports, 0) AS balance,
       coalesce(e.exports, 0) + coalesce(i.imports, 0) AS total_trade
FROM ex e FULL OUTER JOIN im i ON i.nation = e.nation
"""


def q_trade_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exports, imports, signed balance per nation."""
    return _run(spark, sf_dir, _BALANCE_SQL)


ORACLE_TRADE_BALANCE_REPORT = _BALANCE_SQL


# ---------------------------------------------------------------------------
# flow_concentration
# ---------------------------------------------------------------------------


def _hhi_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_FLOW_SQL},
per AS (
  SELECT supp_nation, cust_nation,
         CAST(sum(revenue) AS BIGINT) AS rev
  FROM flow GROUP BY supp_nation, cust_nation),
tot AS (
  SELECT supp_nation, CAST(sum(rev) AS BIGINT) AS rev_tot,
         CAST(count(*) AS BIGINT) AS n_partners
  FROM per GROUP BY supp_nation),
sh AS (
  SELECT p.supp_nation, t.n_partners,
         CAST((2000000 * CAST(p.rev AS {wide}) + t.rev_tot)
              {intdiv} (2 * t.rev_tot) AS BIGINT) AS share_micro
  FROM per p JOIN tot t ON t.supp_nation = p.supp_nation)
SELECT supp_nation,
       CAST(max(n_partners) AS BIGINT) AS n_partners,
       CAST(sum(CAST(share_micro AS {wide}) * share_micro
            {intdiv} 1000000) AS BIGINT) AS hhi_micro
FROM sh GROUP BY supp_nation
"""


def q_flow_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-partner HHI per supplier nation."""
    return _run(spark, sf_dir, _hhi_sql("spark"))


ORACLE_FLOW_CONCENTRATION = _hhi_sql("duck")


# ---------------------------------------------------------------------------
# top_trade_routes
# ---------------------------------------------------------------------------

_ROUTES_SQL = f"""
WITH {_FLOW_SQL},
per AS (
  SELECT supp_nation, cust_nation,
         CAST(sum(revenue) AS BIGINT) AS revenue
  FROM flow GROUP BY supp_nation, cust_nation)
SELECT supp_nation, cust_nation, revenue
FROM per
ORDER BY revenue DESC, supp_nation, cust_nation
LIMIT {_ROUTES_K}
"""


def q_top_trade_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top routes by revenue, deterministic TakeOrdered."""
    return _run(spark, sf_dir, _ROUTES_SQL)


ORACLE_TOP_TRADE_ROUTES = _ROUTES_SQL


# ---------------------------------------------------------------------------
# intra_region_share
# ---------------------------------------------------------------------------


def _intra_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_FLOW_SQL}
SELECT supp_region,
       CAST(sum(CASE WHEN supp_region = cust_region THEN revenue
            ELSE 0 END) AS BIGINT) AS intra_revenue,
       CAST(sum(CASE WHEN supp_region <> cust_region THEN revenue
            ELSE 0 END) AS BIGINT) AS inter_revenue,
       CAST((2000000 * sum(CASE WHEN supp_region = cust_region
            THEN revenue ELSE 0 END) + sum(revenue))
            {intdiv} (2 * sum(revenue)) AS BIGINT)
         AS intra_share_micro
FROM flow GROUP BY supp_region
"""


def q_intra_region_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue kept inside vs exported across regions."""
    return _run(spark, sf_dir, _intra_sql("spark"))


ORACLE_INTRA_REGION_SHARE = _intra_sql("duck")


TRADEFLOW_QUERIES = {
    "supply_flow_matrix": q_supply_flow_matrix,
    "trade_balance_report": q_trade_balance_report,
    "flow_concentration": q_flow_concentration,
    "top_trade_routes": q_top_trade_routes,
    "intra_region_share": q_intra_region_share,
}

TRADEFLOW_ORACLES = {
    "supply_flow_matrix": ORACLE_SUPPLY_FLOW_MATRIX,
    "trade_balance_report": ORACLE_TRADE_BALANCE_REPORT,
    "flow_concentration": ORACLE_FLOW_CONCENTRATION,
    "top_trade_routes": ORACLE_TOP_TRADE_ROUTES,
    "intra_region_share": ORACLE_INTRA_REGION_SHARE,
}

_q.QUERIES.update(TRADEFLOW_QUERIES)
_q.ORACLES.update(TRADEFLOW_ORACLES)
