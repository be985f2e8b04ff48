"""Semantics tests for the wave-104 trade-flow entries: flow matrix,
balances, concentration, top routes, intra-region share.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin the network
structure (balances sum to zero, matrix mass conserves, HHI in
[1/n, 1] range, routes sorted)."""

from __future__ import annotations

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_tradeflow import (
    _ROUTES_K,
    q_flow_concentration,
    q_intra_region_share,
    q_supply_flow_matrix,
    q_top_trade_routes,
    q_trade_balance_report,
)

SF = "/root/testdata/sf0.001"


def _total_revenue():
    return duckdb.sql(
        f"""SELECT sum(CAST(floor(l.l_extendedprice) AS BIGINT))
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/orders.parquet' o
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()[0][0]


def test_matrix_mass_conserves(spark):
    rows = q_supply_flow_matrix(spark, SF).collect()
    assert sum(r["revenue"] for r in rows) == _total_revenue()
    assert all(r["n_lines"] > 0 for r in rows)


def test_balances_sum_to_zero(spark):
    rows = q_trade_balance_report(spark, SF).collect()
    assert sum(r["balance"] for r in rows) == 0
    for r in rows:
        assert r["balance"] == r["exports"] - r["imports"]
        assert r["total_trade"] == r["exports"] + r["imports"]
    assert sum(r["exports"] for r in rows) == _total_revenue()


def test_hhi_bounds(spark):
    rows = q_flow_concentration(spark, SF).collect()
    for r in rows:
        n = r["n_partners"]
        # HHI of n shares lies in [~1/n, 1] (quantization slack)
        assert r["hhi_micro"] >= 1_000_000 // n - n
        assert r["hhi_micro"] <= 1_000_001


def test_routes_sorted_topk(spark):
    rows = q_top_trade_routes(spark, SF).collect()
    assert len(rows) == _ROUTES_K
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    # the head beats everything outside the head
    mat = q_supply_flow_matrix(spark, SF).collect()
    in_head = {(r["supp_nation"], r["cust_nation"]) for r in rows}
    outside = [
        r["revenue"]
        for r in mat
        if (r["supp_nation"], r["cust_nation"]) not in in_head
    ]
    if outside:
        assert min(revs) >= max(outside)


def test_intra_share(spark):
    rows = q_intra_region_share(spark, SF).collect()
    total = sum(r["intra_revenue"] + r["inter_revenue"] for r in rows)
    assert total == _total_revenue()
    for r in rows:
        assert 0 <= r["intra_share_micro"] <= 1_000_000


def test_registered_in_catalog():
    for name in (
        "supply_flow_matrix",
        "trade_balance_report",
        "flow_concentration",
        "top_trade_routes",
        "intra_region_share",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
