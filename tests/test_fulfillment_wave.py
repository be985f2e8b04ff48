"""Semantics tests for the wave-74 fulfillment-analytics entries:
latency profile, backlog, fill rate, cohort matrix, SLA ladder.  The
DuckDB value-hash gate is scripts/check_queries.py; these pin each op
against independent duckdb recomputations plus the backlog's
conservation property."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_fulfillment import (
    _FILL_DAYS,
    _SLA_DAYS,
    q_backlog_timeseries,
    q_cohort_ship_matrix,
    q_fill_rate_by_month,
    q_priority_sla_audit,
    q_ship_latency_profile,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert b > 0
    if a < 0:
        return -_halfup(-a, b)
    return (2 * a + b) // (2 * b)


def _lats():
    """(priority, orderkey, latency_days, order_date, ship_date)."""
    return duckdb.sql(
        f"""SELECT o.o_orderpriority, o.o_orderkey,
              CAST(CAST(l.l_shipdate AS DATE)
                   - CAST(o.o_orderdate AS DATE) AS BIGINT),
              strftime(o.o_orderdate, '%Y-%m'),
              strftime(l.l_shipdate, '%Y-%m')
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l
              ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()


def test_latency_profile_matches_local(spark):
    per = defaultdict(list)
    for pri, ok, lat, _om, _sm in _lats():
        per[pri].append((lat, ok))
    got = {
        r["o_orderpriority"]: r
        for r in q_ship_latency_profile(spark, SF).collect()
    }
    assert set(got) == set(per)
    for pri, pairs in per.items():
        lats = [l for l, _o in pairs]
        r = got[pri]
        assert r["n_items"] == len(lats)
        assert r["min_days"] == min(lats)
        assert r["max_days"] == max(lats)
        assert r["mean_days_micro"] == _halfup(
            1_000_000 * sum(lats), len(lats)
        )
        pairs.sort()
        assert r["median_days"] == pairs[(len(pairs) + 1) // 2 - 1][0]


def test_backlog_conserves_and_ends_at_open_orders(spark):
    rows = sorted(
        q_backlog_timeseries(spark, SF).collect(), key=lambda r: r["day"]
    )
    total_placed = sum(r["placed"] for r in rows)
    total_shipped = sum(r["shipped"] for r in rows)
    n_orders = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    orders_with_items = duckdb.sql(
        f"""SELECT count(DISTINCT l_orderkey)
            FROM '{SF}/lineitem.parquet'"""
    ).fetchone()[0]
    assert total_placed == n_orders
    assert total_shipped == orders_with_items
    # running backlog replays exactly
    run = 0
    for r in rows:
        run += r["placed"] - r["shipped"]
        assert r["backlog"] == run
    assert rows[-1]["backlog"] == n_orders - orders_with_items


def test_fill_rate_matches_local(spark):
    per = defaultdict(lambda: [0, 0])
    for _p, _o, lat, om, _sm in _lats():
        per[om][0] += 1
        per[om][1] += 1 if lat <= _FILL_DAYS else 0
    got = {
        r["order_month"]: r
        for r in q_fill_rate_by_month(spark, SF).collect()
    }
    assert set(got) == set(per)
    for om, (n, f) in per.items():
        r = got[om]
        assert r["n_items"] == n and r["n_filled"] == f
        assert r["fill_micro"] == _halfup(1_000_000 * f, n)


def test_cohort_matrix_matches_local(spark):
    cell = defaultdict(int)
    tot = defaultdict(int)
    for _p, _o, _l, om, sm in _lats():
        cell[(om, sm)] += 1
        tot[om] += 1
    got = {
        (r["order_month"], r["ship_month"]): r
        for r in q_cohort_ship_matrix(spark, SF).collect()
    }
    assert set(got) == set(cell)
    for (om, sm), n in cell.items():
        r = got[(om, sm)]
        assert r["n_items"] == n and r["cohort_total"] == tot[om]
        assert r["share_micro"] == _halfup(1_000_000 * n, tot[om])


def test_sla_ladder_matches_and_is_monotone(spark):
    per = defaultdict(lambda: defaultdict(int))
    n_per = defaultdict(int)
    for pri, _o, lat, _om, _sm in _lats():
        n_per[pri] += 1
        for d in _SLA_DAYS:
            if lat <= d:
                per[pri][d] += 1
    got = {
        r["o_orderpriority"]: r
        for r in q_priority_sla_audit(spark, SF).collect()
    }
    for pri, n in n_per.items():
        r = got[pri]
        assert r["n_items"] == n
        prev = -1
        for d in _SLA_DAYS:
            assert r[f"n_within_{d}"] == per[pri][d]
            assert r[f"sla{d}_micro"] == _halfup(
                1_000_000 * per[pri][d], n
            )
            assert r[f"n_within_{d}"] >= prev  # ladder is monotone
            prev = r[f"n_within_{d}"]


def test_registered_in_catalog():
    for name in (
        "ship_latency_profile",
        "backlog_timeseries",
        "fill_rate_by_month",
        "cohort_ship_matrix",
        "priority_sla_audit",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
