"""Semantics tests for the wave-77 inventory-economics entries:
newsvendor, stockout curve, EOQ, ABC, Syntetos-Boylan profile.  The
DuckDB value-hash gate is scripts/check_queries.py; these pin each op
against pure-Python recomputations plus the theory's optimality
property (the fractile quantile minimizes the cost curve)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_inventory import (
    _ABC_A,
    _ABC_B,
    _EOQ_GRID,
    _NV_COSTS,
    q_abc_classification,
    q_demand_interval_profile,
    q_eoq_grid,
    q_newsvendor_quantile,
    q_stockout_cost_curve,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _daily():
    return sorted(
        int(v)
        for (v,) in duckdb.sql(
            f"""SELECT sum(CAST(floor(l_quantity) AS BIGINT))
                FROM '{SF}/lineitem.parquet'
                GROUP BY CAST(l_shipdate AS DATE)"""
        ).fetchall()
    )


def _cost(demands, s, cu, co):
    return cu * sum(max(0, d - s) for d in demands) + co * sum(
        max(0, s - d) for d in demands
    )


def test_newsvendor_matches_and_minimizes(spark):
    ds = _daily()
    n = len(ds)
    got = {
        (r["cu"], r["co"]): r
        for r in q_newsvendor_quantile(spark, SF).collect()
    }
    assert set(got) == set(_NV_COSTS)
    for cu, co in _NV_COSTS:
        frac = _halfup(1_000_000 * cu, cu + co)
        rk = max(1, -(-frac * n // 1_000_000))
        want = ds[rk - 1]
        r = got[(cu, co)]
        assert r["fractile_micro"] == frac
        assert r["n_days"] == n
        assert r["optimal_stock"] == want
        # the fractile quantile minimizes newsvendor cost over the
        # observed support (allow ties)
        best = _cost(ds, want, cu, co)
        for s in set(ds):
            assert best <= _cost(ds, s, cu, co) + 0


def test_stockout_curve_matches_local(spark):
    ds = _daily()
    n = len(ds)
    got = {
        r["decile"]: r for r in q_stockout_cost_curve(spark, SF).collect()
    }
    assert set(got) == set(range(1, 10))
    for dec in range(1, 10):
        rk = max(1, -(-dec * n // 10))
        s = ds[rk - 1]
        r = got[dec]
        assert r["stock"] == s
        assert r["n_days"] == n
        assert r["underage_units"] == sum(max(0, d - s) for d in ds)
        assert r["overage_units"] == sum(max(0, s - d) for d in ds)
    # underage decreases, overage increases along the grid
    u = [got[d]["underage_units"] for d in range(1, 10)]
    o = [got[d]["overage_units"] for d in range(1, 10)]
    assert all(a >= b for a, b in zip(u, u[1:]))
    assert all(a <= b for a, b in zip(o, o[1:]))


def test_eoq_matches_local(spark):
    total = sum(_daily())
    got = {
        (r["setup"], r["holding"]): r for r in q_eoq_grid(spark, SF).collect()
    }
    assert set(got) == set(_EOQ_GRID)
    for s, h in _EOQ_GRID:
        rad = (2 * total * s) // h
        r = got[(s, h)]
        assert r["annual_demand"] == total
        assert r["radicand"] == rad
        assert r["eoq"] == int(math.floor(math.sqrt(rad)))
        assert r["eoq"] * r["eoq"] <= rad < (r["eoq"] + 2) ** 2


def test_abc_matches_local(spark):
    rows = duckdb.sql(
        f"""SELECT l_partkey,
              sum(CAST(floor(l_extendedprice) AS BIGINT))
            FROM '{SF}/lineitem.parquet' GROUP BY l_partkey"""
    ).fetchall()
    parts = sorted(((int(r), int(p)) for p, r in rows), key=lambda t: (-t[0], t[1]))
    total = sum(r for r, _p in parts)
    classes = defaultdict(lambda: [0, 0])
    cum = 0
    for r, _p in parts:
        cum += r
        cm = _halfup(1_000_000 * cum, total)
        cls = "A" if cm <= _ABC_A else ("B" if cm <= _ABC_B else "C")
        classes[cls][0] += 1
        classes[cls][1] += r
    got = {r["abc_class"]: r for r in q_abc_classification(spark, SF).collect()}
    assert set(got) == set(classes)
    for cls, (n, rev) in classes.items():
        r = got[cls]
        assert r["n_parts"] == n
        assert r["class_revenue"] == rev
        assert r["revenue_share_micro"] == _halfup(1_000_000 * rev, total)
    # by construction of the cumulative cuts, A carries the most
    # revenue (the synthetic revenue is near-uniform, so no Pareto
    # few-parts shape is asserted)
    assert got["A"]["class_revenue"] > got["C"]["class_revenue"]


def test_demand_profile_matches_local(spark):
    rows = duckdb.sql(
        f"""SELECT l_partkey, CAST(l_shipdate AS DATE),
              sum(CAST(floor(l_quantity) AS BIGINT))
            FROM '{SF}/lineitem.parquet'
            GROUP BY l_partkey, CAST(l_shipdate AS DATE)"""
    ).fetchall()
    per = defaultdict(list)
    for p, d, dem in rows:
        per[p].append((d, int(dem)))
    got = {
        r["l_partkey"]: r
        for r in q_demand_interval_profile(spark, SF).collect()
    }
    want_keys = {p for p, v in per.items() if len(v) >= 2}
    assert set(got) == want_keys
    for p in want_keys:
        v = per[p]
        k = len(v)
        span = (max(d for d, _x in v) - min(d for d, _x in v)).days
        s1 = sum(x for _d, x in v)
        s2 = sum(x * x for _d, x in v)
        r = got[p]
        assert r["k_days"] == k and r["span"] == span
        assert r["adi_micro"] == _halfup(1_000_000 * span, k - 1)
        assert r["cv2_micro"] == _halfup(
            1_000_000 * (k * s2 - s1 * s1), s1 * s1
        )
        assert r["sb_class"] in ("smooth", "erratic", "intermittent", "lumpy")


def test_registered_in_catalog():
    for name in (
        "newsvendor_quantile",
        "stockout_cost_curve",
        "eoq_grid",
        "abc_classification",
        "demand_interval_profile",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
