"""Semantics tests for the wave-102 pricing entries: demand curve,
arc elasticity, revenue-max band, dispersion, discount lift.  The
DuckDB value-hash gate is scripts/check_queries.py; these replay the
band algebra in pure Python and pin the econ structure (bands
partition lines, price monotone across bands, argmax correct,
baseline lift = 1)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_pricing import (
    _NBANDS,
    q_arc_elasticity_curve,
    q_discount_depth_analysis,
    q_price_band_demand_curve,
    q_price_dispersion_by_part,
    q_revenue_max_band,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _lines():
    rows = duckdb.sql(
        f"""SELECT l_partkey, l_extendedprice, l_quantity, l_discount
            FROM '{SF}/lineitem.parquet' WHERE l_quantity > 0"""
    ).fetchall()
    return [
        (
            int(pk),
            int(math.floor(1000 * ep / q)),
            int(math.floor(q)),
            int(math.floor(ep)),
            int(math.floor(100 * d + 0.5)),
        )
        for pk, ep, q, d in rows
    ]


def _bands(lines):
    ps = sorted(p for _pk, p, _q, _r, _d in lines)
    n = len(ps)
    ubs = []
    for k in range(1, _NBANDS + 1):
        rk = -(-k * n // _NBANDS)
        ubs.append(ps[rk - 1])
    lbs = [ps[0] - 1] + ubs[:-1]
    return list(zip(range(1, _NBANDS + 1), lbs, ubs))


def test_demand_curve_partitions(spark):
    lines = _lines()
    bands = _bands(lines)
    got = {r["band"]: r for r in q_price_band_demand_curve(spark, SF).collect()}
    total = 0
    for k, lb, ub in bands:
        members = [(p, q, r) for _pk, p, q, r, _d in lines if lb < p <= ub]
        rk = got[k]
        assert rk["n_lines"] == len(members)
        assert rk["quantity"] == sum(q for _p, q, _r in members)
        assert rk["revenue"] == sum(r for _p, _q, r in members)
        total += len(members)
    assert total == len(lines)
    # mean price monotone across bands
    mp = [got[k]["mean_price_milli"] for k in range(1, _NBANDS + 1)]
    assert mp == sorted(mp)


def test_arc_elasticity_identity(spark):
    rows = q_arc_elasticity_curve(spark, SF).collect()
    assert len(rows) == _NBANDS - 1
    for r in rows:
        assert r["band_hi"] == r["band_lo"] + 1


def test_revenue_max(spark):
    curve = {r["band"]: r["revenue"] for r in q_price_band_demand_curve(spark, SF).collect()}
    best = q_revenue_max_band(spark, SF).collect()[0]
    assert best["best_revenue"] == max(curve.values())
    assert curve[best["best_band"]] == best["best_revenue"]


def test_dispersion_by_part(spark):
    lines = _lines()
    per = defaultdict(list)
    for pk, p, _q, _r, _d in lines:
        per[pk].append(p)
    got = {r["l_partkey"]: r for r in q_price_dispersion_by_part(spark, SF).collect()}
    want_keys = {pk for pk, v in per.items() if len(v) >= 2}
    assert set(got) == want_keys
    for pk in want_keys:
        v = per[pk]
        n, s1, s2 = len(v), sum(v), sum(x * x for x in v)
        r = got[pk]
        assert r["n_lines"] == n
        assert r["min_price_milli"] == min(v)
        assert r["max_price_milli"] == max(v)
        assert r["cv2_micro"] == _halfup(
            1_000_000 * (n * s2 - s1 * s1), s1 * s1
        )


def test_discount_baseline_lift(spark):
    got = {r["discount_pct"]: r for r in q_discount_depth_analysis(spark, SF).collect()}
    assert 0 in got
    # the 0% bucket's lift against itself is exactly 1
    assert got[0]["qty_lift_micro"] == 1_000_000
    lines = _lines()
    from collections import Counter

    per = Counter(d for _pk, _p, _q, _r, d in lines)
    for d, r in got.items():
        assert r["n_lines"] == per[d]


def test_registered_in_catalog():
    for name in (
        "price_band_demand_curve",
        "arc_elasticity_curve",
        "revenue_max_band",
        "price_dispersion_by_part",
        "discount_depth_analysis",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
