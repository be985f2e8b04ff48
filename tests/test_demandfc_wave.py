"""Semantics tests for the wave-85 demand-forecasting entries:
Croston/SBA, SES grid, safety stock, tracking signal, bakeoff.  The
DuckDB value-hash gate is scripts/check_queries.py; these replay each
recursion in pure Python and pin the model structure (SBA < Croston,
SES level within the data range, reorder point decomposition)."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_demandfc import (
    _CR_ALPHA_INV,
    _SES_ALPHAS,
    _SS_LEAD,
    q_croston_forecast,
    q_forecast_method_bakeoff,
    q_safety_stock_table,
    q_ses_demand_forecast,
    q_tracking_signal,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _part_days():
    rows = duckdb.sql(
        f"""SELECT l_partkey, CAST(l_shipdate AS DATE),
              sum(CAST(floor(l_quantity) AS BIGINT))
            FROM '{SF}/lineitem.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per = defaultdict(list)
    for p, d, s in rows:
        per[int(p)].append((d, int(s)))
    for p in per:
        per[p].sort()
    return per


def test_croston_replay(spark):
    per = _part_days()
    got = {r["l_partkey"]: r for r in q_croston_forecast(spark, SF).collect()}
    want_keys = {p for p, v in per.items() if len(v) >= 2}
    assert set(got) == want_keys
    a = _CR_ALPHA_INV
    for p in want_keys:
        v = per[p]
        z, pp = v[0][1] * 1_000_000, 1_000_000
        for (d0, _s0), (d1, s1) in zip(v, v[1:]):
            gap = (d1 - d0).days
            z = (2 * (s1 * 1_000_000 + (a - 1) * z) + a) // (2 * a)
            pp = (2 * (gap * 1_000_000 + (a - 1) * pp) + a) // (2 * a)
        r = got[p]
        assert r["n_demands"] == len(v)
        assert r["z_micro"] == z and r["p_micro"] == pp
        cr = _halfup(1_000_000 * z, pp)
        assert r["croston_micro"] == cr
        sba = (9 * cr + 5) // 10
        assert r["sba_micro"] == sba
        # SBA debiases downward
        assert sba <= cr


def test_ses_replay(spark):
    rows = sorted(
        duckdb.sql(
            f"""SELECT CAST(l_shipdate AS DATE),
                  sum(CAST(floor(l_quantity) AS BIGINT))
                FROM '{SF}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )
    xs = [int(x) for _d, x in rows]
    got = {(r["a_num"], r["a_den"]): r for r in q_ses_demand_forecast(spark, SF).collect()}
    assert set(got) == set(_SES_ALPHAS)
    for n, dn in _SES_ALPHAS:
        l, sae = xs[0] * 1_000_000, 0
        for x in xs[1:]:
            sae += abs(x * 1_000_000 - l)
            l = (2 * (n * x * 1_000_000 + (dn - n) * l) + dn) // (2 * dn)
        r = got[(n, dn)]
        assert r["n_days"] == len(xs)
        assert r["level_micro"] == l
        assert r["mae_micro"] == (2 * sae + (len(xs) - 1)) // (
            2 * (len(xs) - 1)
        )
        # the smoothed level stays inside the data range
        assert min(xs) * 1_000_000 <= l <= max(xs) * 1_000_000


def test_safety_stock_decomposition(spark):
    per = _part_days()
    all_days = [d for v in per.values() for d, _s in v]
    H = (max(all_days) - min(all_days)).days + 1
    got = {r["l_partkey"]: r for r in q_safety_stock_table(spark, SF).collect()}
    assert set(got) == set(per)
    for p, v in per.items():
        s1 = sum(s for _d, s in v)
        s2 = sum(s * s for _d, s in v)
        r = got[p]
        assert r["k_days"] == len(v) and r["s1"] == s1 and r["H"] == H
        ltd = _halfup(1_000_000 * _SS_LEAD * s1, H)
        ss = int(
            1.645 * (_SS_LEAD * (H * s2 - s1 * s1)) ** 0.5 / H * 1e6 + 0.5
        )
        assert r["leadtime_demand_micro"] == ltd
        assert r["safety_stock_micro"] == ss
        assert r["reorder_point_micro"] == ltd + ss
        assert ss >= 0


def test_tracking_signal_bounds(spark):
    per = _part_days()
    got = {r["l_partkey"]: r for r in q_tracking_signal(spark, SF).collect()}
    for p, r in got.items():
        es = [b - a for (_d1, a), (_d2, b) in zip(per[p], per[p][1:])]
        assert r["n_err"] == len(es)
        assert r["sum_err"] == sum(es)
        assert r["sum_abs_err"] == sum(abs(e) for e in es)
        # |TS| <= n by construction
        assert abs(r["ts_micro"]) <= r["n_err"] * 1_000_000
        assert r["biased"] == (1 if abs(r["ts_micro"]) > 4_000_000 else 0)


def test_bakeoff_matches_local(spark):
    rows = dict(
        duckdb.sql(
            f"""SELECT CAST(l_shipdate AS DATE),
                  sum(CAST(floor(l_quantity) AS BIGINT))
                FROM '{SF}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )
    lo, hi = min(rows), max(rows)
    xs, d = [], lo
    while d <= hi:
        xs.append(int(rows.get(d, 0)))
        d += timedelta(days=1)
    got = {r["method"]: r for r in q_forecast_method_bakeoff(spark, SF).collect()}
    assert set(got) == {"naive_1", "seasonal_naive_7", "expanding_mean"}
    n1 = [abs(b - a) for a, b in zip(xs, xs[1:])]
    assert got["naive_1"]["n_evals"] == len(n1)
    assert got["naive_1"]["mae_micro"] == _halfup(1_000_000 * sum(n1), len(n1))
    s7 = [abs(xs[i] - xs[i - 7]) for i in range(7, len(xs))]
    assert got["seasonal_naive_7"]["n_evals"] == len(s7)
    assert got["seasonal_naive_7"]["mae_micro"] == _halfup(
        1_000_000 * sum(s7), len(s7)
    )
    em = [
        _halfup(1_000_000 * abs(xs[t] * t - sum(xs[:t])), t)
        for t in range(1, len(xs))
    ]
    assert got["expanding_mean"]["n_evals"] == len(em)
    assert got["expanding_mean"]["mae_micro"] == (2 * sum(em) + len(em)) // (
        2 * len(em)
    )


def test_registered_in_catalog():
    for name in (
        "croston_forecast",
        "ses_demand_forecast",
        "safety_stock_table",
        "tracking_signal",
        "forecast_method_bakeoff",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
