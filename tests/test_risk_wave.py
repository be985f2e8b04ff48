"""Semantics tests for the wave-103 risk entries: VaR/CVaR, max
drawdown, Sharpe-like ratio, volatility regimes, Kelly fraction.
The DuckDB value-hash gate is scripts/check_queries.py; these replay
the series algebra in pure Python and pin the risk structure (CVaR ≤
VaR, drawdown non-negative, regimes partition the days, Kelly ≤ p)."""

from __future__ import annotations

from datetime import timedelta

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_risk import (
    _VAR_PCT,
    q_historical_var_cvar,
    q_kelly_fraction,
    q_max_drawdown_curve,
    q_sharpe_like_ratio,
    q_volatility_regimes,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _deltas():
    rows = dict(
        duckdb.sql(
            f"""SELECT CAST(l_shipdate AS DATE),
                  sum(CAST(floor(l_extendedprice) AS BIGINT))
                FROM '{SF}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )
    lo, hi = min(rows), max(rows)
    xs, d = [], lo
    while d <= hi:
        xs.append(int(rows.get(d, 0)))
        d += timedelta(days=1)
    return xs, [b - a for a, b in zip(xs, xs[1:])], lo


def test_var_cvar(spark):
    _xs, ds, _lo = _deltas()
    n = len(ds)
    srt = sorted(ds)
    rk = -(-_VAR_PCT * n // 100)
    var_level = srt[rk - 1]
    tail = [x for x in ds if x <= var_level]
    r = q_historical_var_cvar(spark, SF).collect()[0]
    assert r["n_days"] == n
    assert r["var_level"] == var_level
    assert r["tail_days"] == len(tail)
    s = sum(tail)
    want = (
        _halfup(1_000_000 * s, len(tail))
        if s >= 0
        else -_halfup(1_000_000 * -s, len(tail))
    )
    assert r["cvar_micro"] == want
    # CVaR is at least as bad as VaR
    assert r["cvar_micro"] <= var_level * 1_000_000


def test_max_drawdown(spark):
    xs, _ds, lo = _deltas()
    eq, peak, mdd, mdate = 0, -1 << 62, 0, None
    cum = 0
    for i, x in enumerate(xs):
        cum += x
        peak = max(peak, cum)
        dd = peak - cum
        if dd > mdd:
            mdd = dd
            mdate = lo + timedelta(days=i)
    r = q_max_drawdown_curve(spark, SF).collect()[0]
    assert r["max_drawdown"] == mdd
    if mdd > 0:
        assert r["max_drawdown_date"] == mdate
    assert r["longest_underwater_days"] >= 0


def test_sharpe_moments(spark):
    _xs, ds, _lo = _deltas()
    n, s1 = len(ds), sum(ds)
    s2 = sum(x * x for x in ds)
    r = q_sharpe_like_ratio(spark, SF).collect()[0]
    assert r["n"] == n and r["s1"] == s1
    sig = int(((n * s2 - s1 * s1) ** 0.5) / n * 1e6 + 0.5)
    assert r["sigma_micro"] == sig
    want_mean = (
        _halfup(1_000_000 * s1, n) if s1 >= 0 else -_halfup(-1_000_000 * s1, n)
    )
    assert r["mean_micro"] == want_mean


def test_vol_regimes_partition(spark):
    _xs, ds, _lo = _deltas()
    rows = {r["high_vol"]: r for r in q_volatility_regimes(spark, SF).collect()}
    assert set(rows) == {0, 1}
    assert (
        rows[0]["total_days"] + rows[1]["total_days"] == len(ds)
    )
    for r in rows.values():
        assert r["longest_days"] <= r["total_days"]


def test_kelly_consistency(spark):
    _xs, ds, _lo = _deltas()
    ups = [x for x in ds if x > 0]
    dns = [-x for x in ds if x < 0]
    r = q_kelly_fraction(spark, SF).collect()[0]
    assert r["n_up"] == len(ups) and r["n_dn"] == len(dns)
    assert r["s_up"] == sum(ups) and r["s_dn"] == sum(dns)
    assert r["p_micro"] == _halfup(
        1_000_000 * len(ups), len(ups) + len(dns)
    )
    # f* <= p always (the (1-p)/b term is non-negative)
    assert r["kelly_micro"] <= r["p_micro"]


def test_registered_in_catalog():
    for name in (
        "historical_var_cvar",
        "max_drawdown_curve",
        "sharpe_like_ratio",
        "volatility_regimes",
        "kelly_fraction",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
