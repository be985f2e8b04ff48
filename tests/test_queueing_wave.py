"""Semantics tests for the wave-79 queueing entries: Little's-law
two-route certification, Erlang-B fold, backlog profile, Kingman
estimate, busy periods.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against pure-Python
recomputations plus the theory's structure (identity gap exactly 0,
blocking monotone in capacity, busy+idle partitioning the horizon)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_queueing import (
    _EB_FACTORS,
    q_busy_period_profile,
    q_erlang_blocking_grid,
    q_kingman_wait_estimate,
    q_littles_law_audit,
    q_peak_backlog_profile,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _intervals():
    return [
        (lo, hi, (hi - lo).days)
        for lo, hi in duckdb.sql(
            f"""SELECT least(CAST(o.o_orderdate AS DATE), d.dep),
                       greatest(CAST(o.o_orderdate AS DATE), d.dep)
                FROM '{SF}/orders.parquet' o
                JOIN (SELECT l_orderkey, CAST(max(l_shipdate) AS DATE) dep
                      FROM '{SF}/lineitem.parquet' GROUP BY 1) d
                  ON d.l_orderkey = o.o_orderkey"""
        ).fetchall()
    ]


def test_littles_law_identity_and_values(spark):
    iv = _intervals()
    n = len(iv)
    sw = sum(w for _l, _h, w in iv)
    horizon = (max(h for _l, h, _w in iv) - min(l for l, _h, _w in iv)).days
    r = q_littles_law_audit(spark, SF).collect()[0]
    assert r["n_jobs"] == n
    assert r["sum_wait_days"] == sw
    assert r["horizon_days"] == horizon
    # the two independent routes agree exactly
    assert r["backlog_integral"] == sw
    assert r["identity_gap"] == 0
    assert r["lambda_micro"] == _halfup(1_000_000 * n, horizon)
    assert r["wait_mean_micro"] == _halfup(1_000_000 * sw, n)
    assert r["wip_mean_micro"] == _halfup(1_000_000 * sw, horizon)


def test_erlang_blocking_monotone(spark):
    rows = {r["f_pct"]: r for r in q_erlang_blocking_grid(spark, SF).collect()}
    assert set(rows) == set(_EB_FACTORS)
    # local recomputation of the recursion at each grid point
    iv = _intervals()
    n = len(iv)
    sw = sum(w for _l, _h, w in iv)
    span = (max(h for _l, h, _w in iv) - min(l for l, _h, _w in iv)).days
    a = ((n - 1) * sw) / (span * n)
    for f in _EB_FACTORS:
        c = -(-((n - 1) * sw * f) // (span * n * 100))
        b = 1.0
        for k in range(1, c + 1):
            b = a * b / (k + a * b)
        r = rows[f]
        assert r["c_servers"] == c
        assert r["blocking_micro"] == int(b * 1e6 + 0.5)
        assert 0 <= r["blocking_micro"] <= 1_000_000
    # more servers -> less blocking
    by_c = sorted(rows.values(), key=lambda r: r["c_servers"])
    bs = [r["blocking_micro"] for r in by_c]
    assert bs == sorted(bs, reverse=True)


def test_peak_backlog_matches_local(spark):
    iv = _intervals()
    deltas = defaultdict(int)
    for lo, hi, _w in iv:
        deltas[lo] += 1
        deltas[hi] -= 1
    cum, step = 0, {}
    for d in sorted(deltas):
        cum += deltas[d]
        step[d] = cum
    months = defaultdict(list)
    for d, depth in step.items():
        months[d.replace(day=1)].append((d, depth))
    got = {r["month"]: r for r in q_peak_backlog_profile(spark, SF).collect()}
    assert set(got) == set(months)
    for m, pts in months.items():
        r = got[m]
        assert r["peak_backlog"] == max(v for _d, v in pts)
        assert r["min_backlog"] == min(v for _d, v in pts)
        assert r["end_backlog"] == max(pts)[1]
        assert r["n_breakpoints"] == len(pts)
    # the step function ends at zero (all orders eventually close)
    assert cum == 0


def test_kingman_ingredients_match_local(spark):
    arr = sorted(
        d
        for (d,) in duckdb.sql(
            f"SELECT CAST(o_orderdate AS DATE) FROM '{SF}/orders.parquet'"
        ).fetchall()
    )
    n_arr = len(arr)
    span = (arr[-1] - arr[0]).days
    days = sorted(set(arr))
    sum_gap2 = sum(
        (b - a).days ** 2 for a, b in zip(days, days[1:])
    )
    iv = _intervals()
    n_jobs = len(iv)
    s1 = sum(w for _l, _h, w in iv)
    s2 = sum(w * w for _l, _h, w in iv)
    r = q_kingman_wait_estimate(spark, SF).collect()[0]
    assert r["n_arr"] == n_arr and r["span"] == span
    assert r["n_jobs"] == n_jobs
    assert r["ia_mean_micro"] == _halfup(1_000_000 * span, n_arr - 1)
    assert r["ia_cv2_micro"] == _halfup(
        1_000_000 * ((n_arr - 1) * sum_gap2 - span * span), span * span
    )
    assert r["svc_mean_micro"] == _halfup(1_000_000 * s1, n_jobs)
    assert r["svc_cv2_micro"] == _halfup(
        1_000_000 * (n_jobs * s2 - s1 * s1), s1 * s1
    )
    # local Kingman recomputation
    a = ((n_arr - 1) * s1) / (span * n_jobs)
    c = int(a) + 1
    rho = a / c
    wq = (
        rho
        / (1 - rho)
        * ((r["ia_cv2_micro"] + r["svc_cv2_micro"]) / 2e6)
        * (s1 / n_jobs)
    )
    assert r["kingman_wq_micro"] == int(wq * 1e6 + 0.5)
    assert r["kingman_wq_micro"] > 0


def test_busy_periods_partition_horizon(spark):
    iv = _intervals()
    horizon = (max(h for _l, h, _w in iv) - min(l for l, _h, _w in iv)).days
    r = q_busy_period_profile(spark, SF).collect()[0]
    assert r["busy_days"] + r["idle_days"] == horizon
    assert r["n_busy_periods"] >= 1
    assert r["longest_busy_days"] <= r["busy_days"]
    assert r["idle_micro"] == _halfup(1_000_000 * r["idle_days"], horizon)


def test_registered_in_catalog():
    for name in (
        "littles_law_audit",
        "erlang_blocking_grid",
        "peak_backlog_profile",
        "kingman_wait_estimate",
        "busy_period_profile",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
