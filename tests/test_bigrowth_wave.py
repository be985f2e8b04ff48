"""Semantics tests for the wave-82 BI-growth entries: MoM, YoY, MAT,
fiscal rollup, top-K movers.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against pure-Python
recomputations plus the calendar structure (spine completeness, MAT
telescoping, FY shares summing to one, the movers plan using
TakeOrderedAndProject)."""

from __future__ import annotations

import contextlib
import io
from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_bigrowth import (
    _MOVERS_K,
    q_fiscal_quarter_rollup,
    q_mom_growth_report,
    q_moving_annual_total,
    q_topk_revenue_movers,
    q_yoy_growth_report,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _signed_growth(cur: int, prev: int) -> int:
    if prev <= 0:
        return 0
    if cur >= prev:
        return _halfup(1_000_000 * (cur - prev), prev)
    return -_halfup(1_000_000 * (prev - cur), prev)


def _monthly():
    rows = duckdb.sql(
        f"""SELECT CAST(date_trunc('month', l_shipdate) AS DATE),
              sum(CAST(floor(l_extendedprice) AS BIGINT))
            FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    per = {m: int(r) for m, r in rows}
    lo, hi = min(per), max(per)
    out, m = [], lo
    while m <= hi:
        out.append((m, per.get(m, 0)))
        m = (m.replace(day=1) + __import__("datetime").timedelta(days=32)).replace(day=1)
    return out


def test_mom_growth_matches_local(spark):
    spine = _monthly()
    got = {r["month"]: r for r in q_mom_growth_report(spark, SF).collect()}
    assert set(got) == {m for m, _r in spine[1:]}
    for (pm, pr), (cm, cr) in zip(spine, spine[1:]):
        r = got[cm]
        assert r["revenue"] == cr and r["prev_revenue"] == pr
        assert r["delta"] == cr - pr
        assert r["growth_micro"] == _signed_growth(cr, pr)
        assert r["prev_zero"] == (1 if pr == 0 else 0)


def test_yoy_growth_matches_local(spark):
    spine = dict(_monthly())
    got = {r["month"]: r for r in q_yoy_growth_report(spark, SF).collect()}
    for m, r in got.items():
        prev_m = m.replace(year=m.year - 1)
        assert prev_m in spine
        assert r["prev_revenue"] == spine[prev_m]
        assert r["yoy_growth_micro"] == _signed_growth(
            spine[m], spine[prev_m]
        )
    # every month with a year-ago baseline is present
    want = {m for m in spine if m.replace(year=m.year - 1) in spine}
    assert set(got) == want


def test_mat_telescopes(spark):
    spine = _monthly()
    got = {r["month"]: r for r in q_moving_annual_total(spark, SF).collect()}
    assert set(got) == {m for m, _r in spine}
    for i, (m, rev) in enumerate(spine):
        win = spine[max(0, i - 11) : i + 1]
        r = got[m]
        assert r["revenue"] == rev
        assert r["mat"] == sum(x for _m, x in win)
        assert r["months_in_window"] == len(win)
    # full windows are exactly 12 months
    full = [r for r in got.values() if r["months_in_window"] == 12]
    assert len(full) == len(spine) - 11


def test_fiscal_rollup_shares(spark):
    spine = _monthly()
    fy_rev = defaultdict(lambda: defaultdict(int))
    for m, rev in spine:
        shifted_month = m.month + 6
        fy = m.year + (1 if shifted_month > 12 else 0)
        sm = shifted_month - 12 if shifted_month > 12 else shifted_month
        q = (sm - 1) // 3 + 1
        fy_rev[fy][q] += rev
    got = {(r["fy"], r["fq"]): r for r in q_fiscal_quarter_rollup(spark, SF).collect()}
    want = {(fy, q) for fy, qs in fy_rev.items() for q in qs}
    assert set(got) == want
    for (fy, q), r in got.items():
        tot = sum(fy_rev[fy].values())
        assert r["revenue"] == fy_rev[fy][q]
        assert r["fy_revenue"] == tot
        assert r["fy_share_micro"] == _halfup(1_000_000 * fy_rev[fy][q], tot)
    # shares within a FY sum to ~1e6 (half-up rounding slack)
    for fy in fy_rev:
        s = sum(
            got[(fy, q)]["fy_share_micro"] for q in fy_rev[fy]
        )
        assert abs(s - 1_000_000) <= len(fy_rev[fy])


def test_movers_topk_and_plan(spark):
    rows = duckdb.sql(
        f"""SELECT l_partkey, CAST(date_trunc('month', l_shipdate) AS DATE),
              sum(CAST(floor(l_extendedprice) AS BIGINT))
            FROM '{SF}/lineitem.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per = defaultdict(dict)
    for p, m, r in rows:
        per[int(p)][m] = int(r)
    deltas = []
    for p, series in per.items():
        ms = sorted(series)
        for a, b in zip(ms, ms[1:]):
            deltas.append((abs(series[b] - series[a]), p, b, series[b], series[a]))
    want = sorted(deltas, key=lambda t: (-t[0], t[1], t[2]))[:_MOVERS_K]
    df = q_topk_revenue_movers(spark, SF)
    got = df.collect()
    assert len(got) == _MOVERS_K
    got_set = {(r["abs_delta"], r["l_partkey"], r["month"]) for r in got}
    assert got_set == {(d, p, m) for d, p, m, _c, _pr in want}
    # plan: global top-K must be TakeOrderedAndProject, not a full sort
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_registered_in_catalog():
    for name in (
        "mom_growth_report",
        "yoy_growth_report",
        "moving_annual_total",
        "fiscal_quarter_rollup",
        "topk_revenue_movers",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
