"""Semantics tests for the wave-76 survival-extension entries:
Nelson-Aalen, truncated means, lifetime quantiles, weekly life table,
crude hazard ratio.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against a pure-Python
replay of the time-to-first-big-purchase cohort."""

from __future__ import annotations

from collections import defaultdict
from datetime import date

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_survival2 import (
    _BIG,
    _TAUS,
    q_crude_hazard_ratio,
    q_life_table_weekly,
    q_lifetime_quantiles,
    q_nelson_aalen,
    q_truncated_lifetime_means,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _cohort():
    """user -> (dur, event) replayed in Python."""
    rows = duckdb.sql(
        f"""SELECT user_id, CAST(ts AS DATE), event_type, value
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    first = {}
    last = {}
    first_big = {}
    for uid, d, et, v in rows:
        if uid not in first or d < first[uid]:
            first[uid] = d
        if uid not in last or d > last[uid]:
            last[uid] = d
        if et == "purchase" and v > _BIG:
            if uid not in first_big or d < first_big[uid]:
                first_big[uid] = d
    out = {}
    for uid in first:
        if uid in first_big:
            out[uid] = ((first_big[uid] - first[uid]).days, True)
        else:
            out[uid] = ((last[uid] - first[uid]).days, False)
    return out


def test_cohort_has_both_outcomes():
    co = _cohort()
    assert any(e for _d, e in co.values())
    assert any(not e for _d, e in co.values())


def test_nelson_aalen_matches_replay(spark):
    co = _cohort()
    hist = defaultdict(lambda: [0, 0])
    for dur, ev in co.values():
        hist[dur][0 if ev else 1] += 1
    n = len(co)
    rows = sorted(
        q_nelson_aalen(spark, SF).collect(), key=lambda r: r["dur"]
    )
    assert [r["dur"] for r in rows] == sorted(hist)
    at_risk = n
    cum = 0
    for r in rows:
        d_n, c_n = hist[r["dur"]]
        assert r["d_n"] == d_n and r["c_n"] == c_n
        assert r["n_risk"] == at_risk
        h = _halfup(1_000_000 * d_n, at_risk)
        cum += h
        assert r["hazard_micro"] == h
        assert r["cum_hazard_micro"] == cum
        at_risk -= d_n + c_n
    assert at_risk == 0


def test_truncated_means_match_replay(spark):
    co = _cohort()
    got = {
        (r["tau_days"], r["cohort"]): r
        for r in q_truncated_lifetime_means(spark, SF).collect()
    }
    for tau in _TAUS:
        for label, keep in (
            ("all", lambda e: True),
            ("event", lambda e: e),
            ("censored", lambda e: not e),
        ):
            vals = [min(d, tau) for d, e in co.values() if keep(e)]
            r = got[(tau, label)]
            assert r["n_users"] == len(vals)
            if vals:
                assert r["mean_trunc_micro"] == _halfup(
                    1_000_000 * sum(vals), len(vals)
                )


def test_lifetime_quantiles_match_replay(spark):
    co = _cohort()
    per = defaultdict(list)
    for uid, (d, e) in co.items():
        per["event" if e else "censored"].append((d, uid))
    got = {
        (r["cohort"], r["q_micro"]): r["days"]
        for r in q_lifetime_quantiles(spark, SF).collect()
    }
    for cohort, items in per.items():
        items.sort()
        n = len(items)
        for q in (250_000, 500_000, 750_000):
            rk = max(1, -(-q * n // 1_000_000))
            assert got[(cohort, q)] == items[rk - 1][0]


def test_life_table_matches_replay(spark):
    co = _cohort()
    weekly = defaultdict(lambda: [0, 0])
    for dur, ev in co.values():
        weekly[dur // 7][0 if ev else 1] += 1
    rows = sorted(
        q_life_table_weekly(spark, SF).collect(), key=lambda r: r["week"]
    )
    assert [r["week"] for r in rows] == sorted(weekly)
    enter = len(co)
    for r in rows:
        d_n, c_n = weekly[r["week"]]
        assert r["d_n"] == d_n and r["c_n"] == c_n
        assert r["n_enter"] == enter
        assert r["actuarial_hazard_micro"] == _halfup(
            2 * 1_000_000 * d_n, 2 * enter - c_n
        )
        enter -= d_n + c_n


def test_crude_hazard_ratio_matches_replay(spark):
    co = _cohort()
    grp = {0: [0, 0, 0], 1: [0, 0, 0]}  # users, events, person_days
    for uid, (d, e) in co.items():
        g = grp[uid % 2]
        g[0] += 1
        g[1] += 1 if e else 0
        g[2] += d + 1
    [r] = q_crude_hazard_ratio(spark, SF).collect()
    assert r["n_even"] == grp[0][0] and r["n_odd"] == grp[1][0]
    assert r["events_even"] == grp[0][1] and r["events_odd"] == grp[1][1]
    assert r["days_even"] == grp[0][2] and r["days_odd"] == grp[1][2]
    re = _halfup(1_000_000 * grp[0][1], grp[0][2])
    ro = _halfup(1_000_000 * grp[1][1], grp[1][2])
    assert r["rate_even_micro"] == re and r["rate_odd_micro"] == ro
    if re > 0:
        assert r["ratio_micro"] == _halfup(1_000_000 * ro, re)
    else:
        assert r["ratio_micro"] is None


def test_registered_in_catalog():
    for name in (
        "nelson_aalen",
        "truncated_lifetime_means",
        "lifetime_quantiles",
        "life_table_weekly",
        "crude_hazard_ratio",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
