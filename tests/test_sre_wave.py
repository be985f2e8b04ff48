"""Semantics tests for the wave-81 SRE entries: burn rates, budget
ledger, incident MTTR/MTBF, nines ladder, flap audit.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op against
pure-Python recomputations plus the SRE-model structure (spine
completeness, budget conservation, islands really are maximal)."""

from __future__ import annotations

from collections import Counter
from datetime import timedelta

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_sre import (
    _FLAP_THRESH,
    _NINES,
    _SLO_MICRO,
    q_alert_flap_audit,
    q_availability_ladder,
    q_error_budget_ledger,
    q_incident_mttr_mtbf,
    q_slo_burn_rate,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _events():
    return duckdb.sql(
        f"SELECT CAST(ts AS DATE), CAST(floor(epoch(ts)) AS BIGINT),"
        f" event_type FROM '{SF}/events.parquet'"
    ).fetchall()


def _spine():
    ev = _events()
    days = sorted({d for d, _e, _t in ev})
    lo, hi = days[0], days[-1]
    out = []
    d = lo
    tot = Counter(d for d, _e, _t in ev)
    err = Counter(d for d, _e, t in ev if t == "error")
    while d <= hi:
        out.append((d, tot.get(d, 0), err.get(d, 0)))
        d += timedelta(days=1)
    return out


def test_burn_rate_matches_local(spark):
    spine = _spine()
    got = {r["d"]: r for r in q_slo_burn_rate(spark, SF).collect()}
    assert set(got) == {d for d, _t, _e in spine}
    for i, (d, tot, err) in enumerate(spine):
        win = spine[max(0, i - 6) : i + 1]
        t7 = sum(t for _d, t, _e in win)
        e7 = sum(e for _d, _t, e in win)
        r = got[d]
        assert (r["tot"], r["err"], r["tot7"], r["err7"]) == (tot, err, t7, e7)
        b1 = _halfup(1_000_000 * err * 1_000_000, tot * _SLO_MICRO) if tot else 0
        b7 = _halfup(1_000_000 * e7 * 1_000_000, t7 * _SLO_MICRO) if t7 else 0
        assert r["burn_1d_micro"] == b1
        assert r["burn_7d_micro"] == b7
        assert r["alert_1d"] == (1 if b1 > 1_000_000 else 0)
        assert r["alert_7d"] == (1 if b7 > 1_000_000 else 0)


def test_budget_ledger_conserves(spark):
    rows = q_error_budget_ledger(spark, SF).collect()
    assert rows
    bal = 0
    for r in sorted(rows, key=lambda r: r["month"]):
        assert r["allowed_micro"] == _SLO_MICRO * r["tot"]
        assert r["consumed_micro"] == 1_000_000 * r["err"]
        assert r["remaining_micro"] == r["allowed_micro"] - r["consumed_micro"]
        bal += r["remaining_micro"]
        assert r["balance_micro"] == bal


def test_incidents_are_maximal_islands(spark):
    ev = _events()
    hrs = sorted({sec // 3600 for _d, sec, t in ev if t == "error"})
    incs = []
    cur = [hrs[0]]
    for h in hrs[1:]:
        if h - cur[-1] <= 1:
            cur.append(h)
        else:
            incs.append(cur)
            cur = [h]
    incs.append(cur)
    lens = [len(c) for c in incs]
    starts = [c[0] for c in incs]
    gaps = [b - a for a, b in zip(starts, starts[1:])]
    r = q_incident_mttr_mtbf(spark, SF).collect()[0]
    assert r["n_incidents"] == len(incs)
    assert r["degraded_hours"] == sum(lens)
    assert r["longest_hours"] == max(lens)
    assert r["mttr_micro"] == _halfup(1_000_000 * sum(lens), len(incs))
    assert r["mtbf_micro"] == _halfup(1_000_000 * sum(gaps), len(gaps))


def test_availability_ladder_monotone(spark):
    spine = _spine()
    avail = [
        1_000_000 - _halfup(1_000_000 * e, t) if t else 1_000_000
        for _d, t, e in spine
    ]
    got = {r["thresh_micro"]: r for r in q_availability_ladder(spark, SF).collect()}
    assert set(got) == set(_NINES)
    for th in _NINES:
        meet = sum(1 for a in avail if a >= th)
        r = got[th]
        assert r["days_meeting"] == meet
        assert r["days_total"] == len(spine)
        assert r["compliance_micro"] == _halfup(1_000_000 * meet, len(spine))
    # higher bar -> fewer compliant days
    ms = [got[t]["days_meeting"] for t in sorted(_NINES)]
    assert ms == sorted(ms, reverse=True)


def test_flap_audit_matches_local(spark):
    spine = _spine()
    states = [
        1
        if t > 0 and 1_000_000 - _halfup(1_000_000 * e, t) < _FLAP_THRESH
        else 0
        for _d, t, e in spine
    ]
    runs = []
    cur = [states[0]]
    for s in states[1:]:
        if s == cur[-1]:
            cur.append(s)
        else:
            runs.append(cur)
            cur = [s]
    runs.append(cur)
    r = q_alert_flap_audit(spark, SF).collect()[0]
    assert r["n_alert_days"] == sum(states)
    assert r["n_ok_days"] == len(states) - sum(states)
    assert r["n_alert_runs"] == sum(1 for run in runs if run[0] == 1)
    assert r["longest_run_days"] == max(
        (len(run) for run in runs if run[0] == 1), default=0
    )
    assert r["n_flips"] == len(runs) - 1
    assert r["duty_cycle_micro"] == _halfup(
        1_000_000 * sum(states), len(states)
    )


def test_registered_in_catalog():
    for name in (
        "slo_burn_rate",
        "error_budget_ledger",
        "incident_mttr_mtbf",
        "availability_ladder",
        "alert_flap_audit",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
