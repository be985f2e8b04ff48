"""Semantics tests for the wave-71 event-time engineering entries:
lateness frontier, per-type lateness, reorder depth, session-gap
sweep, per-user footrule.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against a pure-Python
replay of the jittered arrival model."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from datetime import timedelta

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_eventtime import (
    _JITTER,
    _LT_W,
    _SG_SECS,
    _WM_SECS,
    q_allowed_lateness_tradeoff,
    q_arrival_footrule,
    q_lateness_by_type,
    q_out_of_order_depth,
    q_session_gap_sensitivity,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _jit(event_id: int) -> int:
    h = int(hashlib.md5(f"a:{event_id}".encode()).hexdigest()[:8], 16)
    return event_id + h % _JITTER


def _stream():
    """Events in simulated arrival order with the running watermark."""
    rows = duckdb.sql(
        f"SELECT event_id, user_id, event_type, ts"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    rows.sort(key=lambda r: (_jit(r[0]), r[0]))
    out = []
    wm = None
    for eid, uid, et, ts in rows:
        wm = ts if wm is None or ts > wm else wm
        out.append((eid, uid, et, ts, wm))
    return out


def test_disorder_is_nontrivial():
    """The jitter model must actually reorder something, or every
    audit below is vacuous."""
    st = _stream()
    by_time = sorted(st, key=lambda r: (r[3], r[0]))
    assert [r[0] for r in st] != [r[0] for r in by_time]


def test_lateness_tradeoff_matches_replay(spark):
    st = _stream()
    n = len(st)
    max_ts = max(r[3] for r in st)
    got = {
        r["delay_s"]: r
        for r in q_allowed_lateness_tradeoff(spark, SF).collect()
    }
    assert set(got) == set(_WM_SECS)
    prev_dropped = None
    for w in _WM_SECS:
        dropped = sum(
            1 for _e, _u, _t, ts, wm in st
            if ts < wm - timedelta(seconds=w)
        )
        state = sum(
            1 for _e, _u, _t, ts, _w in st
            if ts > max_ts - timedelta(seconds=w)
        )
        r = got[w]
        assert r["n_events"] == n
        assert r["dropped"] == dropped
        assert r["state_rows"] == state
        assert r["dropped_micro"] == _halfup(1_000_000 * dropped, n)
        # the frontier is monotone: more delay, fewer drops
        if prev_dropped is not None:
            assert dropped <= prev_dropped
        prev_dropped = dropped


def test_lateness_by_type_matches_replay(spark):
    st = _stream()
    per = defaultdict(lambda: [0, 0])
    for _e, _u, et, ts, wm in st:
        per[et][0] += 1
        if ts < wm - timedelta(seconds=_LT_W):
            per[et][1] += 1
    got = {r["event_type"]: r for r in q_lateness_by_type(spark, SF).collect()}
    assert set(got) == set(per)
    for et, (ne, nl) in per.items():
        r = got[et]
        assert r["n_events"] == ne and r["n_late"] == nl
        assert r["late_micro"] == _halfup(1_000_000 * nl, ne)


def test_out_of_order_depth_matches_replay(spark):
    st = _stream()
    arr_rank = {r[0]: i + 1 for i, r in enumerate(st)}
    by_time = sorted(st, key=lambda r: (r[3], r[0]))
    ds = [abs((i + 1) - arr_rank[r[0]]) for i, r in enumerate(by_time)]
    [r] = q_out_of_order_depth(spark, SF).collect()
    n = len(ds)
    assert r["n_events"] == n
    assert r["max_displacement"] == max(ds)
    assert r["mean_displacement_micro"] == _halfup(1_000_000 * sum(ds), n)
    assert r["displaced_micro"] == _halfup(
        1_000_000 * sum(1 for d in ds if d > 0), n
    )
    # bounded-reorder model: displacement cannot wildly exceed jitter
    assert r["max_displacement"] <= 2 * _JITTER


def test_session_gap_sweep_matches_replay(spark):
    rows = duckdb.sql(
        f"SELECT user_id, ts, event_id FROM '{SF}/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    got = {
        r["gap_s"]: r
        for r in q_session_gap_sensitivity(spark, SF).collect()
    }
    prev_sessions = None
    for g in _SG_SECS:
        sessions = 0
        cur_user, prev_ts = None, None
        for uid, ts, _e in rows:
            if uid != cur_user:
                cur_user, prev_ts = uid, None
            if prev_ts is None or ts > prev_ts + timedelta(seconds=g):
                sessions += 1
            prev_ts = ts
        r = got[g]
        assert r["n_events"] == len(rows)
        assert r["n_sessions"] == sessions
        assert r["mean_events_micro"] == _halfup(
            1_000_000 * len(rows), sessions
        )
        # monotone: larger gap, fewer-or-equal sessions
        if prev_sessions is not None:
            assert sessions <= prev_sessions
        prev_sessions = sessions


def test_arrival_footrule_matches_replay(spark):
    st = _stream()
    per_user = defaultdict(list)
    for i, (eid, uid, _t, ts, _w) in enumerate(st):
        per_user[uid].append((eid, ts, i))
    got = {
        r["user_id"]: r for r in q_arrival_footrule(spark, SF).collect()
    }
    assert set(got) == set(per_user)
    for uid, evs in per_user.items():
        arr_order = {e[0]: i + 1 for i, e in enumerate(evs)}
        by_time = sorted(evs, key=lambda e: (e[1], e[0]))
        ds = [abs((i + 1) - arr_order[e[0]]) for i, e in enumerate(by_time)]
        r = got[uid]
        assert r["n_events"] == len(evs)
        assert r["footrule"] == sum(ds)
        assert r["max_displacement"] == max(ds)


def test_registered_in_catalog():
    for name in (
        "allowed_lateness_tradeoff",
        "lateness_by_type",
        "out_of_order_depth",
        "session_gap_sensitivity",
        "arrival_footrule",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
