"""Semantics tests for the wave-21 entries: event_markov (first-order
transition matrix) and user_burstiness (Fano factor of daily
activity).  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against an independent single-node recomputation
plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io

from occular_ocr_spark import queries as Q  # noqa: F401  (registration)
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_analytics import (
    q_event_markov,
    q_user_burstiness,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_event_markov_matches_naive(spark):
    by_user = collections.defaultdict(list)
    for r in (
        _t(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ):
        by_user[r["user_id"]].append(r)
    cells = collections.Counter()
    for evs in by_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            cells[(a["event_type"], b["event_type"])] += 1
    got = {
        (r["from_type"], r["to_type"]): r
        for r in q_event_markov(spark, SF).collect()
    }
    assert set(got) == set(cells)
    row_tot = collections.Counter()
    for (f, _), n in cells.items():
        row_tot[f] += n
    for k, n in cells.items():
        assert got[k]["n"] == n
        assert abs(got[k]["p"] - n / row_tot[k[0]]) <= 1e-6


def test_event_markov_rows_sum_to_one(spark):
    rows = q_event_markov(spark, SF).collect()
    by_from = collections.defaultdict(float)
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_from[r["from_type"]] += r["p"]
    for f, tot in by_from.items():
        assert abs(tot - 1.0) <= 5e-6  # half-up cell rounding only


def test_user_burstiness_matches_naive(spark):
    daily = collections.defaultdict(collections.Counter)
    for r in _t(spark, SF, "events").select("user_id", "ts").collect():
        daily[r["user_id"]][r["ts"].date()] += 1
    got = {r["user_id"]: r for r in q_user_burstiness(spark, SF).collect()}
    assert set(got) == set(daily)
    for u, ctr in daily.items():
        xs = list(ctr.values())
        d, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        want = round((d * q - s * s) / (d * s), 6)
        r = got[u]
        assert r["n_days"] == d
        assert r["n_events"] == s
        assert abs(r["fano"] - want) <= 5e-7
        assert r["fano"] >= -1e-9  # population variance is nonnegative


def test_user_burstiness_plan_two_level_agg_no_window(spark):
    p = _plan_of(q_user_burstiness(spark, SF))
    assert "Window" not in p
    assert "Join" not in p
    assert "partial" in p
