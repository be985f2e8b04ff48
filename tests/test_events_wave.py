"""Semantics tests for the wave-17 event-stream entries:
autocorr_daily (daily-count sample autocorrelation) and
attribution_last_touch (conversion attribution).  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op
against an independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_analytics import (
    _ATTR_TOUCHES,
    _ATTR_WINDOW_US,
    q_attribution_last_touch,
)
from occular_ocr_spark.queries_drift import _ACF_MAX_LAG, q_autocorr_daily

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# autocorr_daily
# ---------------------------------------------------------------------------


def test_autocorr_daily_matches_naive(spark):
    days = collections.Counter()
    for r in _t(spark, SF, "events").select("ts").collect():
        days[r["ts"].date()] += 1
    n = len(days)
    s = sum(days.values())
    dev = {d: n * x - s for d, x in days.items()}
    den = sum(v * v for v in dev.values())
    got = {r["lag"]: r for r in q_autocorr_daily(spark, SF).collect()}
    assert set(got) == set(range(1, _ACF_MAX_LAG + 1))
    import datetime

    for k in range(1, _ACF_MAX_LAG + 1):
        pairs = [
            (dev[d], dev[d + datetime.timedelta(days=k)])
            for d in dev
            if d + datetime.timedelta(days=k) in dev
        ]
        num = sum(a * b for a, b in pairs)
        assert got[k]["n_pairs"] == len(pairs)
        assert abs(got[k]["acf"] - round(num / den, 6)) <= 5e-7
        assert -1.0 <= got[k]["acf"] <= 1.0
    Q.release_persists()


def test_autocorr_daily_plan_single_event_scan(spark):
    p = _plan_of(q_autocorr_daily(spark, SF))
    # raw events are scanned once; everything after runs on the
    # per-day aggregate (persist-tracked, shows as InMemory relation)
    assert p.count("events.parquet") <= 1
    assert "CartesianProduct" not in p
    Q.release_persists()


# ---------------------------------------------------------------------------
# attribution_last_touch
# ---------------------------------------------------------------------------


def test_attribution_last_touch_matches_naive(spark):
    rows = (
        _t(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in rows:
        if r["event_type"] in _ATTR_TOUCHES or r["event_type"] == "purchase":
            by_user[r["user_id"]].append(r)
    agg = collections.defaultdict(lambda: [0, 0])
    for evs in by_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        touch_type, touch_us = None, None
        for r in evs:
            us = int(r["ts"].timestamp() * 1_000_000)
            if r["event_type"] in _ATTR_TOUCHES:
                touch_type, touch_us = r["event_type"], us
            else:  # purchase
                key = (
                    touch_type
                    if touch_us is not None
                    and us - touch_us <= _ATTR_WINDOW_US
                    else "none"
                )
                agg[key][0] += 1
                agg[key][1] += int(r["value"] * 100 + 0.5)
    got = {r["touch_type"]: r for r in q_attribution_last_touch(spark, SF).collect()}
    assert set(got) == set(agg)
    n_tot = sum(v[0] for v in agg.values())
    for k, (n, cents) in agg.items():
        assert got[k]["n_conversions"] == n
        assert got[k]["value_cents"] == cents
        assert abs(got[k]["share"] - n / n_tot) <= 1e-6
    assert abs(sum(r["share"] for r in got.values()) - 1.0) <= 2e-6


def test_attribution_plan_one_user_shuffle(spark):
    p = _plan_of(q_attribution_last_touch(spark, SF))
    # the only row-scaled exchange is the user_id hash partitioning
    assert "hashpartitioning(user_id" in p
    assert "CartesianProduct" not in p
    # pushdown: only the 3 funnel event types leave the scan
    assert "event_type" in p.split("PushedFilters", 1)[1].splitlines()[0]
