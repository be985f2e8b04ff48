"""Semantics tests for the wave-101 rate-limit entries: token bucket,
policy sweep, burst windows, quota billing, Jain fairness.  The
DuckDB value-hash gate is scripts/check_queries.py; these replay the
bucket state machine in pure Python and pin the theory (monotone
policy sweep, admitted+rejected partition, Jain ∈ [1/n, 1])."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_ratelimit import (
    _QUOTA,
    _RL_CAP,
    _RL_GRID,
    _RL_RATE_H,
    _US_PER_HOUR,
    q_burst_profile,
    q_fair_share_report,
    q_quota_ledger_month,
    q_rate_policy_sweep,
    q_token_bucket_sim,
)

SF = "/root/testdata/sf0.001"


def _events():
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) FROM '{SF}/events.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for u, t in rows:
        per[int(u)].append(int(t))
    for u in per:
        per[u].sort()
    return per


def _bucket(ts, rate, cap):
    tok = cap * 1_000_000 - 1_000_000
    last = ts[0]
    rejects = 0
    for t in ts[1:]:
        tok = min(
            cap * 1_000_000,
            tok + ((t - last) * rate * 1_000_000) // _US_PER_HOUR,
        )
        if tok >= 1_000_000:
            tok -= 1_000_000
        else:
            rejects += 1
        last = t
    return rejects


def test_bucket_replay(spark):
    per = _events()
    got = {r["user_id"]: r for r in q_token_bucket_sim(spark, SF).collect()}
    assert set(got) == set(per)
    for u, ts in per.items():
        want = _bucket(ts, _RL_RATE_H, _RL_CAP)
        r = got[u]
        assert r["n_events"] == len(ts)
        assert r["n_rejected"] == want
        assert r["n_admitted"] == len(ts) - want


def test_sweep_monotone(spark):
    per = _events()
    got = {(r["rate_per_hour"], r["cap_tokens"]): r for r in q_rate_policy_sweep(spark, SF).collect()}
    assert set(got) == set(_RL_GRID)
    for (rate, cap), r in got.items():
        want = sum(_bucket(ts, rate, cap) for ts in per.values())
        assert r["total_rejected"] == want
    # a strictly more generous policy never rejects more
    assert got[(1, 2)]["total_rejected"] <= got[(1, 1)]["total_rejected"]
    assert got[(2, 2)]["total_rejected"] <= got[(1, 2)]["total_rejected"]
    assert got[(4, 4)]["total_rejected"] <= got[(2, 2)]["total_rejected"]


def test_burst_profile_replay(spark):
    per = _events()
    got = {r["user_id"]: r for r in q_burst_profile(spark, SF).collect()}
    for u, ts in per.items():
        best = 0
        for i, t in enumerate(ts):
            lo = t - 3_599_999_999
            best = max(best, sum(1 for x in ts[: i + 1] if x >= lo))
        r = got[u]
        assert r["max_burst_hour"] == best
        assert r["active_hours"] == len({t // _US_PER_HOUR for t in ts})


def test_quota_billing(spark):
    rows = q_quota_ledger_month(spark, SF).collect()
    for r in rows:
        assert r["included_units"] == min(r["n_events"], _QUOTA)
        assert r["overage_units"] == max(r["n_events"] - _QUOTA, 0)
        assert (
            r["billed_units"]
            == r["included_units"] + 2 * r["overage_units"]
        )


def test_jain_bounds(spark):
    per = _events()
    xs = [len(v) for v in per.values()]
    n = len(xs)
    r = q_fair_share_report(spark, SF).collect()[0]
    assert r["n_users"] == n
    assert r["total_events"] == sum(xs)
    want = (2_000_000 * sum(xs) * sum(xs) + n * sum(x * x for x in xs)) // (
        2 * n * sum(x * x for x in xs)
    )
    assert r["jain_index_micro"] == want
    assert 1_000_000 // n <= r["jain_index_micro"] <= 1_000_000


def test_registered_in_catalog():
    for name in (
        "token_bucket_sim",
        "rate_policy_sweep",
        "burst_profile",
        "quota_ledger_month",
        "fair_share_report",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
