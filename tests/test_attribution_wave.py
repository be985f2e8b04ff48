"""Semantics tests for the wave-91 attribution entries: Shapley,
removal bounds, positional models, time decay, model divergence.  The
DuckDB value-hash gate is scripts/check_queries.py; these replay the
attribution algebra in pure Python and pin the theory (Shapley
efficiency-ish sanity, bounds bracket, credits conserve per user,
divergence symmetry)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_attribution import (
    _CHANNELS,
    _TD_CAP,
    _TD_HALFLIFE,
    q_attribution_model_divergence,
    q_position_attribution_compare,
    q_removal_effect_bounds,
    q_shapley_attribution,
    q_time_decay_attribution,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _events():
    return duckdb.sql(
        f"SELECT user_id, event_type, ts FROM '{SF}/events.parquet'"
    ).fetchall()


def _touches():
    ev = _events()
    conv = {}
    for u, t, ts in ev:
        if t == "purchase" and (u not in conv or ts < conv[u]):
            conv[u] = ts
    per = defaultdict(list)
    for u, t, ts in ev:
        if t != "purchase" and u in conv and ts < conv[u]:
            per[int(u)].append((ts, t, conv[u]))
    for u in per:
        per[u].sort(key=lambda x: (x[0], x[1]))
    return per


def test_shapley_matches_local(spark):
    ev = _events()
    mask_of = {c: 1 << i for i, c in enumerate(_CHANNELS)}
    per_user = defaultdict(lambda: [0, 0])
    for u, t, _ts in ev:
        e = per_user[int(u)]
        if t == "purchase":
            e[1] = 1
        else:
            e[0] |= mask_of[t]
    subs = defaultdict(lambda: [0, 0])
    for mask, conv in per_user.values():
        subs[mask][0] += 1
        subs[mask][1] += conv
    wnum = {0: 6, 1: 2, 2: 2, 3: 6}
    got = {r["channel"]: r["shapley_micro"] for r in q_shapley_attribution(spark, SF).collect()}
    for c, b in mask_of.items():
        tot = 0
        for s in range(16):
            if s & b:
                continue
            nw, cw = subs.get(s | b, [0, 0])
            no, co = subs.get(s, [0, 0])
            w = wnum[bin(s).count("1")]
            if nw > 0 and no > 0:
                num = cw * no - co * nw
                den = 24 * nw * no
                t_ = (
                    _halfup(1_000_000 * w * num, den)
                    if num >= 0
                    else -_halfup(1_000_000 * w * -num, den)
                )
            elif nw > 0:
                t_ = _halfup(1_000_000 * w * cw, 24 * nw)
            elif no > 0:
                t_ = -_halfup(1_000_000 * w * co, 24 * no)
            else:
                t_ = 0
            tot += t_
        assert got[c] == tot


def test_removal_bounds_bracket(spark):
    per = _touches()
    n_conv = len(per)
    got = {r["channel"]: r for r in q_removal_effect_bounds(spark, SF).collect()}
    assert set(got) == set(_CHANNELS)
    for c, r in got.items():
        with_c = sum(1 for u, ts in per.items() if any(t == c for _a, t, _b in ts))
        only_c = sum(
            1
            for u, ts in per.items()
            if {t for _a, t, _b in ts} == {c}
        )
        assert r["conv_with"] == with_c
        assert r["conv_only"] == only_c
        assert r["n_conv"] == n_conv
        assert r["lower_bound_micro"] <= r["upper_bound_micro"]
        assert r["upper_bound_micro"] == _halfup(1_000_000 * with_c, n_conv)


def test_positional_credits_conserve(spark):
    per = _touches()
    got = {r["channel"]: r for r in q_position_attribution_compare(spark, SF).collect()}
    firsts = defaultdict(int)
    lasts = defaultdict(int)
    linear = defaultdict(int)
    for u, ts in per.items():
        firsts[ts[0][1]] += 1
        lasts[ts[-1][1]] += 1
        for _a, t, _b in ts:
            linear[t] += _halfup(1_000_000, len(ts))
    for c, r in got.items():
        assert r["first_touch"] == firsts.get(c, 0)
        assert r["last_touch"] == lasts.get(c, 0)
        assert r["linear_credit_micro"] == linear.get(c, 0)
    # each model distributes ~1 credit per converting user
    n = len(per)
    assert sum(r["first_touch"] for r in got.values()) == n
    assert sum(r["last_touch"] for r in got.values()) == n
    tot_lin = sum(r["linear_credit_micro"] for r in got.values())
    assert abs(tot_lin - n * 1_000_000) <= sum(len(t) for t in per.values())


def test_decay_credits_match_local(spark):
    per = _touches()
    credit = defaultdict(lambda: [0, 0])
    for u, ts in per.items():
        ws = []
        for a, t, conv_ts in ts:
            days = (conv_ts.date() - a.date()).days
            k = min(days // _TD_HALFLIFE, _TD_CAP)
            ws.append((t, 1_000_000 // (2**k)))
        wtot = sum(w for _t, w in ws)
        if wtot <= 0:
            continue
        for t, w in ws:
            credit[t][0] += 1
            credit[t][1] += _halfup(1_000_000 * w, wtot)
    got = {r["channel"]: r for r in q_time_decay_attribution(spark, SF).collect()}
    for c, r in got.items():
        assert r["touches"] == credit[c][0]
        assert r["decay_credit_micro"] == credit[c][1]


def test_divergence_rows(spark):
    rows = {r["pair"]: r["l1_micro"] for r in q_attribution_model_divergence(spark, SF).collect()}
    assert len(rows) == 6
    for v in rows.values():
        assert 0 <= v <= 2_000_000  # L1 of two prob vectors <= 2


def test_registered_in_catalog():
    for name in (
        "shapley_attribution",
        "removal_effect_bounds",
        "position_attribution_compare",
        "time_decay_attribution",
        "attribution_model_divergence",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
