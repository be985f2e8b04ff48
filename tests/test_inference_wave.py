"""Semantics tests for the wave-51 inference entries: Bartlett's
variance test, Friedman's blocked rank test, Ljung-Box portmanteau,
Durbin-Watson, and McNemar's paired test.  The DuckDB value-hash gate
is scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_inference import (
    q_bartlett_test,
    q_durbin_watson,
    q_friedman_test,
    q_ljung_box,
    q_mcnemar_test,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _daily_counts(spark):
    rows = (
        Q._t(spark, SF, "events")
        .selectExpr("CAST(ts AS DATE) AS day")
        .collect()
    )
    cnt = collections.Counter(r["day"] for r in rows)
    return [cnt[d] for d in sorted(cnt)], sorted(cnt)


# ---------------------------------------------------------------------------
# bartlett_test
# ---------------------------------------------------------------------------


def test_bartlett_matches_local(spark):
    rows = (
        Q._t(spark, SF, "documents").select("source", "text").collect()
    )
    groups = collections.defaultdict(list)
    for r in rows:
        toks = [t for t in (r["text"] or "").split(" ") if t]
        groups[r["source"] or ""].append(len(toks))
    sum_ln = sum_sp = sum_inv = 0
    k = n = 0
    for xs in groups.values():
        n_g = len(xs)
        sx, sxx = sum(xs), sum(x * x for x in xs)
        if n_g < 2 or n_g * sxx - sx * sx <= 0:
            continue
        k += 1
        n += n_g
        s2 = (n_g * sxx - sx * sx) / n_g / (n_g - 1)
        sum_ln += math.floor((n_g - 1) * math.log(s2) * 1e6 + 0.5)
        sum_sp += math.floor((n_g * sxx - sx * sx) / n_g * 1e6 + 0.5)
        sum_inv += math.floor(1.0 / (n_g - 1) * 1e6 + 0.5)
    sp2 = sum_sp / 1e6 / (n - k)
    c = 1.0 + (sum_inv / 1e6 - 1.0 / (n - k)) / (3.0 * (k - 1))
    t_exp = _micro(((n - k) * math.log(sp2) - sum_ln / 1e6) / c)
    row = q_bartlett_test(spark, SF).collect()[0]
    assert row["k"] == k and row["n"] == n
    assert row["pooled_var"] == _micro(sp2)
    assert row["t_stat"] == t_exp
    assert row["t_stat"] >= 0.0


def test_bartlett_single_scan_partial_agg(spark):
    plan = _plan_of(q_bartlett_test(spark, SF))
    # one physical parquet scan (the Location: line appears once per scan)
    assert plan.count("documents.parquet") == 1
    assert "partial_count" in plan and "partial_sum" in plan


# ---------------------------------------------------------------------------
# friedman_test
# ---------------------------------------------------------------------------


def test_friedman_matches_local(spark):
    xs, days = _daily_counts(spark)
    d0 = days[0]
    blocks = collections.defaultdict(dict)
    for d, x in zip(days, xs):
        diff = (d - d0).days
        blocks[diff // 7][diff % 7] = x
    full = {b: v for b, v in blocks.items() if len(v) == 7}
    n = len(full)
    r2 = collections.Counter()
    a2 = 0
    for v in full.values():
        vals = sorted(v.values())
        for slot, x in v.items():
            c = sum(1 for y in vals if y < x)
            t = sum(1 for y in vals if y == x)
            s = 2 * c + t + 1
            r2[slot] += s
            a2 += s * s
    sd2 = sum((r2[j] - 8 * n) ** 2 for j in range(7))
    q_exp = _micro(6.0 * sd2 / (a2 - 448 * n))
    w_exp = _micro(sd2 / (a2 - 448.0 * n) / n)
    row = q_friedman_test(spark, SF).collect()[0]
    assert row["n_blocks"] == n
    assert row["q_stat"] == q_exp
    assert row["w_concord"] == w_exp
    # W = Q / (n (k-1)) up to the two quantizations
    assert abs(row["w_concord"] - row["q_stat"] / (6 * n)) < 2e-6


def test_friedman_drops_incomplete_blocks(spark):
    xs, days = _daily_counts(spark)
    n_days = len(days)
    row = q_friedman_test(spark, SF).collect()[0]
    assert row["n_blocks"] == n_days // 7 or row["n_blocks"] <= n_days // 7


# ---------------------------------------------------------------------------
# ljung_box
# ---------------------------------------------------------------------------


def test_ljung_box_matches_local(spark):
    xs, _ = _daily_counts(spark)
    n = len(xs)
    s = sum(xs)
    v = [n * x - s for x in xs]
    den = sum(z * z for z in v)
    rows = {r["lag"]: r for r in q_ljung_box(spark, SF).collect()}
    assert sorted(rows) == list(range(1, 8))
    q_cum = 0
    for lag in range(1, 8):
        num = sum(v[t] * v[t + lag] for t in range(n - lag))
        acf = round(num / den, 6)
        assert rows[lag]["n_pairs"] == n - lag
        assert rows[lag]["acf"] == acf
        q_cum += math.floor(n * (n + 2.0) / (n - lag) * acf * acf * 1e6
                            + 0.5)
        assert rows[lag]["q_lb"] == q_cum / 1e6
    # Q is monotone non-decreasing in the lag
    qs = [rows[lag]["q_lb"] for lag in range(1, 8)]
    assert qs == sorted(qs)


# ---------------------------------------------------------------------------
# durbin_watson
# ---------------------------------------------------------------------------


def test_durbin_watson_matches_local(spark):
    xs, _ = _daily_counts(spark)
    n = len(xs)
    ts = list(range(1, n + 1))
    st, sy = sum(ts), sum(xs)
    stt = sum(t * t for t in ts)
    sty = sum(t * y for t, y in zip(ts, xs))
    d = n * stt - st * st
    bnum = n * sty - st * sy
    e = [
        n * d * y - (sy * d - bnum * st) - n * bnum * t
        for t, y in zip(ts, xs)
    ]
    den = sum(z * z for z in e)
    num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    row = q_durbin_watson(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["slope"] == _micro(bnum / d)
    assert row["dw"] == _micro(num / den)
    assert 0.0 <= row["dw"] <= 4.0


def test_durbin_watson_exact_residuals_sum_zero(spark):
    # the scaled residuals of an exact OLS fit sum to zero — replay
    # the construction locally as the integer-exactness witness
    xs, _ = _daily_counts(spark)
    n = len(xs)
    ts = list(range(1, n + 1))
    st, sy = sum(ts), sum(xs)
    stt = sum(t * t for t in ts)
    sty = sum(t * y for t, y in zip(ts, xs))
    d = n * stt - st * st
    bnum = n * sty - st * sy
    e = [
        n * d * y - (sy * d - bnum * st) - n * bnum * t
        for t, y in zip(ts, xs)
    ]
    assert sum(e) == 0
    assert sum(z * t for z, t in zip(e, ts)) == 0


# ---------------------------------------------------------------------------
# mcnemar_test
# ---------------------------------------------------------------------------


def test_mcnemar_matches_local(spark):
    rows = (
        Q._t(spark, SF, "events")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day", "event_type")
        .collect()
    )
    days = sorted({r["day"] for r in rows})
    mid = days[0] + __import__("datetime").timedelta(
        days=(days[-1] - days[0]).days // 2
    )
    early, late, users = set(), set(), set()
    for r in rows:
        users.add(r["user_id"])
        if r["event_type"] == "purchase":
            (early if r["day"] <= mid else late).add(r["user_id"])
    b = len(early - late)
    c = len(late - early)
    row = q_mcnemar_test(spark, SF).collect()[0]
    assert row["n_users"] == len(users)
    assert row["n_both"] == len(early & late)
    assert row["n_neither"] == len(users - early - late)
    assert row["n_early_only"] == b
    assert row["n_late_only"] == c
    exp = 0.0 if b + c == 0 else _micro((abs(b - c) - 1.0) ** 2 / (b + c))
    assert row["chi_cc"] == exp


def test_mcnemar_single_user_shuffle(spark):
    plan = _plan_of(q_mcnemar_test(spark, SF))
    # events scanned once for bounds + once for flags, nothing more
    assert plan.count("events.parquet") <= 2
    # the per-user agg partial-aggregates map-side before its exchange
    assert "partial_max" in plan or "partial_count" in plan
