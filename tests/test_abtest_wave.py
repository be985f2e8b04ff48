"""Semantics tests for the wave-55 A/B-experimentation & ranking-eval
entries: difference-in-differences, SRM χ² guardrail, Cohen's d /
Hedges' g, Wald SPRT conversion monitor, and the MAP@K harness for
the pure-tf ranker.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math
from fractions import Fraction

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_abtest import (
    _AP_K,
    _AP_L,
    _AP_Q,
    _AP_REL_LANG,
    _AP_REL_TF,
    _SPRT_LA,
    _SPRT_LB,
    _SPRT_LOWER,
    _SPRT_UPPER,
    _SRM_CRIT_MICRO,
    _SRM_K,
    q_avg_precision_eval,
    q_cohens_d,
    q_diff_in_diff,
    q_sprt_conversion,
    q_srm_check,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _h16(u, salt: str) -> int:
    return int(hashlib.md5(f"{u}:{salt}".encode()).hexdigest()[:4], 16)


def _events(spark):
    rows = (
        Q._t(spark, SF, "events")
        .selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS tus",
            "CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS v",
            "event_type",
            "CAST(ts AS DATE) AS day",
        )
        .collect()
    )
    return rows


# ---------------------------------------------------------------------------
# diff_in_diff
# ---------------------------------------------------------------------------


def _did_local(rows):
    t0 = min(r["tus"] for r in rows)
    t1 = max(r["tus"] for r in rows)
    per = collections.defaultdict(int)
    for r in rows:
        per[(r["user_id"], r["tus"] * 2 <= t0 + t1)] += r["v"]
    cells = collections.defaultdict(lambda: [0, 0])
    for (u, pre), s in per.items():
        c = cells[(_h16(u, "did") % 2, pre)]
        c[0] += 1
        c[1] += s
    means = {}
    for k, (n, s) in cells.items():
        means[k] = (n, (2 * s + n) // (2 * n))
    return means


def test_diff_in_diff_matches_local(spark):
    means = _did_local(_events(spark))
    row = q_diff_in_diff(spark, SF).collect()[0]
    assert row["n_t_pre"] == means[(1, True)][0]
    assert row["n_c_post"] == means[(0, False)][0]
    assert row["t_pre_mean_micro"] == means[(1, True)][1]
    assert row["t_post_mean_micro"] == means[(1, False)][1]
    assert row["c_pre_mean_micro"] == means[(0, True)][1]
    assert row["c_post_mean_micro"] == means[(0, False)][1]
    did = (means[(1, False)][1] - means[(1, True)][1]) - (
        means[(0, False)][1] - means[(0, True)][1]
    )
    assert row["did_micro"] == did


def test_diff_in_diff_single_row_and_broadcast_span(spark):
    df = q_diff_in_diff(spark, SF)
    assert df.count() == 1
    plan = _plan_of(df)
    assert "BroadcastExchange" in plan  # the 1-row span joins broadcast
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# srm_check
# ---------------------------------------------------------------------------


def _srm_local(rows):
    users = {r["user_id"] for r in rows}
    counts = [0] * _SRM_K
    for u in users:
        counts[_h16(u, "srm") % _SRM_K] += 1
    n = len(users)
    num = sum((_SRM_K * o - n) ** 2 for o in counts)
    chi2 = (2_000_000 * num + _SRM_K * n) // (2 * _SRM_K * n)
    return n, counts, chi2


def test_srm_check_matches_local(spark):
    n, counts, chi2 = _srm_local(_events(spark))
    row = q_srm_check(spark, SF).collect()[0]
    assert row["n_total"] == n
    assert [row[f"n_v{k}"] for k in range(_SRM_K)] == counts
    assert row["chi2_micro"] == chi2
    assert row["srm_detected"] == (chi2 > _SRM_CRIT_MICRO)


def test_srm_counts_partition_users(spark):
    row = q_srm_check(spark, SF).collect()[0]
    assert sum(row[f"n_v{k}"] for k in range(_SRM_K)) == row["n_total"]
    assert row["chi2_micro"] >= 0


def test_srm_check_single_scan(spark):
    plan = _plan_of(q_srm_check(spark, SF))
    assert plan.count("events.parquet") == 1


# ---------------------------------------------------------------------------
# cohens_d
# ---------------------------------------------------------------------------


def _micro6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_cohens_d_matches_local(spark):
    per = collections.defaultdict(int)
    for r in _events(spark):
        per[r["user_id"]] += r["v"]
    groups = {0: [], 1: []}
    for u, s in per.items():
        groups[_h16(u, "cd") % 2].append(s)
    n_c, n_t = len(groups[0]), len(groups[1])
    mean_c = sum(groups[0]) / n_c
    mean_t = sum(groups[1]) / n_t
    css_c = sum(float(x) * x for x in groups[0]) - float(
        sum(groups[0])
    ) * sum(groups[0]) / n_c
    css_t = sum(float(x) * x for x in groups[1]) - float(
        sum(groups[1])
    ) * sum(groups[1]) / n_t
    sp = math.sqrt((css_c + css_t) / (n_c + n_t - 2))
    d = (mean_t - mean_c) / sp
    j = 1.0 - 3.0 / (4.0 * (n_c + n_t - 2) - 1)
    row = q_cohens_d(spark, SF).collect()[0]
    assert row["n_c"] == n_c and row["n_t"] == n_t
    assert abs(row["d"] - d) < 1e-5
    assert abs(row["g"] - j * d) < 1e-5
    # the small-sample correction always shrinks |d|
    assert abs(row["g"]) < abs(row["d"])


def test_cohens_d_one_moment_scan(spark):
    plan = _plan_of(q_cohens_d(spark, SF))
    assert plan.count("events.parquet") == 1
    assert "partial_sum" in plan or "partial_count" in plan


# ---------------------------------------------------------------------------
# sprt_conversion
# ---------------------------------------------------------------------------


def _sprt_local(rows):
    daily = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        if r["event_type"] in ("view", "purchase"):
            d = daily[r["day"]]
            d[0] += 1
            d[1] += r["event_type"] == "purchase"
    out, n_cum, c_cum = [], 0, 0
    for day in sorted(daily):
        n_cum += daily[day][0]
        c_cum += daily[day][1]
        llr = c_cum * _SPRT_LA + (n_cum - c_cum) * _SPRT_LB
        dec = (
            "accept_h1"
            if llr >= _SPRT_UPPER
            else ("accept_h0" if llr <= _SPRT_LOWER else "continue")
        )
        out.append((day, n_cum, c_cum, llr, dec))
    return out


def test_sprt_conversion_matches_local(spark):
    exp = _sprt_local(_events(spark))
    got = [
        (r["day"], r["n_cum"], r["c_cum"], r["llr_nano"], r["decision"])
        for r in q_sprt_conversion(spark, SF).orderBy("day").collect()
    ]
    assert got == exp


def test_sprt_reaches_a_decision_on_fixture(spark):
    # the fixture's purchase share (~0.5) sits at H1: the monitor must
    # eventually cross the upper boundary and stay there
    rows = q_sprt_conversion(spark, SF).orderBy("day").collect()
    assert rows[-1]["decision"] == "accept_h1"
    # cumulative counts are monotone
    ns = [r["n_cum"] for r in rows]
    assert ns == sorted(ns)


def test_sprt_windows_only_the_day_frame(spark):
    plan = _plan_of(q_sprt_conversion(spark, SF))
    # the global-order window runs AFTER the groupBy collapse
    assert plan.count("events.parquet") == 1
    assert "Window" in plan


# ---------------------------------------------------------------------------
# avg_precision_eval
# ---------------------------------------------------------------------------


def _ap_local(spark):
    docs = Q._t(spark, SF, "documents").select("doc_id", "text", "lang").collect()
    postings = collections.defaultdict(dict)  # tok -> doc -> tf
    lang = {}
    for r in docs:
        lang[r["doc_id"]] = r["lang"]
        for w in (r["text"] or "").split(" "):
            if w:
                postings[w][r["doc_id"]] = postings[w].get(r["doc_id"], 0) + 1
    qterms = sorted(postings, key=lambda t: (-len(postings[t]), t))[:_AP_Q]
    out = {}
    for t in qterms:
        docs_t = [
            (d, tf, int(tf >= _AP_REL_TF and lang[d] == _AP_REL_LANG))
            for d, tf in postings[t].items()
        ]
        docs_t.sort(key=lambda x: (-x[1], x[0]))
        n_rel = sum(r for _, _, r in docs_t)
        crel, ap_num = 0, Fraction(0)
        n_ret_rel = 0
        for rnk, (_, _, rel) in enumerate(docs_t[:_AP_K], start=1):
            crel += rel
            if rel:
                ap_num += Fraction(crel, rnk)
                n_ret_rel += 1
        if n_rel == 0:
            out[t] = (0, 0, None)
        else:
            ap = ap_num / min(n_rel, _AP_K)
            # exact half-up on the rational AP — the same arithmetic
            # the engines do through the L-scaled integers
            ap_micro = (2_000_000 * ap.numerator + ap.denominator) // (
                2 * ap.denominator
            )
            out[t] = (n_rel, n_ret_rel, ap_micro)
    return out


def test_avg_precision_matches_local(spark):
    exp = _ap_local(spark)
    rows = q_avg_precision_eval(spark, SF).collect()
    assert len(rows) == _AP_Q
    for r in rows:
        n_rel, n_ret_rel, ap_micro = exp[r["tok"]]
        assert r["n_rel"] == n_rel
        assert r["n_ret_rel"] == n_ret_rel
        assert r["ap_micro"] == ap_micro


def test_avg_precision_exact_scaling_identity():
    # L = lcm(1..K) makes every per-rank precision weight integral
    for r in range(1, _AP_K + 1):
        assert _AP_L % r == 0


def test_avg_precision_bounds_and_perfect_prefix(spark):
    for r in q_avg_precision_eval(spark, SF).collect():
        if r["ap_micro"] is not None:
            assert 0 <= r["ap_micro"] <= 1_000_000
            # AP = 1 iff every retrieved-relevant doc forms a perfect prefix
            if r["ap_micro"] == 1_000_000:
                assert r["n_ret_rel"] == min(r["n_rel"], _AP_K)


def test_avg_precision_broadcasts_query_terms(spark):
    plan = _plan_of(q_avg_precision_eval(spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_abtest_registration():
    for name in (
        "diff_in_diff",
        "srm_check",
        "cohens_d",
        "sprt_conversion",
        "avg_precision_eval",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
