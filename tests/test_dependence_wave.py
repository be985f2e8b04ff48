"""Semantics tests for the wave-45 dependence entries: Chatterjee's
xi, Rand/ARI partition agreement, partial correlation, lead/lag
cross-correlation, and the Rayleigh circular-uniformity test.  The
DuckDB value-hash gate is scripts/check_queries.py; these pin each op
against an independent single-node recomputation plus plan/property
shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_dependence import (
    _CC_LAG,
    _RI_K,
    _RI_W,
    q_chatterjee_xi,
    q_crosscorr_leadlag,
    q_partial_correlation,
    q_rand_index,
    q_rayleigh_test,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# chatterjee_xi
# ---------------------------------------------------------------------------


def test_chatterjee_matches_local(spark):
    docs = _docs(spark)
    pts = sorted(
        (r["n_chars"], r["doc_id"], len(_tokens(r["text"]))) for r in docs
    )
    ys = [p[2] for p in pts]
    n = len(ys)
    yc = collections.Counter(ys)
    cum, r_of, l_of = 0, {}, {}
    for v in sorted(yc):
        l_of[v] = n - cum
        cum += yc[v]
        r_of[v] = cum
    rs = [r_of[y] for y in ys]
    s = sum(abs(rs[i + 1] - rs[i]) for i in range(n - 1))
    denom = sum(l_of[y] * (n - l_of[y]) for y in ys)
    xi = _micro(1.0 - n * s / (2.0 * denom))
    row = q_chatterjee_xi(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["sum_abs_dr"] == s
    assert row["denom"] == denom
    assert row["xi"] == xi


def test_chatterjee_detects_functional_dependence(spark):
    # token count is nearly a function of n_chars -> xi well above 0
    row = q_chatterjee_xi(spark, SF).collect()[0]
    assert row["xi"] > 0.5
    plan = _plan_of(q_chatterjee_xi(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# rand_index
# ---------------------------------------------------------------------------


def test_rand_index_matches_local(spark):
    cells = collections.Counter(
        (
            r["lang"] or "",
            min(r["n_chars"] // _RI_W, _RI_K - 1),
        )
        for r in _docs(spark)
    )
    n = sum(cells.values())
    p = sum(m * (m - 1) // 2 for m in cells.values())
    am = collections.Counter()
    bm = collections.Counter()
    for (u, v), m in cells.items():
        am[u] += m
        bm[v] += m
    a = sum(m * (m - 1) // 2 for m in am.values())
    b = sum(m * (m - 1) // 2 for m in bm.values())
    t = n * (n - 1) // 2
    rand = _micro((t + 2 * p - a - b) / t)
    exp = a * b / t
    ari = _micro((p - exp) / ((a + b) / 2 - exp))
    row = q_rand_index(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["n_cells"] == len(cells)
    assert row["rand"] == rand
    assert row["ari"] == ari


def test_rand_index_bounds_and_plan(spark):
    row = q_rand_index(spark, SF).collect()[0]
    assert 0.0 <= row["rand"] <= 1.0
    assert -1.0 <= row["ari"] <= 1.0
    plan = _plan_of(q_rand_index(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# partial_correlation
# ---------------------------------------------------------------------------


def test_partial_correlation_matches_local(spark):
    xs, ys, zs = [], [], []
    for r in _docs(spark):
        toks = _tokens(r["text"])
        xs.append(r["n_chars"])
        ys.append(len(toks))
        zs.append(len(set(toks)))
    n = len(xs)

    def corr(u, v):
        su, sv = sum(u), sum(v)
        suu = sum(a * a for a in u)
        svv = sum(a * a for a in v)
        suv = sum(a * b for a, b in zip(u, v))
        return (n * suv - su * sv) / math.sqrt(
            (n * suu - su * su) * (n * svv - sv * sv)
        )

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz * rxz) * (1 - ryz * ryz)
    )
    row = q_partial_correlation(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["r_xy"] == _micro(rxy)
    assert row["r_xz"] == _micro(rxz)
    assert row["r_yz"] == _micro(ryz)
    assert row["r_xy_given_z"] == _micro(part)


def test_partial_correlation_plan(spark):
    plan = _plan_of(q_partial_correlation(spark, SF))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# crosscorr_leadlag
# ---------------------------------------------------------------------------


def test_crosscorr_matches_local(spark):
    rows = (
        Q._t(spark, SF, "events")
        .select("ts", "event_type")
        .collect()
    )
    da = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "click"
    )
    db = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    import datetime

    got = {r["lag"]: r for r in q_crosscorr_leadlag(spark, SF).collect()}
    assert set(got) == set(range(-_CC_LAG, _CC_LAG + 1))
    for lag in range(-_CC_LAG, _CC_LAG + 1):
        pairs = [
            (da[d], db[d + datetime.timedelta(days=lag)])
            for d in da
            if d + datetime.timedelta(days=lag) in db
        ]
        n = len(pairs)
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        saa = sum(a * a for a, _ in pairs)
        sbb = sum(b * b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        va, vb = n * saa - sa * sa, n * sbb - sb * sb
        r = (
            0.0
            if n < 2 or va <= 0 or vb <= 0
            else _micro((n * sab - sa * sb) / math.sqrt(va * vb))
        )
        assert got[lag]["n_days"] == n
        assert got[lag]["r"] == r


def test_crosscorr_plan(spark):
    plan = _plan_of(q_crosscorr_leadlag(spark, SF))
    assert "Window" not in plan  # pure date-shift joins, no windows
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# rayleigh_test
# ---------------------------------------------------------------------------


def test_rayleigh_matches_local(spark):
    sods = [
        r["ts"].hour * 3600 + r["ts"].minute * 60 + r["ts"].second
        for r in Q._t(spark, SF, "events").select("ts").collect()
    ]
    n = len(sods)
    sc = sum(
        math.floor(math.cos(2 * math.pi * s / 86400.0) * 1e6 + 0.5)
        for s in sods
    )
    ss = sum(
        math.floor(math.sin(2 * math.pi * s / 86400.0) * 1e6 + 0.5)
        for s in sods
    )
    rbar = _micro(math.sqrt(sc * sc + ss * ss) / (n * 1e6))
    z = _micro((sc * sc + ss * ss) / (n * 1e12))
    ang = math.atan2(ss, sc)
    if ang < 0:
        ang += 2 * math.pi
    mh = _micro(ang / (2 * math.pi) * 24)
    row = q_rayleigh_test(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["rbar"] == rbar
    assert row["rayleigh_z"] == z
    assert row["mean_hour"] == mh


def test_rayleigh_bounds_and_plan(spark):
    row = q_rayleigh_test(spark, SF).collect()[0]
    assert 0.0 <= row["rbar"] <= 1.0
    assert 0.0 <= row["mean_hour"] < 24.0
    plan = _plan_of(q_rayleigh_test(spark, SF))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave45_registered():
    for name in (
        "chatterjee_xi",
        "rand_index",
        "partial_correlation",
        "crosscorr_leadlag",
        "rayleigh_test",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
