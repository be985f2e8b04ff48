"""Semantics tests for the wave-42 robust-statistics entries:
Kruskal-Wallis rank ANOVA, Brown-Forsythe variance homogeneity,
Cochran-Armitage trend-in-proportions, Gumbel weekly block maxima,
and the R/S Hurst exponent.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_robust import (
    _CA_K,
    _CA_W,
    _RS_LARGE,
    _RS_SMALL,
    q_brown_forsythe,
    q_cochran_armitage,
    q_gumbel_maxima,
    q_hurst_rs,
    q_kruskal_wallis,
)

SF = "/root/testdata/sf0.001"

EULER_GAMMA = 0.5772156649015329


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "source", "lang", "n_chars")
        .collect()
    )


def _daily(spark):
    c = collections.Counter(
        r["ts"].date()
        for r in Q._t(spark, SF, "events").select("ts").collect()
    )
    return dict(sorted(c.items()))


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# kruskal_wallis
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_local(spark):
    docs = _docs(spark)
    vals = [r["n_chars"] for r in docs]
    cnt = collections.Counter(vals)
    c, rank2 = 0, {}
    for v in sorted(cnt):
        rank2[v] = 2 * c + cnt[v] + 1
        c += cnt[v]
    n = len(vals)
    groups = collections.defaultdict(list)
    for r in docs:
        groups[r["source"] or ""].append(r["n_chars"])
    sum_h = 0
    for vs in groups.values():
        r2 = sum(rank2[v] for v in vs)
        sum_h += math.floor(
            3.0 * r2 * r2 / len(vs) / float(n) / (n + 1) * 1e6 + 0.5
        )
    ties3 = sum(t * t * t - t for t in cnt.values())
    k = len(groups)
    h = _micro(
        (sum_h / 1e6 - 3.0 * (n + 1))
        / (1.0 - ties3 / (float(n) * n * n - n))
    )
    eps = _micro((h - k + 1) / (n - k))
    row = q_kruskal_wallis(spark, SF).collect()[0]
    assert row["n_groups"] == k
    assert row["n"] == n
    assert row["h"] == h
    assert row["epsilon_sq"] == eps


def test_kruskal_wallis_plan(spark):
    plan = _plan_of(q_kruskal_wallis(spark, SF))
    assert "BroadcastExchange" in plan  # the 1-row totals cross join
    assert "Window" in plan  # cumulative rank over the value histogram
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# brown_forsythe
# ---------------------------------------------------------------------------


def test_brown_forsythe_matches_local(spark):
    docs = _docs(spark)
    groups = collections.defaultdict(list)
    for r in docs:
        groups[r["source"] or ""].append(r["n_chars"])
    per = {}
    for g, vs in groups.items():
        vs.sort()
        med = vs[(len(vs) + 1) // 2 - 1]  # lower median
        z = [abs(v - med) for v in vs]
        per[g] = (len(z), sum(z), sum(x * x for x in z))
    n = sum(p[0] for p in per.values())
    zall = sum(p[1] for p in per.values())
    num = den = 0
    for n_g, z1, z2 in per.values():
        d = z1 - n_g * zall / n
        num += math.floor(d * d / n_g * 1e6 + 0.5)
        den += math.floor((z2 - z1 * z1 / n_g) * 1e6 + 0.5)
    k = len(per)
    f = (
        0.0
        if den <= 0
        else _micro(float(n - k) / (k - 1) * num / den)
    )
    row = q_brown_forsythe(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["k_groups"] == k
    assert row["f_stat"] == f


def test_brown_forsythe_plan(spark):
    row = q_brown_forsythe(spark, SF).collect()[0]
    assert row["f_stat"] >= 0.0
    plan = _plan_of(q_brown_forsythe(spark, SF))
    assert "Window" in plan  # per-source median over the histogram
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# cochran_armitage
# ---------------------------------------------------------------------------


def test_cochran_armitage_matches_local(spark):
    docs = _docs(spark)
    buckets = collections.defaultdict(lambda: [0, 0])
    for r in docs:
        s = min(r["n_chars"] // _CA_W, _CA_K - 1)
        buckets[s][0] += 1
        buckets[s][1] += 1 if r["lang"] == "en" else 0
    n = sum(b[0] for b in buckets.values())
    e = sum(b[1] for b in buckets.values())
    sse = sum(s * b[1] for s, b in buckets.items())
    ssn = sum(s * b[0] for s, b in buckets.items())
    ss2n = sum(s * s * b[0] for s, b in buckets.items())
    t_scaled = n * sse - e * ssn
    if e == 0 or e == n or n * ss2n - ssn * ssn <= 0:
        z = 0.0
    else:
        z = _micro(
            t_scaled
            * math.sqrt(n)
            / math.sqrt(e * (n - e) * (float(n) * ss2n - float(ssn) * ssn))
        )
    row = q_cochran_armitage(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["n_en"] == e
    assert row["n_buckets"] == len(buckets)
    assert row["t_scaled"] == t_scaled
    assert row["z"] == z


def test_cochran_armitage_plan(spark):
    plan = _plan_of(q_cochran_armitage(spark, SF))
    assert plan.count("HashAggregate") >= 2  # bucket + final partial aggs
    assert "Join" not in plan
    assert "Window" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# gumbel_maxima
# ---------------------------------------------------------------------------


def test_gumbel_maxima_matches_local(spark):
    daily = _daily(spark)
    import datetime

    anchor = datetime.date(1970, 1, 5)
    weekly = {}
    for d, y in daily.items():
        wk = (d - anchor).days // 7
        weekly[wk] = max(weekly.get(wk, 0), y)
    mx = list(weekly.values())
    w = len(mx)
    s1, s2 = sum(mx), sum(v * v for v in mx)
    m_raw = s1 / w
    b_raw = (
        0.0
        if w < 2
        else math.sqrt((w * s2 - s1 * s1) / (float(w) * (w - 1)))
        * math.sqrt(6.0)
        / math.pi
    )
    mu = _micro(m_raw - EULER_GAMMA * b_raw)
    beta = _micro(b_raw)
    rl4 = _micro(
        m_raw - EULER_GAMMA * b_raw - b_raw * math.log(-math.log(0.75))
    )
    row = q_gumbel_maxima(spark, SF).collect()[0]
    assert row["n_weeks"] == w
    assert row["max_weekly"] == max(mx)
    assert row["mu"] == mu
    assert row["beta"] == beta
    assert row["return_level_4"] == rl4


def test_gumbel_maxima_ordering_and_plan(spark):
    row = q_gumbel_maxima(spark, SF).collect()[0]
    # the 4-block return level sits above the location parameter
    assert row["return_level_4"] >= row["mu"]
    assert row["beta"] >= 0.0
    plan = _plan_of(q_gumbel_maxima(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# hurst_rs
# ---------------------------------------------------------------------------


def _rs_blocks(ys, size):
    out = []
    for b0 in range(0, len(ys) - size + 1, size):
        blk = ys[b0 : b0 + size]
        stot = sum(blk)
        s2tot = sum(v * v for v in blk)
        varn = size * s2tot - stot * stot
        if varn <= 0:
            continue
        p = 0
        devs = []
        for t, y in enumerate(blk, start=1):
            p += y
            devs.append(size * p - t * stot)
        rs = (max(devs) - min(devs)) / math.sqrt(varn)
        out.append(math.floor(rs * 1e6 + 0.5))
    return out


def test_hurst_rs_matches_local(spark):
    ys = list(_daily(spark).values())
    small = _rs_blocks(ys, _RS_SMALL)
    large = _rs_blocks(ys, _RS_LARGE)
    rs_small_u = (2 * sum(small) + len(small)) // (2 * len(small))
    rs_large_u = (2 * sum(large) + len(large)) // (2 * len(large))
    hurst = _micro(
        (math.log(rs_large_u / 1e6) - math.log(rs_small_u / 1e6))
        / math.log(2.0)
    )
    row = q_hurst_rs(spark, SF).collect()[0]
    assert row["n_blocks_small"] == len(small)
    assert row["n_blocks_large"] == len(large)
    assert row["rs_small"] == rs_small_u / 1e6
    assert row["rs_large"] == rs_large_u / 1e6
    assert row["hurst"] == hurst


def test_hurst_rs_shape_and_plan(spark):
    row = q_hurst_rs(spark, SF).collect()[0]
    # R/S grows with block size; 30 daily points give 6 and 3 blocks
    assert row["rs_large"] > row["rs_small"] > 0.0
    assert row["n_blocks_small"] >= row["n_blocks_large"]
    plan = _plan_of(q_hurst_rs(spark, SF))
    assert "Window" in plan  # day index + bounded block windows
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave42_registered():
    for name in (
        "kruskal_wallis",
        "brown_forsythe",
        "cochran_armitage",
        "gumbel_maxima",
        "hurst_rs",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
