"""Semantics tests for the wave-54 distribution-fit & sketch-audit
entries: Jarque-Bera normality, Dickey-Fuller unit root, SAX
symbolization, local-DP randomized response, and the AMS F2 sketch.
The DuckDB value-hash gate is scripts/check_queries.py; these pin
each op against an independent single-node recomputation plus plan /
property shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_distfit import (
    _F2_R,
    _SAX_W,
    q_dickey_fuller,
    q_f2_ams_sketch,
    q_jarque_bera,
    q_randomized_response,
    q_sax_symbols,
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
    return [cnt[d] for d in sorted(cnt)]


# ---------------------------------------------------------------------------
# jarque_bera
# ---------------------------------------------------------------------------


def test_jarque_bera_matches_local(spark):
    xs = _daily_counts(spark)
    n = len(xs)
    s1 = sum(xs)
    s2 = sum(x * x for x in xs)
    s3 = sum(x**3 for x in xs)
    s4 = sum(x**4 for x in xs)
    m2 = float(n * s2 - s1 * s1)
    m3 = float(n * n * s3 - 3 * n * s2 * s1 + 2 * s1**3)
    m4 = float(n**3 * s4 - 4 * n * n * s3 * s1 + 6 * n * s2 * s1 * s1 - 3 * s1**4)
    g1 = m3 / (m2 * math.sqrt(m2))
    g2 = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    row = q_jarque_bera(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["skewness"] == round(g1, 6)
    assert row["kurtosis_excess"] == round(g2, 6)
    assert row["jb_stat"] == round(jb, 6)
    assert row["jb_stat"] >= 0.0


def test_jarque_bera_single_scan(spark):
    plan = _plan_of(q_jarque_bera(spark, SF))
    assert plan.count("events.parquet") == 1
    assert "partial_count" in plan or "partial_sum" in plan


# ---------------------------------------------------------------------------
# dickey_fuller
# ---------------------------------------------------------------------------


def test_dickey_fuller_matches_local(spark):
    xs = _daily_counts(spark)
    pairs = [(xs[i - 1], xs[i] - xs[i - 1]) for i in range(1, len(xs))]
    n = len(pairs)
    sx = sum(p[0] for p in pairs)
    sy = sum(p[1] for p in pairs)
    sxx = sum(p[0] * p[0] for p in pairs)
    sxy = sum(p[0] * p[1] for p in pairs)
    syy = sum(p[1] * p[1] for p in pairs)
    dxx = float(n * sxx - sx * sx)
    dxy = float(n * sxy - sx * sy)
    dyy = float(n * syy - sy * sy)
    gamma = dxy / dxx
    s2 = (dyy - gamma * dxy) / n / (n - 2)
    t = gamma / math.sqrt(s2 * n / dxx)
    row = q_dickey_fuller(spark, SF).collect()[0]
    assert row["n_obs"] == n
    assert row["gamma"] == _micro(gamma)
    assert row["t_stat"] == _micro(t)
    assert row["unit_root_rejected"] == (t < -2.86)


def test_dickey_fuller_mean_reverting_series_rejects(spark):
    # daily event counts are stationary noise around a level, so gamma
    # must be strongly negative (mean reversion), never positive
    row = q_dickey_fuller(spark, SF).collect()[0]
    assert row["gamma"] < 0.0
    assert row["t_stat"] < 0.0


# ---------------------------------------------------------------------------
# sax_symbols
# ---------------------------------------------------------------------------


def _sax_local(xs):
    n = len(xs)
    s1 = sum(xs)
    s2 = sum(x * x for x in xs)
    m2 = n * s2 - s1 * s1
    segs = collections.defaultdict(list)
    for t, x in enumerate(xs, start=1):
        segs[(t - 1) * _SAX_W // n].append(n * x - s1)
    out = []
    for seg in sorted(segs):
        vs = segs[seg]
        if m2 <= 0:
            paa = 0.0
        else:
            paa = _micro(float(sum(vs)) / len(vs) / math.sqrt(float(m2)))
        sym = (
            "a" if paa < -0.6745 else
            "b" if paa < 0.0 else
            "c" if paa < 0.6745 else "d"
        )
        out.append((seg, len(vs), paa, sym))
    return out


def test_sax_symbols_matches_local(spark):
    xs = _daily_counts(spark)
    exp = _sax_local(xs)
    got = [
        (r["seg"], r["n_days_seg"], r["paa"], r["symbol"])
        for r in q_sax_symbols(spark, SF).collect()
    ]
    assert got == exp


def test_sax_symbols_shape(spark):
    rows = q_sax_symbols(spark, SF).collect()
    assert len(rows) == _SAX_W
    assert [r["seg"] for r in rows] == list(range(_SAX_W))
    xs = _daily_counts(spark)
    assert sum(r["n_days_seg"] for r in rows) == len(xs)
    # z-scores sum to ~0, so the PAA letters cannot all sit on one side
    syms = {r["symbol"] for r in rows}
    assert syms <= {"a", "b", "c", "d"}
    assert not (syms <= {"a"}) and not (syms <= {"d"})


# ---------------------------------------------------------------------------
# randomized_response
# ---------------------------------------------------------------------------


def _rr_local(docs):
    langs = sorted({lang for _, lang in docs})
    k = len(langs)
    n = len(docs)
    rep = collections.Counter()
    for doc_id, lang in docs:
        h = hashlib.md5(f"{doc_id}:rr".encode()).hexdigest()
        coin = int(h[0], 16) * 16 + int(h[1], 16)
        repl = langs[(int(h[2], 16) * 16 + int(h[3], 16)) % k]
        rep[lang if coin < 192 else repl] += 1
    true = collections.Counter(lang for _, lang in docs)
    out = []
    eps = _micro(math.log((0.75 + 0.25 / k) / (0.25 / k)))
    for lang in langs:
        est = (rep[lang] / n - 0.25 / k) / 0.75
        tf = true[lang] / n
        out.append(
            (lang, rep[lang], _micro(est), _micro(tf),
             _micro(abs(est - tf)), eps)
        )
    return out


def test_randomized_response_matches_local(spark):
    rows = Q._t(spark, SF, "documents").select("doc_id", "lang").collect()
    docs = [(int(r["doc_id"]), r["lang"] or "") for r in rows]
    exp = _rr_local(docs)
    got = [
        (r["lang"], r["rep_cnt"], r["est_freq"], r["true_freq"],
         r["abs_err"], r["epsilon"])
        for r in q_randomized_response(spark, SF).collect()
    ]
    assert got == exp


def test_randomized_response_debiasing_helps(spark):
    # the de-biased estimate must be closer to truth than the raw
    # reported frequency for at least the majority of labels
    rows = q_randomized_response(spark, SF).collect()
    n = sum(r["rep_cnt"] for r in rows)
    better = sum(
        1
        for r in rows
        if r["abs_err"] <= abs(r["rep_cnt"] / n - r["true_freq"]) + 1e-9
    )
    assert better >= (len(rows) + 1) // 2
    assert all(r["epsilon"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# f2_ams_sketch
# ---------------------------------------------------------------------------


def test_f2_ams_sketch_matches_local(spark):
    rows = Q._t(spark, SF, "documents").select("text").collect()
    freq = collections.Counter()
    for r in rows:
        for w in (r["text"] or "").split(" "):
            if w:
                freq[w] += 1
    exact = sum(f * f for f in freq.values())
    ests = []
    for r in range(1, _F2_R + 1):
        z = 0
        for tok, f in freq.items():
            h = hashlib.md5(f"{tok}:f2:{r}".encode()).hexdigest()
            z += f * (2 * (int(h[0], 16) % 2) - 1)
        ests.append(z * z)
    med = sorted(ests)[2]
    row = q_f2_ams_sketch(spark, SF).collect()[0]
    assert row["n_tokens_distinct"] == len(freq)
    assert row["exact_f2"] == exact
    assert row["f2_est"] == med
    assert row["rel_err"] == _micro(abs(med - exact) / exact)


def test_f2_ams_sketch_is_unbiased_enough(spark):
    # E[z^2] = F2; with 5 reps the median should land within 3x
    row = q_f2_ams_sketch(spark, SF).collect()[0]
    assert row["f2_est"] > 0
    assert row["rel_err"] < 2.0


def test_f2_ams_single_scan_partial_agg(spark):
    plan = _plan_of(q_f2_ams_sketch(spark, SF))
    assert plan.count("documents.parquet") == 1
    assert "partial_count" in plan or "partial_sum" in plan


def test_distfit_registration(spark):
    for k in (
        "jarque_bera",
        "dickey_fuller",
        "sax_symbols",
        "randomized_response",
        "f2_ams_sketch",
    ):
        assert k in Q.QUERIES and k in Q.ORACLES
