"""Semantics tests for the wave-40 signal-engineering entries:
hashing-trick bucket audit, pairwise Jensen–Shannon divergence,
Theil–Sen robust trend, WOE/IV length panel, and closed-form 2-D PCA.
The DuckDB value-hash gate is scripts/check_queries.py; these pin
each op against an independent single-node recomputation plus
plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_signal import (
    _FH_BUCKETS,
    _JS_TOP,
    _WOE_K,
    q_feature_hashing,
    q_js_divergence,
    q_pca_2d,
    q_theil_sen,
    q_woe_iv,
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
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _daily(spark):
    rows = Q._t(spark, SF, "events").select("ts").collect()
    c = collections.Counter(r["ts"].date() for r in rows)
    days = sorted(c)
    return days, [c[d] for d in days]


def _micro(x: float) -> int:
    return math.floor(x * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# feature_hashing
# ---------------------------------------------------------------------------


def _bucket_of(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _FH_BUCKETS


def test_feature_hashing_matches_local(spark):
    tf = collections.Counter()
    for r in _docs(spark):
        tf.update(_tokens(r["text"]))
    per = collections.defaultdict(lambda: [0, 0, 0])  # mass, types, ymax
    for tok, y in tf.items():
        s = per[_bucket_of(tok)]
        s[0] += y
        s[1] += 1
        s[2] = max(s[2], y)
    got = {
        r["bucket"]: (r["n_tokens"], r["n_types"], r["top_share"])
        for r in q_feature_hashing(spark, SF).collect()
    }
    assert set(got) == set(per)
    for b, (mass, types, ymax) in per.items():
        share = (2_000_000 * ymax + mass) // (2 * mass) / 1e6
        assert got[b] == (mass, types, share)


def test_feature_hashing_conservation_and_plan(spark):
    rows = q_feature_hashing(spark, SF).collect()
    tf = collections.Counter()
    for r in _docs(spark):
        tf.update(_tokens(r["text"]))
    assert sum(r["n_tokens"] for r in rows) == sum(tf.values())
    assert sum(r["n_types"] for r in rows) == len(tf)
    plan = _plan_of(q_feature_hashing(spark, SF))
    # two-stage partial aggregation, no join, no Python UDF
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# js_divergence
# ---------------------------------------------------------------------------


def _heads(spark):
    tf = collections.defaultdict(collections.Counter)
    for r in _docs(spark):
        tf[r["source"]].update(_tokens(r["text"]))
    heads = {}
    for s, c in tf.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_JS_TOP]
        heads[s] = dict(ranked)
    return heads


def _js_local(h1, h2):
    n1 = sum(h1.values())
    n2 = sum(h2.values())
    qsum = 0
    sh1 = sh2 = nsh = 0
    for tok in set(h1) & set(h2):
        y1, y2 = h1[tok], h2[tok]
        sh1 += y1
        sh2 += y2
        nsh += 1
        den = y1 * n2 + y2 * n1
        r1 = max(math.floor(2e6 * y1 * n2 / den + 0.5), 1) / 1e6
        r2 = max(math.floor(2e6 * y2 * n1 / den + 0.5), 1) / 1e6
        contrib = y1 / n1 * math.log(r1) + y2 / n2 * math.log(r2)
        qsum += math.floor(contrib * 500_000 + 0.5)
    excl = math.floor(
        693147 * 0.5e-6 * 1e6 * (2.0 - sh1 / n1 - sh2 / n2) + 0.5
    )
    return n1, n2, nsh, (qsum + excl) / 1e6


def test_js_divergence_matches_local(spark):
    heads = _heads(spark)
    got = {
        (r["s1"], r["s2"]): (
            r["n1_head"],
            r["n2_head"],
            r["n_shared"],
            r["js"],
        )
        for r in q_js_divergence(spark, SF).collect()
    }
    srcs = sorted(heads)
    expect_pairs = {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]
    }
    assert set(got) == expect_pairs
    for (a, b), (n1, n2, nsh, js) in got.items():
        en1, en2, ensh, ejs = _js_local(heads[a], heads[b])
        assert (n1, n2, nsh) == (en1, en2, ensh)
        assert abs(js - ejs) < 2e-6


def test_js_divergence_bounds_and_symmetric_zero(spark):
    rows = q_js_divergence(spark, SF).collect()
    for r in rows:
        # JS is bounded by ln 2 (up to the documented per-row
        # micro-quantization slack over ≤ _JS_TOP shared tokens)
        assert -0.001 <= r["js"] <= math.log(2) + 0.001
    plan = _plan_of(q_js_divergence(spark, SF))
    assert "BatchEvalPython" not in plan
    # the only nested-loop / cartesian is the |S|^2 source grid
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# theil_sen
# ---------------------------------------------------------------------------


def test_theil_sen_matches_local(spark):
    days, ys = _daily(spark)
    x = [(d - days[0]).days for d in days]
    pairs = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            sm = math.floor(
                1e6 * (ys[j] - ys[i]) / (x[j] - x[i]) + 0.5
            )
            pairs.append((sm, days[i], days[j]))
    pairs.sort()
    slope_micro = pairs[(len(pairs) + 1) // 2 - 1][0]
    resid = sorted(
        (
            math.floor(
                1e6 * (ys[i] - slope_micro / 1e6 * x[i]) + 0.5
            ),
            days[i],
        )
        for i in range(len(days))
    )
    intercept_micro = resid[(len(days) + 1) // 2 - 1][0]

    [row] = q_theil_sen(spark, SF).collect()
    assert row["n_days"] == len(days)
    assert row["n_pairs"] == len(pairs)
    assert _micro(row["slope"]) == slope_micro
    assert _micro(row["intercept"]) == intercept_micro


def test_theil_sen_robust_to_one_outlier():
    # pure-python sanity of the estimator itself: one wild day leaves
    # the median slope of a clean linear series untouched
    ys = [10 + 2 * i for i in range(11)]
    ys[5] = 500
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(11)
        for j in range(i + 1, 11)
    )
    assert slopes[(len(slopes) + 1) // 2 - 1] == 2.0


# ---------------------------------------------------------------------------
# woe_iv
# ---------------------------------------------------------------------------


def test_woe_iv_matches_local(spark):
    rows = _docs(spark)
    mn = min(r["n_chars"] for r in rows)
    mx = max(r["n_chars"] for r in rows)
    good = collections.Counter()
    bad = collections.Counter()
    for r in rows:
        b = (r["n_chars"] - mn) * _WOE_K // (mx - mn + 1)
        (good if r["lang"] == "en" else bad)[b] += 1
    gt, bt = sum(good.values()), sum(bad.values())
    expect = {}
    ivtot = 0
    parts = {}
    for b in range(_WOE_K):
        g, bd = good[b], bad[b]
        ratio = max(
            math.floor(
                1e6 * (g + 1) * (bt + _WOE_K) / ((bd + 1) * (gt + _WOE_K))
                + 0.5
            ),
            1,
        ) / 1e6
        woe_micro = math.floor(math.log(ratio) * 1e6 + 0.5)
        ivp = math.floor(
            ((g + 1) / (gt + _WOE_K) - (bd + 1) / (bt + _WOE_K))
            * (woe_micro / 1e6)
            * 1e6
            + 0.5
        )
        ivtot += ivp
        expect[b] = (g, bd, woe_micro / 1e6)
        parts[b] = ivp / 1e6
    got = q_woe_iv(spark, SF).collect()
    assert len(got) == _WOE_K
    for r in got:
        g, bd, woe = expect[r["bucket"]]
        assert (r["n_good"], r["n_bad"]) == (g, bd)
        assert r["woe"] == woe
        assert r["iv_part"] == parts[r["bucket"]]
        assert _micro(r["iv"]) == ivtot


def test_woe_iv_iv_nonneg_and_dense(spark):
    got = q_woe_iv(spark, SF).collect()
    # IV is a sum of (p-q)·ln(p/q)-shaped terms: nonnegative up to
    # quantization slack
    assert got[0]["iv"] >= -1e-5
    assert sorted(r["bucket"] for r in got) == list(range(_WOE_K))


# ---------------------------------------------------------------------------
# pca_2d
# ---------------------------------------------------------------------------


def test_pca_2d_matches_local(spark):
    rows = _docs(spark)
    xs = [r["n_chars"] for r in rows]
    ys = [len(_tokens(r["text"])) for r in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    cxx = math.floor(1e6 * (n * sxx - sx * sx) / (n * n) + 0.5)
    cyy = math.floor(1e6 * (n * syy - sy * sy) / (n * n) + 0.5)
    cxy = math.floor(1e6 * (n * sxy - sx * sy) / (n * n) + 0.5)
    lam1 = (cxx + cyy) / 2e6 + math.sqrt(
        ((cxx - cyy) / 2e6) ** 2 + (cxy / 1e6) ** 2
    )

    [row] = q_pca_2d(spark, SF).collect()
    assert row["n"] == n
    assert _micro(row["mean_x"]) == math.floor(1e6 * sx / n + 0.5)
    assert _micro(row["mean_y"]) == math.floor(1e6 * sy / n + 0.5)
    assert _micro(row["var_x"]) == cxx
    assert _micro(row["var_y"]) == cyy
    assert _micro(row["cov_xy"]) == cxy
    assert _micro(row["lambda1"]) == math.floor(lam1 * 1e6 + 0.5)
    assert _micro(row["var_explained"]) == math.floor(
        lam1 / ((cxx + cyy) / 1e6) * 1e6 + 0.5
    )
    assert _micro(row["ev_slope"]) == math.floor(
        (lam1 - cxx / 1e6) / (cxy / 1e6) * 1e6 + 0.5
    )


def test_pca_2d_eigen_properties_and_plan(spark):
    [row] = q_pca_2d(spark, SF).collect()
    # λ1 dominates both variances, and explains 0.5..1 of the trace
    assert row["lambda1"] >= max(row["var_x"], row["var_y"]) - 1e-5
    assert 0.5 - 1e-6 <= row["var_explained"] <= 1.0 + 1e-6
    # chars-per-token is positive, so the PC points up-right
    assert row["cov_xy"] > 0 and row["ev_slope"] > 0
    plan = _plan_of(q_pca_2d(spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial + final moments
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
