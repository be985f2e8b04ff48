"""Semantics tests for the wave-53 regression-diagnostics entries:
closed-form ridge fit, Cook's-distance influence ranking,
Breusch-Pagan LM heteroskedasticity test, Yule-Walker AR(1) fit, and
Theil's U forecast-accuracy ratio.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_regdiag import (
    _CD_TOPK,
    _RG_LAMBDA,
    q_ar1_yulewalker,
    q_breusch_pagan,
    q_cooks_distance,
    q_ridge_fit,
    q_theil_u,
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
    days = sorted(cnt)
    return [cnt[d] for d in days], days


def _ols_scalars(xs):
    """Exact-integer OLS moment scalars over t = 1..n (all Python ints)."""
    n = len(xs)
    st = sum(range(1, n + 1))
    sy = sum(xs)
    stt = sum(t * t for t in range(1, n + 1))
    sty = sum(t * y for t, y in zip(range(1, n + 1), xs))
    d = n * stt - st * st
    bnum = n * sty - st * sy
    return n, st, sy, d, bnum


def _residual_scaled(t, y, n, st, sy, d, bnum):
    """e_t on the exact n*d scale: n*d*y - (sy*d - bnum*st) - n*bnum*t."""
    return n * d * y - (sy * d - bnum * st) - n * bnum * t


# ---------------------------------------------------------------------------
# ridge_fit
# ---------------------------------------------------------------------------


def _doc_features(spark):
    rows = Q._t(spark, SF, "documents").select("text", "n_chars").collect()
    feats = []
    for r in rows:
        toks = [w for w in (r["text"] or "").split(" ") if w != ""]
        feats.append((int(r["n_chars"]), len(set(toks)), len(toks)))
    return feats


def test_ridge_fit_matches_exact_cramer(spark):
    feats = _doc_features(spark)
    n = len(feats)
    s1 = sum(f[0] for f in feats)
    s2 = sum(f[1] for f in feats)
    sy = sum(f[2] for f in feats)
    s11 = sum(f[0] * f[0] for f in feats)
    s12 = sum(f[0] * f[1] for f in feats)
    s22 = sum(f[1] * f[1] for f in feats)
    s1y = sum(f[0] * f[2] for f in feats)
    s2y = sum(f[1] * f[2] for f in feats)
    lam = _RG_LAMBDA
    a00, a01, a02 = n + lam, s1, s2
    a11, a12, a22 = s11 + lam, s12, s22 + lam
    det = (
        a00 * (a11 * a22 - a12 * a12)
        - a01 * (a01 * a22 - a12 * a02)
        + a02 * (a01 * a12 - a11 * a02)
    )
    det0 = (
        sy * (a11 * a22 - a12 * a12)
        - a01 * (s1y * a22 - a12 * s2y)
        + a02 * (s1y * a12 - a11 * s2y)
    )
    det1 = (
        a00 * (s1y * a22 - s2y * a12)
        - sy * (a01 * a22 - a12 * a02)
        + a02 * (a01 * s2y - s1y * a02)
    )
    det2 = (
        a00 * (a11 * s2y - s1y * a12)
        - a01 * (a01 * s2y - s1y * a02)
        + sy * (a01 * a12 - a11 * a02)
    )
    assert det != 0
    row = q_ridge_fit(spark, SF).collect()[0]
    assert row["n_docs"] == n
    assert row["lambda_reg"] == lam
    assert row["b0"] == _micro(float(det0) / float(det))
    assert row["b_chars"] == _micro(float(det1) / float(det))
    assert row["b_vocab"] == _micro(float(det2) / float(det))


def test_ridge_fit_solves_penalized_normal_equations(spark):
    # (X'X + lam*I) b ~= X'y when b is the exact Cramer solution:
    # residual of each normal equation is < solver quantization noise.
    feats = _doc_features(spark)
    row = q_ridge_fit(spark, SF).collect()[0]
    b = [row["b0"], row["b_chars"], row["b_vocab"]]
    n = len(feats)
    lam = float(_RG_LAMBDA)
    g = [
        [n + lam, sum(f[0] for f in feats), sum(f[1] for f in feats)],
        [
            sum(f[0] for f in feats),
            sum(f[0] * f[0] for f in feats) + lam,
            sum(f[0] * f[1] for f in feats),
        ],
        [
            sum(f[1] for f in feats),
            sum(f[0] * f[1] for f in feats),
            sum(f[1] * f[1] for f in feats) + lam,
        ],
    ]
    rhs = [
        sum(f[2] for f in feats),
        sum(f[0] * f[2] for f in feats),
        sum(f[1] * f[2] for f in feats),
    ]
    for i in range(3):
        lhs = sum(g[i][j] * b[j] for j in range(3))
        # 1e-6 coefficient quantization x O(|row sums|) propagated error
        tol = 2e-6 * sum(abs(v) for v in g[i]) + 1e-6
        assert abs(lhs - rhs[i]) < tol, (i, lhs, rhs[i], tol)


def test_ridge_fit_single_scan_partial_agg(spark):
    plan = _plan_of(q_ridge_fit(spark, SF))
    assert plan.count("documents.parquet") == 1
    assert "partial_sum" in plan or "partial_count" in plan


# ---------------------------------------------------------------------------
# cooks_distance
# ---------------------------------------------------------------------------


def _cooks_local(xs, days):
    n, st, sy, d, bnum = _ols_scalars(xs)
    res = []
    for t, (y, day) in enumerate(zip(xs, days), start=1):
        e = _residual_scaled(t, y, n, st, sy, d, bnum)
        resid = math.floor(float(e) / float(n) / float(d) * 1e6 + 0.5) / 1e6
        tdev = n * t - st
        lev = (
            math.floor(
                (1.0 / n + float(tdev) * float(tdev) / (float(n) * float(d)))
                * 1e6
                + 0.5
            )
            / 1e6
        )
        res.append((day, resid, lev))
    sse = sum(math.floor(r * r * 1e6 + 0.5) for _, r, _ in res)
    s2 = 0.0 if n <= 2 else sse / 1e6 / (n - 2)
    scored = []
    for day, r, h in res:
        if s2 == 0.0 or h >= 1.0:
            dd = 0.0
        else:
            dd = (
                math.floor(
                    r * r * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) * 1e6 + 0.5
                )
                / 1e6
            )
        scored.append((day, r, h, dd))
    scored.sort(key=lambda x: (-x[3], x[0]))
    return scored[:_CD_TOPK]


def test_cooks_distance_matches_local(spark):
    xs, days = _daily_counts(spark)
    exp = _cooks_local(xs, days)
    got = [
        (r["day"], r["resid"], r["leverage"], r["cooks_d"])
        for r in q_cooks_distance(spark, SF).collect()
    ]
    assert got == exp


def test_cooks_distance_shape(spark):
    rows = q_cooks_distance(spark, SF).collect()
    assert len(rows) == _CD_TOPK
    ds = [r["cooks_d"] for r in rows]
    assert ds == sorted(ds, reverse=True)
    assert all(d >= 0.0 for d in ds)
    assert all(0.0 < r["leverage"] < 1.0 for r in rows)


def test_cooks_distance_broadcasts_scalars(spark):
    plan = _plan_of(q_cooks_distance(spark, SF))
    # both the moment row and the s2 row join back as broadcasts
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# breusch_pagan
# ---------------------------------------------------------------------------


def test_breusch_pagan_matches_local(spark):
    xs, days = _daily_counts(spark)
    n0, st0, sy0, d0, bnum0 = _ols_scalars(xs)
    gq = []
    for t, y in enumerate(xs, start=1):
        e = _residual_scaled(t, y, n0, st0, sy0, d0, bnum0)
        r = math.floor(float(e) / float(n0) / float(d0) * 1e3 + 0.5)
        gq.append((t, r * r))
    n = len(gq)
    st = sum(t for t, _ in gq)
    sg = sum(g for _, g in gq)
    stt = sum(t * t for t, _ in gq)
    stg = sum(t * g for t, g in gq)
    sgg = sum(g * g for _, g in gq)
    dt = n * stt - st * st
    dg = n * sgg - sg * sg
    cov = n * stg - st * sg
    if dt == 0 or dg == 0:
        r2 = lm = 0.0
    else:
        r2 = _micro(float(cov) * float(cov) / float(dt) / float(dg))
        lm = _micro(n * (float(cov) * float(cov) / float(dt) / float(dg)))
    row = q_breusch_pagan(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["r2_aux"] == r2
    assert row["lm_stat"] == lm
    assert 0.0 <= row["r2_aux"] <= 1.0


# ---------------------------------------------------------------------------
# ar1_yulewalker
# ---------------------------------------------------------------------------


def test_ar1_yulewalker_matches_local(spark):
    xs, _ = _daily_counts(spark)
    n = len(xs)
    s = sum(xs)
    v = [n * x - s for x in xs]
    c0 = sum(u * u for u in v)
    c1 = sum(a * b for a, b in zip(v, v[1:]))
    phi = 0.0 if c0 == 0 else _micro(float(c1) / float(c0))
    if c0 == 0 or n == 0:
        iv = 0.0
    else:
        ratio = float(c1) / float(c0)
        iv = _micro((1.0 - ratio * ratio) * (float(c0) / (float(n) * n * n)))
    if abs(phi) >= 1.0 or phi == 0.0:
        hl = 0.0
    else:
        hl = _micro(math.log(0.5) / math.log(abs(phi)))
    row = q_ar1_yulewalker(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["phi"] == phi
    assert row["innov_var"] == iv
    assert row["half_life"] == hl


def test_ar1_phi_is_bounded_correlation(spark):
    row = q_ar1_yulewalker(spark, SF).collect()[0]
    # rho_1 estimated with the c0 denominator is always within [-1, 1]
    assert -1.0 <= row["phi"] <= 1.0
    assert row["innov_var"] >= 0.0
    if 0.0 < abs(row["phi"]) < 1.0:
        assert row["half_life"] > 0.0


# ---------------------------------------------------------------------------
# theil_u
# ---------------------------------------------------------------------------


def test_theil_u_matches_local(spark):
    xs, _ = _daily_counts(spark)
    n, st, sy, d, bnum = _ols_scalars(xs)
    es = [
        _residual_scaled(t, y, n, st, sy, d, bnum)
        for t, y in enumerate(xs, start=1)
    ]
    ys = [n * d * y for y in xs]
    num = sum(e * e for e in es[1:])
    den = sum((a - b) * (a - b) for a, b in zip(ys, ys[1:]))
    if den == 0:
        u, beats = 0.0, False
    else:
        u = _micro(math.sqrt(float(num) / float(den)))
        beats = num < den
    row = q_theil_u(spark, SF).collect()[0]
    assert row["n_terms"] == len(xs) - 1
    assert row["theil_u"] == u
    assert row["beats_naive"] == beats
    assert row["theil_u"] >= 0.0


def test_daily_frame_ops_share_registration(spark):
    for k in (
        "ridge_fit",
        "cooks_distance",
        "breusch_pagan",
        "ar1_yulewalker",
        "theil_u",
    ):
        assert k in Q.QUERIES and k in Q.ORACLES
