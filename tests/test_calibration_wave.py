"""Semantics tests for the wave-39 calibration/changepoint entries:
BH FDR panel, isotonic calibration, binary-segmentation changepoint,
classical decomposition, and Cramér's V.  The DuckDB value-hash gate
is scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math
import re

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_calibration import (
    _AS_B,
    _AS_T,
    _BH_ALPHA_MICRO,
    _INV_SQRT_2PI,
    _ISO_K,
    _TSD_HALF,
    q_bh_fdr,
    q_changepoint_binseg,
    q_cramers_v,
    q_isotonic_calibration,
    q_ts_decompose,
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
        .select("doc_id", "lang", "source", "n_chars")
        .collect()
    )


def _daily(spark):
    rows = Q._t(spark, SF, "events").select("ts").collect()
    c = collections.Counter(r["ts"].date() for r in rows)
    days = sorted(c)
    return days, [c[d] for d in days]


# ---------------------------------------------------------------------------
# bh_fdr
# ---------------------------------------------------------------------------


def _phi_tail(az: float) -> float:
    t = 1.0 / (1.0 + _AS_T * az)
    poly = sum(b * t ** (i + 1) for i, b in enumerate(_AS_B))
    return _INV_SQRT_2PI * math.exp(-az * az / 2.0) * poly


def test_bh_fdr_matches_naive(spark):
    rows = _docs(spark)
    xs = collections.defaultdict(list)
    for r in rows:
        xs[r["source"] or ""].append(r["n_chars"])
    allx = [x for v in xs.values() for x in v]
    n, sx, sxx = len(allx), sum(allx), sum(x * x for x in allx)
    var_g = (n * sxx - sx * sx) / (n * n)
    panel = {}
    for s, v in xs.items():
        z = (sum(v) / len(v) - sx / n) / math.sqrt(var_g / len(v))
        z_micro = int(math.floor(z * 1e6 + 0.5))
        p_micro = min(
            int(math.floor(2.0 * _phi_tail(abs(z_micro) / 1e6) * 1e6 + 0.5)),
            1_000_000,
        )
        panel[s] = (len(v), z_micro, p_micro)
    m = len(panel)
    order = sorted(panel, key=lambda s: (panel[s][2], s))
    istar = 0
    for i, s in enumerate(order, 1):
        if panel[s][2] * m <= i * _BH_ALPHA_MICRO:
            istar = i
    expect = {
        s: (panel[s][0], panel[s][1], panel[s][2], i, i <= istar)
        for i, s in enumerate(order, 1)
    }
    got = {
        r["source"]: (r["n_s"], r["z_micro"], r["p_micro"], r["rk"], r["reject"])
        for r in q_bh_fdr(spark, SF).collect()
    }
    assert got == expect


def test_bh_fdr_rejections_are_a_prefix(spark):
    rows = sorted(q_bh_fdr(spark, SF).collect(), key=lambda r: r["rk"])
    flags = [r["reject"] for r in rows]
    # step-up: once False, never True again
    assert flags == sorted(flags, reverse=True)
    # p is non-decreasing in rank
    ps = [r["p_micro"] for r in rows]
    assert ps == sorted(ps)


# ---------------------------------------------------------------------------
# isotonic_calibration
# ---------------------------------------------------------------------------


def _iso_naive(rows):
    xs = [r["n_chars"] for r in rows]
    lo, hi = min(xs), max(xs)
    agg = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        b = min(_ISO_K - 1, (r["n_chars"] - lo) * _ISO_K // (hi - lo + 1))
        agg[b][0] += 1
        agg[b][1] += 1 if (r["lang"] or "") == "en" else 0
    bks = sorted(agg)
    w = [agg[b][0] for b in bks]
    pos = [agg[b][1] for b in bks]
    cw = [sum(w[: i + 1]) for i in range(len(bks))]
    cp = [sum(pos[: i + 1]) for i in range(len(bks))]

    def block(j, k):  # avg over buckets j..k, micro
        pj = cp[j] - pos[j]
        wj = cw[j] - w[j]
        return int(math.floor((cp[k] - pj) / (cw[k] - wj) * 1e6 + 0.5))

    out = {}
    for i, b in enumerate(bks):
        iso = max(
            min(block(j, k) for k in range(i, len(bks)))
            for j in range(0, i + 1)
        )
        out[b] = (
            w[i],
            pos[i],
            int(math.floor(pos[i] / w[i] * 1e6 + 0.5)),
            iso,
        )
    return out


def test_isotonic_calibration_matches_naive(spark):
    expect = _iso_naive(_docs(spark))
    got = {
        r["bucket"]: (r["w"], r["pos"], r["rate_micro"], r["iso_micro"])
        for r in q_isotonic_calibration(spark, SF).collect()
    }
    assert got == expect


def test_isotonic_output_is_monotone(spark):
    rows = sorted(
        q_isotonic_calibration(spark, SF).collect(), key=lambda r: r["bucket"]
    )
    iso = [r["iso_micro"] for r in rows]
    assert iso == sorted(iso)
    # isotonic fit preserves the weighted total up to quantization
    tot_pos = sum(r["pos"] for r in rows)
    tot_w = sum(r["w"] for r in rows)
    fit = sum(r["iso_micro"] * r["w"] for r in rows) / tot_w
    assert abs(fit - tot_pos / tot_w * 1e6) < 1000


# ---------------------------------------------------------------------------
# changepoint_binseg
# ---------------------------------------------------------------------------


def test_changepoint_binseg_matches_naive(spark):
    days, ys = _daily(spark)
    n = len(ys)
    best = None
    for t in range(1, n):
        l, r = ys[:t], ys[t:]
        sse = (
            sum(v * v for v in l)
            - sum(l) ** 2 / t
            + sum(v * v for v in r)
            - sum(r) ** 2 / (n - t)
        )
        cost = int(math.floor(sse * 1e6 + 0.5))
        if best is None or cost < best[0]:
            best = (cost, t)
    cost, t = best
    total_sse = int(
        math.floor((sum(v * v for v in ys) - sum(ys) ** 2 / n) * 1e6 + 0.5)
    )
    row = q_changepoint_binseg(spark, SF).collect()[0]
    assert row["split_day"] == days[t - 1]
    assert (row["n_left"], row["n_right"]) == (t, n - t)
    assert row["mean_left_micro"] == int(
        math.floor(sum(ys[:t]) / t * 1e6 + 0.5)
    )
    assert row["mean_right_micro"] == int(
        math.floor(sum(ys[t:]) / (n - t) * 1e6 + 0.5)
    )
    assert row["gain_micro"] == total_sse - cost


def test_changepoint_gain_nonnegative_single_row(spark):
    rows = q_changepoint_binseg(spark, SF).collect()
    assert len(rows) == 1
    assert rows[0]["gain_micro"] >= 0


# ---------------------------------------------------------------------------
# ts_decompose
# ---------------------------------------------------------------------------


def test_ts_decompose_matches_naive(spark):
    days, ys = _daily(spark)
    n = len(ys)
    k = 2 * _TSD_HALF + 1
    trend = [
        int(math.floor(sum(ys[i - _TSD_HALF : i + _TSD_HALF + 1]) / k * 1e6 + 0.5))
        if _TSD_HALF <= i < n - _TSD_HALF
        else None
        for i in range(n)
    ]
    det = collections.defaultdict(list)
    for i in range(n):
        if trend[i] is not None:
            # python weekday(): Mon=0; spark dayofweek: Sun=1
            dow = (days[i].weekday() + 1) % 7 + 1
            det[dow].append(ys[i] * 1_000_000 - trend[i])
    raw = {
        d: int(math.floor(sum(v) / len(v) + 0.5)) for d, v in det.items()
    }
    c = int(math.floor(sum(raw.values()) / len(raw) + 0.5))
    seas = {d: r - c for d, r in raw.items()}
    expect = {}
    for i in range(n):
        dow = (days[i].weekday() + 1) % 7 + 1
        resid = (
            ys[i] * 1_000_000 - trend[i] - seas[dow]
            if trend[i] is not None
            else None
        )
        expect[days[i]] = (ys[i], trend[i], seas[dow], resid)
    got = {
        r["day"]: (r["y"], r["trend_micro"], r["seasonal_micro"], r["resid_micro"])
        for r in q_ts_decompose(spark, SF).collect()
    }
    assert got == expect


def test_ts_decompose_reconstruction_identity(spark):
    for r in q_ts_decompose(spark, SF).collect():
        if r["trend_micro"] is not None:
            assert (
                r["trend_micro"] + r["seasonal_micro"] + r["resid_micro"]
                == r["y"] * 1_000_000
            )


# ---------------------------------------------------------------------------
# cramers_v
# ---------------------------------------------------------------------------


def test_cramers_v_matches_naive(spark):
    rows = _docs(spark)
    cells = collections.Counter(
        (r["source"] or "", r["lang"] or "") for r in rows
    )
    rt = collections.Counter(r["source"] or "" for r in rows)
    ct = collections.Counter(r["lang"] or "" for r in rows)
    n = len(rows)
    chi = sum(
        (cells.get((s, l), 0) - rt[s] * ct[l] / n) ** 2 / (rt[s] * ct[l] / n)
        for s in rt
        for l in ct
    )
    chi_micro = int(math.floor(chi * 1e6 + 0.5))
    v_micro = int(
        math.floor(
            math.sqrt(chi_micro / 1e6 / (n * (min(len(rt), len(ct)) - 1))) * 1e6
            + 0.5
        )
    )
    row = q_cramers_v(spark, SF).collect()[0]
    assert row["chi2_micro"] == chi_micro
    assert row["v_micro"] == v_micro
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert row["n"] == n


def test_cramers_v_bounded_and_one_scan(spark):
    row = q_cramers_v(spark, SF).collect()[0]
    assert 0 <= row["v_micro"] <= 1_000_000
    plan = _plan_of(q_cramers_v(spark, SF))
    # the corpus parquet is scanned for cells/rows/cols/n, never joined
    # against itself row-to-row: no SortMergeJoin anywhere
    assert "SortMergeJoin" not in plan
