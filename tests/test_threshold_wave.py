"""Semantics tests for the wave-58 classifier-threshold entries:
ROC/Youden sweep, step-interpolated PR-AUC, median-threshold MCC,
F-beta quintile sweep, and decile lift/gains.  The DuckDB value-hash
gate is scripts/check_queries.py; these pin each op against an
independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_threshold import (
    _FB_BETA2_Q,
    _LBL_LANG,
    _LG_BUCKETS,
    _RY_TOP,
    q_fbeta_sweep,
    q_lift_gains,
    q_mcc_eval,
    q_pr_auc,
    q_roc_youden,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _rows(spark):
    return [
        (r["n_chars"], int(r["lang"] == _LBL_LANG))
        for r in Q._t(spark, SF, "documents")
        .select("doc_id", "n_chars", "lang")
        .collect()
    ]


def _rows_with_id(spark):
    return [
        (r["doc_id"], r["n_chars"], int(r["lang"] == _LBL_LANG))
        for r in Q._t(spark, SF, "documents")
        .select("doc_id", "n_chars", "lang")
        .collect()
    ]


def _conf_sweep(rows):
    """Per distinct threshold desc: (thr, tp, fp); plus totals."""
    hist = collections.Counter()
    pos = collections.Counter()
    for s, p in rows:
        hist[s] += 1
        pos[s] += p
    p_tot = sum(pos.values())
    n_tot = sum(hist.values()) - p_tot
    out = []
    tp = fp = 0
    for s in sorted(hist, reverse=True):
        tp += pos[s]
        fp += hist[s] - pos[s]
        out.append((s, tp, fp))
    return out, p_tot, n_tot


# ---------------------------------------------------------------------------
# roc_youden
# ---------------------------------------------------------------------------


def test_roc_youden_matches_local(spark):
    rows = _rows(spark)
    sweep, p, n = _conf_sweep(rows)
    pts = []
    for thr, tp, fp in sweep:
        tpr = _halfup(2_000_000 * tp, 2 * p)
        fpr = _halfup(2_000_000 * fp, 2 * n)
        pts.append((tpr - fpr, thr, tp, fp, p - tp, n - fp, tpr, fpr))
    pts.sort(key=lambda x: (-x[0], x[1]))
    want = [
        (thr, tp, fp, fn, tn, tpr, fpr, j)
        for j, thr, tp, fp, fn, tn, tpr, fpr in pts[:_RY_TOP]
    ]
    got = [
        (
            r["thr"],
            r["tp"],
            r["fp"],
            r["fn"],
            r["tn"],
            r["tpr_micro"],
            r["fpr_micro"],
            r["j_micro"],
        )
        for r in q_roc_youden(spark, SF).collect()
    ]
    assert got == want


def test_roc_youden_point_consistency(spark):
    for r in q_roc_youden(spark, SF).collect():
        assert r["tp"] + r["fn"] > 0 and r["fp"] + r["tn"] > 0
        assert r["j_micro"] == r["tpr_micro"] - r["fpr_micro"]
        assert -1_000_000 <= r["j_micro"] <= 1_000_000


def test_roc_youden_single_scan(spark):
    plan = _plan_of(q_roc_youden(spark, SF))
    assert plan.count("documents.parquet") == 1


# ---------------------------------------------------------------------------
# pr_auc
# ---------------------------------------------------------------------------


def test_pr_auc_matches_local(spark):
    rows = _rows(spark)
    sweep, p, n = _conf_sweep(rows)
    s = 0
    prev_tp = 0
    for _thr, tp, fp in sweep:
        prec = _halfup(2_000_000 * tp, 2 * (tp + fp))
        s += (tp - prev_tp) * prec
        prev_tp = tp
    want_auc = _halfup(s, p)
    want_base = _halfup(2_000_000 * p, 2 * (p + n))
    row = q_pr_auc(spark, SF).collect()[0]
    assert row["n_pos"] == p and row["n_neg"] == n
    assert row["pr_auc_micro"] == want_auc
    assert row["base_rate_micro"] == want_base


def test_pr_auc_beats_random(spark):
    row = q_pr_auc(spark, SF).collect()[0]
    # AP is bounded by [~base-for-degenerate, 1]; sanity band only
    assert 0 < row["pr_auc_micro"] <= 1_000_000
    assert 0 < row["base_rate_micro"] < 1_000_000


# ---------------------------------------------------------------------------
# mcc_eval
# ---------------------------------------------------------------------------


def test_mcc_matches_local(spark):
    rows = _rows(spark)
    hist = collections.Counter()
    for s, _p in rows:
        hist[s] += 1
    nt = len(rows)
    cum = 0
    thr = None
    for s in sorted(hist):
        cum += hist[s]
        if 2 * cum >= nt:
            thr = s
            break
    tp = sum(p for s, p in rows if s >= thr)
    fp = sum(1 - p for s, p in rows if s >= thr)
    fn = sum(p for s, p in rows if s < thr)
    tn = sum(1 - p for s, p in rows if s < thr)
    num = tp * tn - fp * fn
    den = math.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    want_mcc = math.floor(1e6 * num / den + 0.5)
    row = q_mcc_eval(spark, SF).collect()[0]
    assert row["thr"] == thr
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert int(row["mcc_num"]) == num
    assert row["mcc_micro"] == want_mcc


def test_mcc_bounded(spark):
    row = q_mcc_eval(spark, SF).collect()[0]
    assert -1_000_000 <= row["mcc_micro"] <= 1_000_000
    # all four cells populated at the median split
    assert min(row["tp"], row["fp"], row["fn"], row["tn"]) >= 0
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] == 500


# ---------------------------------------------------------------------------
# fbeta_sweep
# ---------------------------------------------------------------------------


def test_fbeta_matches_local(spark):
    rows = _rows(spark)
    hist = collections.Counter()
    for s, _p in rows:
        hist[s] += 1
    nt = len(rows)
    thrs = {}
    for k in range(1, 5):
        cum = 0
        for s in sorted(hist):
            cum += hist[s]
            if 5 * cum >= k * nt:
                thrs[k] = s
                break
    want = {}
    for k, thr in thrs.items():
        tp = sum(p for s, p in rows if s >= thr)
        fp = sum(1 - p for s, p in rows if s >= thr)
        fn = sum(p for s, p in rows if s < thr)
        for b2q in _FB_BETA2_Q:
            den = (4 + b2q) * tp + b2q * fn + 4 * fp
            want[(k, b2q)] = (
                thr,
                tp,
                fp,
                fn,
                _halfup(2_000_000 * (4 + b2q) * tp, 2 * den)
                if den
                else None,
            )
    got = {
        (r["k"], r["b2q"]): (
            r["thr"],
            r["tp"],
            r["fp"],
            r["fn"],
            r["fbeta_micro"],
        )
        for r in q_fbeta_sweep(spark, SF).collect()
    }
    assert got == want


def test_fbeta_recall_monotone_in_beta(spark):
    # at a fixed threshold, higher beta^2 weights recall more; F2 of a
    # high-recall (low-threshold) split should exceed F0.5's gap
    rows = q_fbeta_sweep(spark, SF).collect()
    per = collections.defaultdict(dict)
    for r in rows:
        per[r["k"]][r["b2q"]] = r["fbeta_micro"]
    assert len(per) == 4
    for k, d in per.items():
        assert set(d) == set(_FB_BETA2_Q)


# ---------------------------------------------------------------------------
# lift_gains
# ---------------------------------------------------------------------------


def test_lift_gains_matches_local(spark):
    rows = _rows_with_id(spark)
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    nt = len(ranked)
    p = sum(r[2] for r in ranked)
    per = collections.defaultdict(lambda: [0, 0])
    for i, (_d, _s, pos) in enumerate(ranked, start=1):
        dec = (_LG_BUCKETS * i + nt - 1) // nt
        per[dec][0] += 1
        per[dec][1] += pos
    want = {}
    cum = 0
    for dec in sorted(per):
        n, np_ = per[dec]
        cum += np_
        want[dec] = (
            n,
            np_,
            _halfup(2_000_000 * np_, 2 * n),
            _halfup(2_000_000 * np_ * nt, 2 * n * p),
            _halfup(2_000_000 * cum, 2 * p),
        )
    got = {
        r["decile"]: (
            r["n"],
            r["n_pos"],
            r["rate_micro"],
            r["lift_micro"],
            r["cum_gains_micro"],
        )
        for r in q_lift_gains(spark, SF).collect()
    }
    assert got == want


def test_lift_gains_deciles_partition(spark):
    rows = q_lift_gains(spark, SF).collect()
    assert sorted(r["decile"] for r in rows) == list(
        range(1, _LG_BUCKETS + 1)
    )
    assert sum(r["n"] for r in rows) == 500
    gains = [
        r["cum_gains_micro"] for r in sorted(rows, key=lambda r: r["decile"])
    ]
    assert gains == sorted(gains)
    assert gains[-1] == 1_000_000


def test_lift_gains_two_level_rank_no_global_row_window(spark):
    plan = _plan_of(q_lift_gains(spark, SF))
    # the within-value rank partitions by score; the only unpartitioned
    # windows run over the distinct-value histogram / 10-row decile frame
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
