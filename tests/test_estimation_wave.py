"""Semantics tests for the wave-43 estimation entries: stratified
ATE, rendezvous-hash placement audit, inter-arrival exponential fit
with one-sample KS, AIC unigram-vs-bigram selection, and the Chapman
capture-recapture vocabulary estimate.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_estimation import (
    _RV_K,
    q_aic_model_select,
    q_capture_recapture,
    q_interarrival_expfit,
    q_ipw_effect,
    q_rendezvous_shards,
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
        .select("doc_id", "text", "lang", "source")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# ipw_effect
# ---------------------------------------------------------------------------


def test_ipw_effect_matches_local(spark):
    per = collections.defaultdict(lambda: [0, 0, 0, 0])  # n1 y1 n0 y0
    for r in _docs(spark):
        s = per[r["source"] or ""]
        y = len(_tokens(r["text"]))
        if r["lang"] == "en":
            s[0] += 1
            s[1] += y
        else:
            s[2] += 1
            s[3] += y
    n = sum(s[0] + s[2] for s in per.values())
    n_tr = sum(s[0] for s in per.values())
    y1all = sum(s[1] for s in per.values())
    y0all = sum(s[3] for s in per.values())
    used = [s for s in per.values() if s[0] > 0 and s[2] > 0]
    n_used = sum(s[0] + s[2] for s in used)
    sum_term = sum(
        math.floor(
            (s[0] + s[2]) * (s[1] / s[0] - s[3] / s[2]) * 1e6 + 0.5
        )
        for s in used
    )
    raw = _micro(y1all / n_tr - y0all / (n - n_tr))
    ate = math.floor(sum_term / n_used + 0.5) / 1e6
    row = q_ipw_effect(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["n_treated"] == n_tr
    assert row["n_strata"] == len(per)
    assert row["n_strata_used"] == len(used)
    assert row["raw_diff"] == raw
    assert row["ate_adjusted"] == ate


def test_ipw_effect_plan(spark):
    plan = _plan_of(q_ipw_effect(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# rendezvous_shards
# ---------------------------------------------------------------------------


def _key(doc_id: int, nd: int) -> int:
    h = int(
        hashlib.md5(f"{doc_id}:{nd}".encode()).hexdigest()[:8], 16
    )
    return h * 16 + nd


def test_rendezvous_matches_local(spark):
    per_shard = collections.defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        d = r["doc_id"]
        s8 = max(_key(d, nd) for nd in range(_RV_K)) % 16
        s9 = max(_key(d, nd) for nd in range(_RV_K + 1)) % 16
        per_shard[s8][0] += 1
        per_shard[s8][1] += 1 if s8 != s9 else 0
    got = {
        r["shard"]: (r["n_docs"], r["n_moved"], r["moved_share"])
        for r in q_rendezvous_shards(spark, SF).collect()
    }
    assert set(got) == set(per_shard)
    for shard, (nd, nm) in per_shard.items():
        share = (2_000_000 * nm + nd) // (2 * nd) / 1e6
        assert got[shard] == (nd, nm, share)


def test_rendezvous_minimal_disruption_and_plan(spark):
    rows = q_rendezvous_shards(spark, SF).collect()
    n = sum(r["n_docs"] for r in rows)
    moved = sum(r["n_moved"] for r in rows)
    # HRW theory: adding node K moves ~1/(K+1) of keys
    assert moved / n < 2.5 / (_RV_K + 1)
    assert len(rows) == _RV_K  # every shard got load at 500 docs
    plan = _plan_of(q_rendezvous_shards(spark, SF))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# interarrival_expfit
# ---------------------------------------------------------------------------


def _deltas(spark):
    rows = (
        Q._t(spark, SF, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    dts = []
    for seq in by_user.values():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            td = b - a
            us = (td.days * 86_400_000_000
                  + td.seconds * 1_000_000
                  + td.microseconds)
            if us > 0:
                dts.append(us)
    return dts


def test_interarrival_matches_local(spark):
    dts = _deltas(spark)
    n, sx = len(dts), sum(dts)
    hist = collections.Counter(dts)
    cum = 0
    d_raw = 0.0
    for v in sorted(hist):
        m = hist[v]
        cum += m
        fx = 1.0 - math.exp(-(n / sx) * v)
        d_raw = max(d_raw, abs(cum / n - fx), abs((cum - m) / n - fx))
    row = q_interarrival_expfit(spark, SF).collect()[0]
    assert row["n_intervals"] == n
    assert row["mean_us"] == math.floor(sx / n + 0.5)
    assert row["lambda_per_sec"] == _micro(n / sx * 1e6)
    assert row["ks_d"] == _micro(d_raw)


def test_interarrival_bounds_and_plan(spark):
    row = q_interarrival_expfit(spark, SF).collect()[0]
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["lambda_per_sec"] > 0.0
    plan = _plan_of(q_interarrival_expfit(spark, SF))
    # the per-user lead window plus the two-level bucketed cumsum
    assert plan.count("Window") >= 2
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# aic_model_select
# ---------------------------------------------------------------------------


def _qsum(counter):
    return sum(
        math.floor(c * math.log(c) * 1e6 + 0.5) for c in counter.values()
    )


def test_aic_matches_local(spark):
    cells = collections.Counter()
    for r in _docs(spark):
        toks = _tokens(r["text"])
        for u, w in zip(toks, toks[1:]):
            cells[(u, w)] += 1
    ctx = collections.Counter()
    marg = collections.Counter()
    for (u, w), c in cells.items():
        ctx[u] += c
        marg[w] += c
    nbg = sum(cells.values())
    qc, qu, qw = _qsum(cells), _qsum(ctx), _qsum(marg)
    qn = math.floor(nbg * math.log(nbg) * 1e6 + 0.5)
    llu_u, llb_u = qw - qn, qc - qu
    row = q_aic_model_select(spark, SF).collect()[0]
    assert row["nbg"] == nbg
    assert row["n_types"] == len(marg)
    assert row["n_cells"] == len(cells)
    assert row["n_contexts"] == len(ctx)
    assert row["ll_uni"] == llu_u / 1e6
    assert row["ll_bi"] == llb_u / 1e6
    assert row["aic_uni"] == (2 * (len(marg) - 1) * 1_000_000 - 2 * llu_u) / 1e6
    assert row["aic_bi"] == (
        2 * (len(cells) - len(ctx)) * 1_000_000 - 2 * llb_u
    ) / 1e6
    want = (
        "bigram"
        if row["aic_bi"] < row["aic_uni"]
        else "unigram"
    )
    assert row["winner"] == want


def test_aic_likelihood_ordering_and_plan(spark):
    row = q_aic_model_select(spark, SF).collect()[0]
    # the bigram model can never have lower likelihood than unigram
    assert row["ll_bi"] >= row["ll_uni"]
    assert row["ll_uni"] <= 0.0
    plan = _plan_of(q_aic_model_select(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# capture_recapture
# ---------------------------------------------------------------------------


def test_capture_recapture_matches_local(spark):
    even, odd = set(), set()
    for r in _docs(spark):
        tgt = even if r["doc_id"] % 2 == 0 else odd
        tgt.update(_tokens(r["text"]))
    na, nb = len(even), len(odd)
    m = len(even & odd)
    v = len(even | odd)
    chap = (na + 1) * (nb + 1) / (m + 1) - 1.0
    row = q_capture_recapture(spark, SF).collect()[0]
    assert row["n_types_observed"] == v
    assert row["n_types_even"] == na
    assert row["n_types_odd"] == nb
    assert row["n_types_both"] == m
    assert row["chapman_estimate"] == _micro(chap)
    assert row["coverage"] == _micro(v / chap)


def test_capture_recapture_bounds_and_plan(spark):
    row = q_capture_recapture(spark, SF).collect()[0]
    # the estimate can't fall below either capture
    assert row["chapman_estimate"] >= max(
        row["n_types_even"], row["n_types_odd"]
    ) - 1
    plan = _plan_of(q_capture_recapture(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave43_registered():
    for name in (
        "ipw_effect",
        "rendezvous_shards",
        "interarrival_expfit",
        "aic_model_select",
        "capture_recapture",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
