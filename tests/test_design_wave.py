"""Semantics tests for the wave-46 design entries: 2-iteration GMM
EM, Shannon code audit, TextTiling boundaries, upper-tail dependence,
and Neyman allocation.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_design import (
    _EM_ITERS,
    _NA_BUDGET,
    q_gmm_em2,
    q_neyman_allocation,
    q_shannon_code_audit,
    q_tail_dependence,
    q_texttiling_boundaries,
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
        .select("doc_id", "text", "source", "n_chars")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# gmm_em2
# ---------------------------------------------------------------------------


def test_gmm_matches_local(spark):
    vals = [float(r["n_chars"]) for r in _docs(spark)]
    hist = collections.Counter(vals)
    n = len(vals)
    # quartile init + fixed shared variance
    cum = 0
    mu1 = mu2 = None
    for v in sorted(hist):
        cum += hist[v]
        if mu1 is None and cum >= (n + 1) // 4:
            mu1 = v
        if mu2 is None and cum >= (3 * n + 3) // 4:
            mu2 = v
    sv = sum(m * v for v, m in hist.items())
    svv = sum(m * v * v for v, m in hist.items())
    var = max(1.0, _micro(svv / n - (sv / n) ** 2))
    w1 = 0.5
    for _ in range(_EM_ITERS):
        c1 = s1 = c2 = s2 = 0
        for v, m in hist.items():
            e1 = math.exp(-((v - mu1) ** 2) / (2.0 * var))
            e2 = math.exp(-((v - mu2) ** 2) / (2.0 * var))
            rq = math.floor(w1 * e1 / (w1 * e1 + (1 - w1) * e2) * 1e6 + 0.5)
            c1 += m * rq
            s1 += m * rq * v
            c2 += m * (1_000_000 - rq)
            s2 += m * (1_000_000 - rq) * v
        mu1 = math.floor(s1 / max(c1, 1) * 1e6 + 0.5) / 1e6
        mu2 = math.floor(s2 / max(c2, 1) * 1e6 + 0.5) / 1e6
        w1 = math.floor(c1 / (c1 + c2) * 1e6 + 0.5) / 1e6
    row = q_gmm_em2(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["mu1"] == mu1
    assert row["mu2"] == mu2
    assert row["w1"] == w1
    assert row["sigma"] == _micro(math.sqrt(var))


def test_gmm_component_separation(spark):
    row = q_gmm_em2(spark, SF).collect()[0]
    # quartile seeding keeps component 1 below component 2
    assert row["mu1"] < row["mu2"]
    assert 0.0 < row["w1"] < 1.0
    plan = _plan_of(q_gmm_em2(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# shannon_code_audit
# ---------------------------------------------------------------------------


def test_shannon_matches_local(spark):
    per = collections.Counter((r["source"] or "") for r in _docs(spark))
    n = sum(per.values())
    lens = {
        g: math.ceil(math.log(n / c) / math.log(2.0))
        for g, c in per.items()
    }
    slen = sum(per[g] * lens[g] for g in per)
    qsum = sum(
        math.floor(c * math.log(c) / math.log(2.0) * 1e6 + 0.5)
        for c in per.values()
    )
    entropy = _micro(
        (n * math.log(n) / math.log(2.0) - qsum / 1e6) / n
    )
    kraft = sum(2.0 ** (-lens[g]) for g in per)
    row = q_shannon_code_audit(spark, SF).collect()[0]
    assert row["n_sources"] == len(per)
    assert row["n"] == n
    assert row["max_len"] == max(lens.values())
    assert row["entropy_bits"] == entropy
    assert row["expected_len"] == _micro(slen / n)
    assert row["kraft_sum"] == _micro(kraft)
    assert row["kraft_ok"] == (kraft <= 1.0)


def test_shannon_source_coding_bounds(spark):
    row = q_shannon_code_audit(spark, SF).collect()[0]
    # Shannon code: H <= E[len] < H + 1, and Kraft holds
    assert row["entropy_bits"] <= row["expected_len"]
    assert row["expected_len"] < row["entropy_bits"] + 1.0
    assert row["kraft_ok"]
    assert 0.0 <= row["redundancy"] < 1.0
    plan = _plan_of(q_shannon_code_audit(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# texttiling_boundaries
# ---------------------------------------------------------------------------


def test_texttiling_matches_local(spark):
    by_src = collections.defaultdict(list)
    for r in sorted(_docs(spark), key=lambda r: r["doc_id"]):
        by_src[r["source"] or ""].append(set(_tokens(r["text"])))
    want = {}
    for g, seqs in by_src.items():
        sims = []
        for a, b in zip(seqs, seqs[1:]):
            ix = len(a & b)
            un = len(a) + len(b) - ix
            sims.append((2_000_000 * ix + un) // (2 * un))
        if not sims:
            continue
        np_, s1 = len(sims), sum(sims)
        s2 = sum(s * s for s in sims)
        nb = 0
        if np_ >= 2:
            thr = s1 / np_ - math.sqrt(np_ * s2 - s1 * s1) / np_
            nb = sum(1 for s in sims if s < thr)
        want[g] = (
            np_,
            (2 * s1 + np_) // (2 * np_) / 1e6,
            min(sims) / 1e6,
            nb,
        )
    rows = q_texttiling_boundaries(spark, SF).collect()
    got = {
        r["source"]: (
            r["n_pairs"],
            r["mean_sim"],
            r["min_sim"],
            r["n_boundaries"],
        )
        for r in rows
    }
    assert got == want


def test_texttiling_plan(spark):
    plan = _plan_of(q_texttiling_boundaries(spark, SF))
    assert "PythonUDF" not in plan
    # the rank window must be partitioned by source, never global
    assert "Window" in plan


# ---------------------------------------------------------------------------
# tail_dependence
# ---------------------------------------------------------------------------


def test_tail_dependence_matches_local(spark):
    rows = (
        Q._t(spark, SF, "events").select("ts", "event_type").collect()
    )
    da = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "click"
    )
    db = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    days = sorted(set(da) & set(db))
    avals = [da[d] for d in days]
    bvals = [db[d] for d in days]
    n = len(days)

    def q75(vs):
        r = min(math.ceil(0.75 * (n + 1)), n)
        return sorted(vs)[r - 1]

    qa, qb = q75(avals), q75(bvals)
    n_a = sum(1 for v in avals if v > qa)
    n_b = sum(1 for v in bvals if v > qb)
    n_j = sum(1 for a, b in zip(avals, bvals) if a > qa and b > qb)
    row = q_tail_dependence(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert (row["q_a"], row["q_b"]) == (qa, qb)
    assert (row["n_a_tail"], row["n_b_tail"], row["n_joint"]) == (
        n_a,
        n_b,
        n_j,
    )
    if n_a:
        assert row["lambda_u"] == (2_000_000 * n_j + n_a) // (2 * n_a) / 1e6
    if n_a and n_b:
        assert row["lift"] == _micro((n_j / n_a) / (n_b / n))


def test_tail_dependence_plan(spark):
    row = q_tail_dependence(spark, SF).collect()[0]
    assert 0.0 <= row["lambda_u"] <= 1.0
    plan = _plan_of(q_tail_dependence(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# neyman_allocation
# ---------------------------------------------------------------------------


def test_neyman_matches_local(spark):
    per = collections.defaultdict(list)
    for r in _docs(spark):
        per[r["source"] or ""].append(r["n_chars"])
    t_us, s_hs = {}, {}
    for g, vs in per.items():
        nh = len(vs)
        s1, s2 = sum(vs), sum(v * v for v in vs)
        disc = nh * s2 - s1 * s1
        if nh < 2 or disc <= 0:
            t_us[g], s_hs[g] = 0, 0.0
        else:
            t_us[g] = math.floor(nh * math.sqrt(disc) / nh * 1e6 + 0.5)
            s_hs[g] = math.floor(math.sqrt(disc) / nh * 1e6 + 0.5) / 1e6
    t = sum(t_us.values())
    rows = q_neyman_allocation(spark, SF).collect()
    assert [r["source"] for r in rows] == sorted(per)
    total_alloc = 0
    for r in rows:
        g = r["source"]
        assert r["n_h"] == len(per[g])
        assert r["s_h"] == s_hs[g]
        want_alloc = (2 * _NA_BUDGET * t_us[g] + t) // (2 * t)
        assert r["alloc_n"] == want_alloc
        assert r["share"] == (2_000_000 * t_us[g] + t) // (2 * t) / 1e6
        total_alloc += r["alloc_n"]
    # round-half-up allocations land within k of the budget
    assert abs(total_alloc - _NA_BUDGET) <= len(per)


def test_neyman_plan(spark):
    plan = _plan_of(q_neyman_allocation(spark, SF))
    assert "BroadcastExchange" in plan  # the 1-row total
    assert "Window" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave46_registered():
    for name in (
        "gmm_em2",
        "shannon_code_audit",
        "texttiling_boundaries",
        "tail_dependence",
        "neyman_allocation",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
