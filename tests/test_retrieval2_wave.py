"""Semantics tests for the wave-57 retrieval-scoring entries: RBP@K,
ERR@K, Dirichlet query likelihood, MinDist term proximity, and query
clarity.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against an independent single-node recomputation
plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_retrieval2 import (
    _ERR_G1_TF,
    _ERR_G2_TF,
    _ERR_K,
    _ERR_L,
    _ERR_Q,
    _ERR_SCALE,
    _QC_K,
    _QC_Q,
    _QL_K,
    _QL_MU,
    _QL_Q,
    _RBP_K,
    _RBP_P_NUM,
    _RBP_Q,
    _RBP_REL_LANG,
    _RBP_REL_TF,
    _RBP_SCALE,
    _TP_K,
    _TP_PAIRS,
    q_err_eval,
    q_ql_dirichlet,
    q_query_clarity,
    q_rbp_eval,
    q_term_proximity,
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


def _docs(spark):
    rows = Q._t(spark, SF, "documents").select(
        "doc_id", "text", "lang"
    ).collect()
    toks = {
        r["doc_id"]: [t for t in (r["text"] or "").split(" ") if t != ""]
        for r in rows
    }
    lang = {r["doc_id"]: r["lang"] for r in rows}
    return toks, lang


def _postings_local(toks):
    post = collections.Counter()
    for d, ts in toks.items():
        for t in ts:
            post[(d, t)] += 1
    return post


def _top_terms(post, n):
    df = collections.Counter(t for (_, t) in post)
    return sorted(df, key=lambda t: (-df[t], t))[:n]


def _ranked_docs(post, term):
    docs = sorted(
        ((d, tf) for (d, t), tf in post.items() if t == term),
        key=lambda x: (-x[1], x[0]),
    )
    return docs


# ---------------------------------------------------------------------------
# rbp_eval
# ---------------------------------------------------------------------------


def _rbp_local(spark):
    toks, lang = _docs(spark)
    post = _postings_local(toks)
    out = {}
    for qt in _top_terms(post, _RBP_Q):
        ranked = _ranked_docs(post, qt)[:_RBP_K]
        gain = n_rel = 0
        for i, (d, tf) in enumerate(ranked, start=1):
            rel = int(tf >= _RBP_REL_TF and lang[d] == _RBP_REL_LANG)
            n_rel += rel
            gain += rel * _RBP_P_NUM ** (i - 1) * 5 ** (_RBP_K - i)
        out[qt] = (
            n_rel,
            _halfup(1_000_000 * gain, _RBP_SCALE),
            _halfup(
                1_000_000 * (gain + _RBP_P_NUM**_RBP_K), _RBP_SCALE
            ),
        )
    return out


def test_rbp_matches_local(spark):
    want = _rbp_local(spark)
    got = {
        r["tok"]: (r["n_rel_topk"], r["rbp_micro"], r["rbp_max_micro"])
        for r in q_rbp_eval(spark, SF).collect()
    }
    assert got == want


def test_rbp_bounds(spark):
    rows = q_rbp_eval(spark, SF).collect()
    assert len(rows) == _RBP_Q
    resid = _halfup(1_000_000 * _RBP_P_NUM**_RBP_K, _RBP_SCALE)
    for r in rows:
        assert 0 <= r["rbp_micro"] <= 1_000_000
        # upper bound = score + the exact residual (up to rounding)
        assert abs(
            r["rbp_max_micro"] - r["rbp_micro"] - resid
        ) <= 1


def test_rbp_plan_no_cartesian(spark):
    plan = _plan_of(q_rbp_eval(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# err_eval
# ---------------------------------------------------------------------------


def _err_local(spark):
    toks, lang = _docs(spark)
    post = _postings_local(toks)
    out = {}
    for qt in _top_terms(post, _ERR_Q):
        ranked = _ranked_docs(post, qt)[:_ERR_K]
        s = 0
        surv = 1
        n_rel = 0
        for i, (d, tf) in enumerate(ranked, start=1):
            if tf >= _ERR_G2_TF and lang[d] == _RBP_REL_LANG:
                q = 3
            elif tf >= _ERR_G1_TF:
                q = 1
            else:
                q = 0
            n_rel += q > 0
            s += (_ERR_L // i) * q * 4 ** (_ERR_K - i) * surv
            surv *= 4 - q
        out[qt] = (n_rel, _halfup(1_000_000 * s, _ERR_SCALE))
    return out


def test_err_matches_local(spark):
    want = _err_local(spark)
    got = {
        r["tok"]: (r["n_rel_topk"], r["err_micro"])
        for r in q_err_eval(spark, SF).collect()
    }
    assert got == want


def test_err_dominated_by_map_like_bound(spark):
    rows = q_err_eval(spark, SF).collect()
    assert len(rows) == _ERR_Q
    for r in rows:
        # ERR lives in [0, 1]; zero iff no relevant doc in the top K
        assert 0 <= r["err_micro"] <= 1_000_000
        assert (r["err_micro"] == 0) == (r["n_rel_topk"] == 0)


def test_err_plan_no_cartesian(spark):
    plan = _plan_of(q_err_eval(spark, SF))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# ql_dirichlet
# ---------------------------------------------------------------------------


def _ql_local(spark):
    toks, _lang = _docs(spark)
    post = _postings_local(toks)
    cf = collections.Counter()
    doclen = collections.Counter()
    for (d, t), tf in post.items():
        cf[t] += tf
        doclen[d] += tf
    t_tok = sum(cf.values())
    out = {}
    for qt in _top_terms(post, _QL_Q):
        scored = []
        for d, tf in _ranked_docs(post, qt):
            s = math.log(
                (tf + _QL_MU * (cf[qt] / t_tok)) / float(doclen[d] + _QL_MU)
            )
            sm = math.floor(s * 1e6 + 0.5)
            scored.append((d, tf, doclen[d], sm))
        scored.sort(key=lambda x: (-x[3], x[0]))
        out[qt] = [
            (i + 1, d, tf, ln, sm)
            for i, (d, tf, ln, sm) in enumerate(scored[:_QL_K])
        ]
    return out


def test_ql_dirichlet_matches_local(spark):
    want = _ql_local(spark)
    got = collections.defaultdict(list)
    for r in (
        q_ql_dirichlet(spark, SF).orderBy("tok", "rnk").collect()
    ):
        got[r["tok"]].append(
            (r["rnk"], r["doc_id"], r["tf"], r["len"], r["score_micro"])
        )
    assert dict(got) == want


def test_ql_dirichlet_scores_negative_and_ranked(spark):
    rows = q_ql_dirichlet(spark, SF).collect()
    assert len(rows) == _QL_Q * _QL_K
    per = collections.defaultdict(list)
    for r in rows:
        # log-probability of a single term is always < 0
        assert r["score_micro"] < 0
        per[r["tok"]].append((r["rnk"], r["score_micro"]))
    for seq in per.values():
        seq.sort()
        scores = [s for _, s in seq]
        assert scores == sorted(scores, reverse=True)


def test_ql_dirichlet_plan_broadcasts(spark):
    plan = _plan_of(q_ql_dirichlet(spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# term_proximity
# ---------------------------------------------------------------------------


def _proximity_local(spark):
    toks, _lang = _docs(spark)
    post = _postings_local(toks)
    top = _top_terms(post, 2 * _TP_PAIRS)
    out = {}
    for pid in range(1, _TP_PAIRS + 1):
        ta, tb = top[2 * pid - 2], top[2 * pid - 1]
        dists = []
        for d, ts in toks.items():
            pa = [i + 1 for i, t in enumerate(ts) if t == ta]
            pb = [i + 1 for i, t in enumerate(ts) if t == tb]
            if pa and pb:
                md = min(abs(x - y) for x in pa for y in pb)
                dists.append((d, md))
        dists.sort(key=lambda x: (x[1], x[0]))
        out[pid] = (ta, tb, [
            (i + 1, d, md) for i, (d, md) in enumerate(dists[:_TP_K])
        ])
    return out


def test_term_proximity_matches_local(spark):
    want = _proximity_local(spark)
    got = collections.defaultdict(lambda: [None, None, []])
    for r in (
        q_term_proximity(spark, SF).orderBy("pair_id", "rnk").collect()
    ):
        g = got[r["pair_id"]]
        g[0], g[1] = r["term_a"], r["term_b"]
        g[2].append((r["rnk"], r["doc_id"], r["min_dist"]))
    assert {k: tuple(v) for k, v in got.items()} == want


def test_term_proximity_sides_and_order(spark):
    rows = q_term_proximity(spark, SF).collect()
    assert len(rows) <= _TP_PAIRS * _TP_K
    for r in rows:
        assert r["term_a"] != r["term_b"]
        assert r["min_dist"] >= 1


def test_term_proximity_plan_prunes_scan(spark):
    plan = _plan_of(q_term_proximity(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# query_clarity
# ---------------------------------------------------------------------------


def _clarity_local(spark):
    toks, _lang = _docs(spark)
    post = _postings_local(toks)
    cf = collections.Counter()
    for (_, t), tf in post.items():
        cf[t] += tf
    t_tok = sum(cf.values())
    out = {}
    for qt in _top_terms(post, _QC_Q):
        rset = [d for d, _ in _ranked_docs(post, qt)[:_QC_K]]
        rtf = collections.Counter()
        for d in rset:
            for t in toks[d]:
                rtf[t] += 1
        lenr = sum(rtf.values())
        s = 0
        for t, tfr in rtf.items():
            c = (tfr / lenr) * math.log(tfr * t_tok / (lenr * cf[t]))
            s += math.floor(c * 1e6 + 0.5)
        out[qt] = (len(rtf), s)
    return out


def test_query_clarity_matches_local(spark):
    want = _clarity_local(spark)
    got = {
        r["tok"]: (r["vocab_r"], r["clarity_micro"])
        for r in q_query_clarity(spark, SF).collect()
    }
    assert got == want


def test_query_clarity_positive(spark):
    # KL(P_R || P_C) >= 0 up to per-term micro rounding slack
    rows = q_query_clarity(spark, SF).collect()
    assert len(rows) == _QC_Q
    for r in rows:
        assert r["clarity_micro"] > -r["vocab_r"]


def test_query_clarity_plan_no_cartesian(spark):
    plan = _plan_of(q_query_clarity(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
