"""Semantics tests for the wave-56 retrieval-engineering &
sequential-monitoring entries: Rocchio PRF expansion, integer-exact
TextRank keywords, the JL random-projection distortion audit, the
retrieval-diversity (result-set redundancy) panel, and the
Page-Hinkley drift monitor.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_ragops import (
    _JL_D,
    _JL_N,
    _PH_DELTA_MICRO,
    _PH_LAMBDA_MICRO,
    _RD_K,
    _RD_Q,
    _RX_BETA_PPM,
    _RX_GAMMA_PPM,
    _RX_R,
    _RX_TOP,
    _TR_D_DEN,
    _TR_D_NUM,
    _TR_ITERS,
    _TR_TELEPORT_NANO,
    _TR_TOP,
    q_jl_projection,
    q_page_hinkley,
    q_retrieval_diversity,
    q_rocchio_expansion,
    q_textrank_keywords,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _halfup(a: int, b: int) -> int:
    # positive-operand half-up integer division (both engines' contract)
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _doc_tokens(spark):
    rows = Q._t(spark, SF, "documents").select("doc_id", "text").collect()
    return {
        r["doc_id"]: [t for t in (r["text"] or "").split(" ") if t != ""]
        for r in rows
    }


def _postings_local(spark):
    post = collections.Counter()
    for doc_id, toks in _doc_tokens(spark).items():
        for t in toks:
            post[(doc_id, t)] += 1
    return post


# ---------------------------------------------------------------------------
# rocchio_expansion
# ---------------------------------------------------------------------------


def _rocchio_local(spark):
    post = _postings_local(spark)
    n_docs = len(_doc_tokens(spark))
    df = collections.Counter(t for (_, t) in post)
    qt = min(df, key=lambda t: (-df[t], t))
    qpost = sorted(
        ((d, tf) for (d, t), tf in post.items() if t == qt),
        key=lambda x: (-x[1], x[0]),
    )
    rdocs = {d for d, _ in qpost[:_RX_R]}
    n_r, n_nr = len(rdocs), n_docs - len(rdocs)
    s_rel = collections.Counter()
    s_tot = collections.Counter()
    for (d, t), tf in post.items():
        s_tot[t] += tf
        if d in rdocs:
            s_rel[t] += tf
    out = []
    for t, st in s_tot.items():
        if t == qt:
            continue
        sr = s_rel.get(t, 0)
        w_num = _RX_BETA_PPM * sr * n_nr - _RX_GAMMA_PPM * (st - sr) * n_r
        if w_num > 0:
            out.append((t, sr, st - sr, _halfup(w_num, n_r * n_nr)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:_RX_TOP]


def test_rocchio_matches_local(spark):
    want = _rocchio_local(spark)
    got = [
        (r["tok"], r["s_rel"], r["s_nonrel"], r["w_micro"])
        for r in q_rocchio_expansion(spark, SF).collect()
    ]
    assert got == want


def test_rocchio_weights_positive_and_bounded(spark):
    rows = q_rocchio_expansion(spark, SF).collect()
    assert 0 < len(rows) <= _RX_TOP
    ws = [r["w_micro"] for r in rows]
    assert all(w > 0 for w in ws)
    assert ws == sorted(ws, reverse=True)


def test_rocchio_plan_broadcasts_no_cartesian(spark):
    plan = _plan_of(q_rocchio_expansion(spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# textrank_keywords
# ---------------------------------------------------------------------------


def _textrank_local(spark):
    adj = collections.Counter()
    for toks in _doc_tokens(spark).values():
        for a, b in zip(toks, toks[1:]):
            if a != b:
                adj[(a, b)] += 1
                adj[(b, a)] += 1
    strength = collections.Counter()
    for (u, _v), w in adj.items():
        strength[u] += w
    nv = len(strength)
    ranks = {u: _halfup(1_000_000_000, nv) for u in strength}
    for _ in range(_TR_ITERS):
        s = collections.Counter()
        for (u, v), w in adj.items():
            s[v] += _halfup(ranks[u] * w, strength[u])
        ranks = {
            v: _halfup(_TR_TELEPORT_NANO, nv)
            + _halfup(_TR_D_NUM * sv, _TR_D_DEN)
            for v, sv in s.items()
        }
    top = sorted(ranks.items(), key=lambda x: (-x[1], x[0]))[:_TR_TOP]
    return top


def test_textrank_matches_local(spark):
    want = _textrank_local(spark)
    got = [
        (r["tok"], r["rank_nano"])
        for r in q_textrank_keywords(spark, SF).collect()
    ]
    assert got == want


def test_textrank_ranks_are_nano_scale(spark):
    rows = q_textrank_keywords(spark, SF).collect()
    assert len(rows) == _TR_TOP
    # each rank at least the teleport floor, and far below the total mass
    for r in rows:
        assert r["rank_nano"] > 0
        assert r["rank_nano"] < 1_000_000_000


def test_textrank_plan_partial_agg_no_cartesian(spark):
    plan = _plan_of(q_textrank_keywords(spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "partial_count" in plan


# ---------------------------------------------------------------------------
# jl_projection
# ---------------------------------------------------------------------------


def _sign(j: int, k: int) -> int:
    h = hashlib.md5(f"{j}:{k}:jl".encode()).hexdigest()[0]
    return 1 if int(h, 16) % 2 == 0 else -1


def _jl_local(spark):
    import math

    rows = (
        Q._t(spark, SF, "embeddings")
        .where(f"vec_id < {_JL_N}")
        .select("vec_id", "embedding")
        .collect()
    )
    xm = {
        r["vec_id"]: [
            math.floor(float(x) * 1e6 + 0.5) for x in r["embedding"]
        ]
        for r in rows
    }
    nd = max(len(v) for v in xm.values())
    proj = {
        v: [
            sum(_sign(j + 1, k + 1) * x[j] for j in range(len(x)))
            for k in range(_JL_D)
        ]
        for v, x in xm.items()
    }
    ratios = []
    ids = sorted(xm)
    for i, va in enumerate(ids):
        for vb in ids[i + 1 :]:
            d2o = sum((a - b) ** 2 for a, b in zip(xm[va], xm[vb]))
            d2p = sum((a - b) ** 2 for a, b in zip(proj[va], proj[vb]))
            if d2o == 0:
                continue
            ratios.append(_halfup(1_000_000 * d2p, _JL_D * d2o))
    mean = _halfup(sum(ratios), len(ratios))
    return len(ratios), min(ratios), max(ratios), mean, nd


def test_jl_projection_matches_local(spark):
    n_pairs, mn, mx, mean, _nd = _jl_local(spark)
    row = q_jl_projection(spark, SF).collect()[0]
    assert row["n_pairs"] == n_pairs
    assert row["min_ratio_micro"] == mn
    assert row["max_ratio_micro"] == mx
    assert row["mean_ratio_micro"] == mean


def test_jl_projection_distortion_centered(spark):
    # E[ratio] = 1 for a +-1 JL matrix; the audit must land in a sane band
    row = q_jl_projection(spark, SF).collect()[0]
    assert row["n_pairs"] == _JL_N * (_JL_N - 1) // 2
    assert 0 < row["min_ratio_micro"] <= row["mean_ratio_micro"]
    assert row["mean_ratio_micro"] <= row["max_ratio_micro"]
    assert 300_000 < row["mean_ratio_micro"] < 3_000_000


def test_jl_projection_pushes_sample_filter(spark):
    plan = _plan_of(q_jl_projection(spark, SF))
    assert "embeddings" in plan
    assert "PushedFilters" in plan and "vec_id" in plan


# ---------------------------------------------------------------------------
# retrieval_diversity
# ---------------------------------------------------------------------------


def _diversity_local(spark):
    post = _postings_local(spark)
    df = collections.Counter(t for (_, t) in post)
    qterms = sorted(df, key=lambda t: (-df[t], t))[:_RD_Q]
    by_tok = collections.defaultdict(list)
    for (d, t), tf in post.items():
        by_tok[t].append((d, tf))
    toksets = collections.defaultdict(set)
    for (d, t) in post:
        toksets[d].add(t)
    out = {}
    for qt in qterms:
        docs = [
            d
            for d, _tf in sorted(by_tok[qt], key=lambda x: (-x[1], x[0]))[
                :_RD_K
            ]
        ]
        docs = sorted(docs)
        jacs = []
        for i, da in enumerate(docs):
            for db in docs[i + 1 :]:
                inter = len(toksets[da] & toksets[db])
                union = len(toksets[da]) + len(toksets[db]) - inter
                jacs.append(_halfup(1_000_000 * inter, union))
        out[qt] = (len(jacs), _halfup(sum(jacs), len(jacs)))
    return out


def test_retrieval_diversity_matches_local(spark):
    want = _diversity_local(spark)
    got = {
        r["tok"]: (r["n_pairs"], r["mean_jaccard_micro"])
        for r in q_retrieval_diversity(spark, SF).collect()
    }
    assert got == want


def test_retrieval_diversity_shape(spark):
    rows = q_retrieval_diversity(spark, SF).collect()
    assert len(rows) == _RD_Q
    for r in rows:
        assert r["n_pairs"] == _RD_K * (_RD_K - 1) // 2
        assert 0 <= r["mean_jaccard_micro"] <= 1_000_000


def test_retrieval_diversity_plan_no_cartesian(spark):
    plan = _plan_of(q_retrieval_diversity(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# page_hinkley
# ---------------------------------------------------------------------------


def _ph_local(spark):
    import math

    rows = (
        Q._t(spark, SF, "events")
        .selectExpr(
            "CAST(ts AS DATE) AS day", "CAST(value AS DOUBLE) AS value"
        )
        .collect()
    )
    daily = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        d = daily[r["day"]]
        d[0] += 1
        d[1] += math.floor(r["value"] * 1e6 + 0.5)
    days = sorted(daily)
    out = []
    sx = t = m = 0
    mmin = None
    for day in days:
        n_d, s_d = daily[day]
        x = _halfup(s_d, n_d)
        sx += x
        t += 1
        xbar = _halfup(sx, t)
        m += x - xbar - _PH_DELTA_MICRO
        mmin = m if mmin is None else min(mmin, m)
        out.append((day, x, m, mmin, m - mmin > _PH_LAMBDA_MICRO))
    return out


def test_page_hinkley_matches_local(spark):
    want = _ph_local(spark)
    got = [
        (r["day"], r["day_mean_micro"], r["ph_m"], r["ph_min"], r["alarm"])
        for r in q_page_hinkley(spark, SF)
        .orderBy("day")
        .collect()
    ]
    assert got == want


def test_page_hinkley_invariants(spark):
    rows = q_page_hinkley(spark, SF).orderBy("day").collect()
    assert len(rows) > 0
    prev_min = None
    for r in rows:
        # M_t is the running min of m_t: non-increasing, <= m_t
        assert r["ph_min"] <= r["ph_m"]
        if prev_min is not None:
            assert r["ph_min"] <= prev_min
        prev_min = r["ph_min"]
        assert r["alarm"] == (r["ph_m"] - r["ph_min"] > _PH_LAMBDA_MICRO)


def test_page_hinkley_collapses_before_windows(spark):
    # windows order only the <=#days frame: one partial agg on the scan side
    plan = _plan_of(q_page_hinkley(spark, SF))
    assert plan.count("events.parquet") == 1
    assert "partial_sum" in plan or "partial_count" in plan
