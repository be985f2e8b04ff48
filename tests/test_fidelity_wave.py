"""Semantics tests for the wave-31 pair-fidelity entries: verified-pair
Levenshtein similarity, IVF silhouette, tokenizer fertility, OOV rate,
and source-level MinHash similarity.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math
import re

import numpy as np

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_fidelity import (
    _OOV_VOCAB,
    _PES_CAP,
    _SRC_MH_SEEDS,
    q_oov_rate,
    q_pair_edit_similarity,
    q_silhouette_score,
    q_source_minhash_sim,
    q_tokenizer_fertility,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _r(v: float) -> int:
    # HALF_UP on a non-negative value (Spark F.round / numpy floor(v+.5))
    return int(math.floor(v + 0.5))


def _hdiv(num: int, den: int) -> int:
    # the catalog's half-up integer micro-division
    return (2 * 1000000 * num + den) // (2 * den)


def _docs(spark):
    return Q._t(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    ).collect()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


# ---------------------------------------------------------------------------
# pair_edit_similarity
# ---------------------------------------------------------------------------


def test_pair_edit_similarity_matches_naive(spark):
    texts = {
        r["doc_id"]: re.sub(r"[^\x20-\x7e]", "", r["text"] or "")[:_PES_CAP]
        for r in _docs(spark)
    }
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in Q.q_dedup_minhash_verify(spark, SF).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in q_pair_edit_similarity(spark, SF).collect()
    }
    assert set(got) == pairs and pairs  # non-degenerate fixture
    for (a, b), r in got.items():
        sa, sb = texts[a], texts[b]
        lev = _lev(sa, sb)
        mx = max(len(sa), len(sb))
        assert r["lev_dist"] == lev
        assert r["max_len"] == mx
        assert r["sim_micro"] == (_hdiv(mx - lev, mx) if mx else 1000000)
        assert 0 <= r["sim_micro"] <= 1000000


def test_pair_edit_similarity_plan_has_no_cartesian(spark):
    plan = _plan_of(q_pair_edit_similarity(spark, SF))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# silhouette_score
# ---------------------------------------------------------------------------


def test_silhouette_score_matches_naive(spark):
    rows = (
        Q._t(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    cents = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in rows
        if r["vec_id"] < Q._IVF_K
    )
    cmat = np.array([v for _, v in cents], dtype="float64")
    cids = [c for c, _ in cents]
    per_c = collections.defaultdict(list)
    for r in rows:
        v = np.array([float(x) for x in r["embedding"]], dtype="float64")
        d2q = [
            int(np.floor((v - c) * (v - c) * 1e9 + 0.5).astype("int64").sum())
            for c in cmat
        ]
        order = sorted(range(len(cids)), key=lambda i: (d2q[i], cids[i]))
        aq, asg = d2q[order[0]], cids[order[0]]
        bq = d2q[order[1]]
        a, b = math.sqrt(aq), math.sqrt(bq)
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        per_c[asg].append(_r(s * 1e6))
    got = {r["centroid_id"]: r for r in q_silhouette_score(spark, SF).collect()}
    assert set(got) == set(per_c)
    for cid, ss in per_c.items():
        g = got[cid]
        assert g["n_vecs"] == len(ss)
        assert g["min_s_micro"] == min(ss)
        assert g["max_s_micro"] == max(ss)
        assert g["mean_s_micro"] == _r(sum(ss) / len(ss))


def test_silhouette_score_s_is_nonnegative(spark):
    # a is the distance to the NEAREST centroid, so b >= a and s >= 0
    for r in q_silhouette_score(spark, SF).collect():
        assert 0 <= r["min_s_micro"] <= r["max_s_micro"] <= 1000000


def test_silhouette_plan_is_dense_math_not_crossjoin(spark):
    plan = _plan_of(q_silhouette_score(spark, SF))
    # the (n, K) distance matrix lives inside the Arrow kernel — the
    # plan must show exactly one Python/Arrow map stage and no join
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Join" not in plan
    # exactly two exchanges: the scan rebalance + the K-row rollup
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_matches_naive(spark):
    per = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in _docs(spark):
        t = r["text"] or ""
        g = per[r["lang"] or ""]
        g[0] += 1
        g[1] += len(t.split(" "))
        g[2] += len(re.findall(r"\w+|[^\w\s]", t))
        g[3] += len(t.encode("utf-8"))
    got = {r["lang"]: r for r in q_tokenizer_fertility(spark, SF).collect()}
    assert set(got) == set(per)
    for lang, (nd, w, rt, b) in per.items():
        g = got[lang]
        assert (g["n_docs"], g["n_words"], g["n_regex_tokens"], g["n_bytes"]) == (
            nd, w, rt, b,
        )
        assert g["fertility_micro"] == _hdiv(rt, w)
        assert g["bytes_per_tok_micro"] == (_hdiv(b, rt) if rt else 0)


def test_tokenizer_fertility_single_shuffle(spark):
    plan = _plan_of(q_tokenizer_fertility(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# oov_rate
# ---------------------------------------------------------------------------


def test_oov_rate_matches_naive(spark):
    inst = []
    for r in _docs(spark):
        for tok in (r["text"] or "").split(" "):
            if tok:
                inst.append((r["source"] or "", tok))
    cnt = collections.Counter(tok for _, tok in inst)
    vocab = {
        t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_OOV_VOCAB]
    }
    per = collections.defaultdict(lambda: [0, 0])
    for src, tok in inst:
        per[src][0] += 1
        per[src][1] += tok not in vocab
    got = {r["source"]: r for r in q_oov_rate(spark, SF).collect()}
    assert set(got) == set(per)
    for src, (n, oov) in per.items():
        g = got[src]
        assert (g["n_tokens"], g["n_oov"]) == (n, oov)
        assert g["oov_micro"] == _hdiv(oov, n)


def test_oov_vocab_join_is_broadcast(spark):
    plan = _plan_of(q_oov_rate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # vocab selection is a distributed TopK, not a global sort
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# source_minhash_sim
# ---------------------------------------------------------------------------


def test_source_minhash_sim_matches_naive(spark):
    shingles = collections.defaultdict(set)
    for r in _docs(spark):
        toks = (r["text"] or "").split(" ")
        for i in range(len(toks) - 2):
            shingles[r["source"] or ""].add(" ".join(toks[i : i + 3]))
    sig = {
        src: [
            min(hashlib.md5(f"{k}:{sh}".encode()).hexdigest() for sh in shs)
            for k in range(_SRC_MH_SEEDS)
        ]
        for src, shs in shingles.items()
        if shs
    }
    srcs = sorted(sig)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            m = sum(sig[a][k] == sig[b][k] for k in range(_SRC_MH_SEEDS))
            expect[(a, b)] = m
    got = {
        (r["src_a"], r["src_b"]): r
        for r in q_source_minhash_sim(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for key, m in expect.items():
        g = got[key]
        assert g["n_match"] == m
        assert g["est_jaccard_micro"] == (
            2 * 1000000 * m + _SRC_MH_SEEDS
        ) // (2 * _SRC_MH_SEEDS)


def test_source_minhash_estimates_track_true_jaccard(spark):
    # the estimator is unbiased: on the fixture the rank order of the
    # estimates must broadly agree with true source-level Jaccard —
    # pin a weak-but-meaningful correlation rather than exact values
    shingles = collections.defaultdict(set)
    for r in _docs(spark):
        toks = (r["text"] or "").split(" ")
        for i in range(len(toks) - 2):
            shingles[r["source"] or ""].add(" ".join(toks[i : i + 3]))
    got = q_source_minhash_sim(spark, SF).collect()
    diffs = []
    for r in got:
        a, b = shingles[r["src_a"]], shingles[r["src_b"]]
        true_j = len(a & b) / len(a | b)
        diffs.append(abs(r["est_jaccard_micro"] / 1e6 - true_j))
    # K=32 → standard error ~ sqrt(J(1-J)/32) <= 0.09; allow 3 sigma
    assert sum(diffs) / len(diffs) <= 0.12


def test_source_minhash_sig_is_single_aggregation_pass(spark):
    plan = _plan_of(q_source_minhash_sim(spark, SF))
    # the seed fan-out must NOT be a crossJoin row expansion: all K
    # mins are aggregates of ONE shingle pass
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the tiny src<src pair join
