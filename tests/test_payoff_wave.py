"""Semantics tests for the wave-32 pipeline-payoff entries: PQ code
assignment, CDC chunk-dedup ratio, near-dup token savings, one-way
ANOVA across sources, and Kneser–Ney bigram scoring.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op against
an independent single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math
import re

import numpy as np

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_payoff import (
    _KN_D,
    _PQ_KS,
    _PQ_M,
    q_ann_pq_codes,
    q_anova_f_source,
    q_cdc_dedup_ratio,
    q_dedup_token_savings,
    q_kn_bigram_logprob,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _r(v: float) -> int:
    # HALF_UP on a non-negative value
    return int(math.floor(v + 0.5))


def _q_neg(v: float) -> int:
    # HALF_UP away from zero on a NEGATIVE value (the lp_micro rule)
    return int(-math.floor(-v * 1e6 + 0.5))


def _docs(spark):
    return Q._t(spark, SF, "documents").select("doc_id", "text", "source").collect()


# ---------------------------------------------------------------------------
# ann_pq_codes
# ---------------------------------------------------------------------------


def test_ann_pq_codes_matches_naive(spark):
    rows = Q._t(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    cents = sorted(
        (r["vec_id"], np.array([float(x) for x in r["embedding"]], dtype="float64"))
        for r in rows
        if r["vec_id"] < _PQ_KS
    )
    dim = len(rows[0]["embedding"])
    sub = dim // _PQ_M
    expect = {}
    for r in rows:
        v = np.array([float(x) for x in r["embedding"]], dtype="float64")
        for s in range(_PQ_M):
            lo, hi = s * sub, (s + 1) * sub
            best = None
            for cid, c in cents:
                d = v[lo:hi] - c[lo:hi]
                d2q = int(np.floor(d * d * 1e9 + 0.5).astype("int64").sum())
                if best is None or (d2q, cid) < best:
                    best = (d2q, cid)
            expect[(r["vec_id"], s)] = (best[1], best[0])
    got = {
        (r["vec_id"], r["subspace"]): (r["code"], r["d2q"])
        for r in q_ann_pq_codes(spark, SF).collect()
    }
    assert got == expect
    # seed vectors encode to themselves with zero distortion
    for (vid, s), (code, d2q) in got.items():
        if vid < _PQ_KS:
            assert code == vid and d2q == 0


def test_ann_pq_codes_plan_is_map_side_only(spark):
    plan = _plan_of(q_ann_pq_codes(spark, SF))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Join" not in plan
    # the scan rebalance is the ONLY exchange — codes are emitted, not
    # re-aggregated
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


# ---------------------------------------------------------------------------
# cdc_dedup_ratio
# ---------------------------------------------------------------------------


def test_cdc_dedup_ratio_matches_chunk_stream(spark):
    from occular_ocr_spark.queries_curation import q_cdc_chunks

    chunks = [r["chunk"] for r in q_cdc_chunks(spark, SF).collect()]
    cnt = collections.Counter(chunks)
    total = sum(len(c) for c in chunks)
    unique = sum(len(c) for c in cnt)
    row = q_cdc_dedup_ratio(spark, SF).collect()[0]
    assert row["n_chunks"] == len(chunks)
    assert row["n_unique_chunks"] == len(cnt)
    assert row["total_chars"] == total
    assert row["unique_chars"] == unique
    assert row["saved_micro"] == (
        (2 * 1000000 * (total - unique) + total) // (2 * total) if total else 0
    )


# ---------------------------------------------------------------------------
# dedup_token_savings
# ---------------------------------------------------------------------------


def test_dedup_token_savings_matches_groups(spark):
    from occular_ocr_spark.queries_ext import q_dedup_groups

    labels = {
        r["doc_id"]: r["group_id"] for r in q_dedup_groups(spark, SF).collect()
    }
    ntoks = {
        r["doc_id"]: len((r["text"] or "").split(" ")) for r in _docs(spark)
    }
    per = collections.defaultdict(list)
    for doc, grp in labels.items():
        per[grp].append(doc)
    expect = {
        g: (
            len(m),
            sum(ntoks[d] for d in m),
            ntoks[g],
        )
        for g, m in per.items()
        if len(m) >= 2
    }
    got = {r["group_id"]: r for r in q_dedup_token_savings(spark, SF).collect()}
    assert set(got) == set(expect) and expect  # fixture has dup groups
    for g, (n, tot, canon) in expect.items():
        r = got[g]
        assert (r["n_members"], r["total_tokens"], r["canonical_tokens"]) == (
            n, tot, canon,
        )
        assert r["saved_tokens"] == tot - canon
        # the canonical member is the group label itself (min doc_id)
        assert g == min(per[g])


# ---------------------------------------------------------------------------
# anova_f_source
# ---------------------------------------------------------------------------


def test_anova_f_source_matches_naive(spark):
    lens = collections.defaultdict(list)
    for r in Q._t(spark, SF, "documents").select("source", "n_chars").collect():
        lens[r["source"] or ""].append(r["n_chars"])
    sum_t = sum(
        _r(sum(v) * sum(v) / len(v) * 1e6) for v in lens.values()
    )
    s_all = sum(sum(v) for v in lens.values())
    ss_all = sum(x * x for v in lens.values() for x in v)
    n = sum(len(v) for v in lens.values())
    k = len(lens)
    ssb = sum_t - _r(s_all * s_all / n * 1e6)
    ssw = _r(ss_all * 1e6) - sum_t
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = q_anova_f_source(spark, SF).collect()[0]
    assert row["k_groups"] == k and row["n_docs"] == n
    assert row["ssb_micro"] == ssb
    assert row["ssw_micro"] == ssw
    assert abs(row["f_stat"] - round(f, 6)) < 1e-9
    # scipy-free sanity: F must be positive and finite on the fixture
    assert row["f_stat"] > 0


def test_anova_f_single_scan_two_aggregates(spark):
    plan = _plan_of(q_anova_f_source(spark, SF))
    assert "Join" not in plan
    # group moments + 1-row reduce: exactly two exchanges
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2


# ---------------------------------------------------------------------------
# kn_bigram_logprob
# ---------------------------------------------------------------------------


def test_kn_bigram_logprob_matches_naive(spark):
    docs = {r["doc_id"]: (r["text"] or "") for r in _docs(spark)}
    bigrams = collections.defaultdict(list)
    c2 = collections.Counter()
    for did, t in docs.items():
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            bigrams[did].append((toks[i], toks[i + 1]))
            c2[(toks[i], toks[i + 1])] += 1
    c1 = collections.Counter()
    n1f = collections.Counter()
    n1b = collections.Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    types = len(c2)
    got = {r["doc_id"]: r for r in q_kn_bigram_logprob(spark, SF).collect()}
    expect_docs = {d for d, bgs in bigrams.items() if bgs}
    assert set(got) == expect_docs
    for did in expect_docs:
        lps = []
        for w1, w2 in bigrams[did]:
            p = max(c2[(w1, w2)] - _KN_D, 0.0) / c1[w1] + _KN_D * n1f[w1] / c1[
                w1
            ] * (n1b[w2] / types)
            lps.append(_q_neg(math.log2(p)))
        g = got[did]
        assert g["n_bigrams"] == len(lps)
        assert g["sum_lp_micro"] == sum(lps)
        # negative mean rounds away from zero on both engines
        mean = sum(lps) / len(lps)
        r = math.floor(mean + 0.5) if mean >= 0 else -math.floor(-mean + 0.5)
        assert g["mean_lp_micro"] == r


def test_kn_probabilities_sum_to_one_for_a_context(spark):
    # the KN distribution must be a proper conditional distribution:
    # sum over observed w2 of P(w2|w1) + backoff mass of unseen w2 == 1
    docs = {r["doc_id"]: (r["text"] or "") for r in _docs(spark)}
    c2 = collections.Counter()
    for t in docs.values():
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            c2[(toks[i], toks[i + 1])] += 1
    c1 = collections.Counter()
    n1f = collections.Counter()
    n1b = collections.Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    types = len(c2)
    w1 = max(c1, key=lambda w: c1[w])  # the richest context
    seen_mass = sum(
        max(c - _KN_D, 0.0) / c1[w1]
        for (a, _), c in c2.items()
        if a == w1
    )
    # interpolation mass spreads d·N1+(w1,·)/c(w1·) over Pcont, which
    # sums to 1 over the whole vocab
    backoff = _KN_D * n1f[w1] / c1[w1]
    cont_total = sum(n1b.values()) / types  # == 1 by construction
    assert abs(cont_total - 1.0) < 1e-12
    assert abs(seen_mass + backoff - 1.0) < 1e-9
