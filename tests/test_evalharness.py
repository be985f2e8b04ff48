"""Eval-harness catalog semantics tests (distributed AUC, calibration
curve, Rank-Biased Overlap).  Gate-level value-hash equality vs DuckDB
is covered by scripts/check_queries.py; these pin the algorithmic
invariants against independent single-node recomputations, plus the
plan shapes that keep each op viable at corpus scale."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_evalharness import (
    _AUC_LABEL_LANG,
    _RBO_IDENT,
    _RBO_K,
    _RBO_P,
    _RBO_W,
    q_auc_rank,
    q_calibration_curve,
    q_rbo_rankings,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# auc_rank
# ---------------------------------------------------------------------------


def test_auc_rank_matches_naive_mann_whitney(spark):
    rows = (
        _t(spark, SF, "documents")
        .select("n_chars", (F.col("lang") == _AUC_LABEL_LANG).alias("y"))
        .collect()
    )
    pos = sorted(r["n_chars"] for r in rows if r["y"])
    neg = sorted(r["n_chars"] for r in rows if not r["y"])
    # O(P*N) literal probabilistic definition on the tiny fixture
    num = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    expect = num / (len(pos) * len(neg))
    out = q_auc_rank(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    # the catalog surface is half-up-rounded to 6 decimals
    assert abs(r["auc"] - expect) <= 5e-7
    assert 0.0 <= r["auc"] <= 1.0


def test_auc_rank_one_class_corpus_yields_null(spark):
    # P*N = 0 must surface as NULL auc (nullif guard), never a
    # divide-by-zero — evaluated on the same expression shape
    df = spark.createDataFrame(
        [(i, 10 + i, _AUC_LABEL_LANG) for i in range(5)],
        "doc_id long, n_chars long, lang string",
    )
    vc = df.groupBy().agg(
        F.sum((F.col("lang") == _AUC_LABEL_LANG).cast("bigint")).alias("n_pos"),
        F.sum((F.col("lang") != _AUC_LABEL_LANG).cast("bigint")).alias("n_neg"),
    )
    r = vc.select(
        F.expr("2000000 DIV nullif(4 * n_pos * n_neg, 0)").alias("g")
    ).collect()[0]
    assert r["g"] is None


def test_auc_rank_plan_aggregates_before_window(spark):
    # the global-order window must run over per-score-VALUE rows, i.e.
    # a partial-agg HashAggregate appears upstream of the Window node
    p = _plan(q_auc_rank(spark, SF))
    m_win = re.search(r"^\(\d+\) Window", p, flags=re.MULTILINE)
    m_agg = re.search(r"^\(\d+\) HashAggregate", p, flags=re.MULTILINE)
    assert m_win and m_agg
    # formatted plans list children before parents: the first
    # HashAggregate (the groupBy(score) partial) precedes the Window
    assert m_agg.start() < m_win.start()


# ---------------------------------------------------------------------------
# calibration_curve
# ---------------------------------------------------------------------------


def test_calibration_curve_partitions_the_corpus(spark):
    out = q_calibration_curve(spark, SF).collect()
    docs = _t(spark, SF, "documents")
    n = docs.count()
    n_pos = docs.where(F.col("lang") == _AUC_LABEL_LANG).count()
    deciles = sorted(r["decile"] for r in out)
    assert deciles == list(range(10))  # all 10 bins, none empty at sf0.001
    assert sum(r["n_docs"] for r in out) == n
    assert sum(r["n_pos"] for r in out) == n_pos
    # near-equal-width bins from the distributed rank: |bin - n/10| <= 1
    for r in out:
        assert abs(r["n_docs"] - n / 10) <= 1
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert abs(r["pos_rate"] - r["n_pos"] / r["n_docs"]) <= 5e-7


def test_calibration_curve_monotone_score_bins(spark):
    # decile assignment must respect score order: the max score in
    # decile d never exceeds the min score in decile d+2 (ties can
    # straddle one boundary, never two)
    docs = _t(spark, SF, "documents").select(
        "doc_id", F.col("n_chars").alias("score")
    )
    ranked = sorted(
        ((r["score"], r["doc_id"]) for r in docs.collect()),
    )
    n = len(ranked)
    bounds = {}
    for i, (score, _) in enumerate(ranked):
        d = i * 10 // n
        lo, hi = bounds.get(d, (score, score))
        bounds[d] = (min(lo, score), max(hi, score))
    for d in range(9):
        assert bounds[d][1] <= bounds[d + 1][1]


def test_calibration_curve_no_global_per_row_window(spark):
    # the only Window nodes may run over per-value frames; a plan is
    # acceptable when every Window is preceded by the value-count
    # HashAggregate (two-level rank), i.e. at least one agg upstream
    p = _plan(q_calibration_curve(spark, SF))
    m_win = re.search(r"^\(\d+\) Window", p, flags=re.MULTILINE)
    m_agg = re.search(r"^\(\d+\) HashAggregate", p, flags=re.MULTILINE)
    assert m_win and m_agg and m_agg.start() < m_win.start()


# ---------------------------------------------------------------------------
# rbo_rankings
# ---------------------------------------------------------------------------


def test_rbo_weight_table_is_the_tail_sum(spark):
    # W(m) = sum_{d=m..K} p^(d-1)/d in nano-units, and the identity
    # normalizer is exactly W(1)+...+W(K)
    for m in range(1, _RBO_K + 1):
        w = sum(_RBO_P ** (d - 1) / d for d in range(m, _RBO_K + 1))
        assert abs(_RBO_W[m] - w * 1e9) <= 0.5
    assert _RBO_IDENT == sum(_RBO_W.values())
    # strictly decreasing in m (worse shared rank => less weight)
    ws = [_RBO_W[m] for m in range(1, _RBO_K + 1)]
    assert ws == sorted(ws, reverse=True) and ws[-1] > 0


def test_rbo_rankings_bounds_and_identity_docs(spark):
    out = {r["doc_id"]: r for r in q_rbo_rankings(spark, SF).collect()}
    docs = _t(spark, SF, "documents")
    assert set(out) == {r["doc_id"] for r in docs.collect()}
    for r in out.values():
        assert 0 <= r["n_common"] <= _RBO_K
        assert 0.0 <= r["rbo"] <= 1.0
        # full top-K agreement in membership is necessary for rbo=1
        if r["rbo"] == 1.0:
            assert r["n_common"] == min(_RBO_K, r["n_common"]) and r[
                "n_common"
            ] > 0
    # the metric discriminates on real data: not all docs identical
    vals = {r["rbo"] for r in out.values()}
    assert len(vals) > 1


def test_rbo_identical_rankings_score_exactly_one(spark):
    # a doc whose tf ranking == tfidf ranking must score exactly 1.0:
    # every term hits max(ra, rb) = ra once => wsum == _RBO_IDENT
    # (constructed directly from the weight algebra, engine-free)
    wsum = sum(_RBO_W[m] for m in range(1, _RBO_K + 1))
    rbo = ((2_000_000 * wsum + _RBO_IDENT) // (2 * _RBO_IDENT)) / 1e6
    assert rbo == 1.0


def test_rbo_rankings_no_global_window(spark):
    # rankers are per-doc windows: every Window node partitions by
    # doc_id (no "moving all data to a single partition" ranker)
    p = _plan(q_rbo_rankings(spark, SF))
    for m in re.finditer(
        r"^\(\d+\) Window.*?(?=^\(\d+\) )", p, flags=re.MULTILINE | re.DOTALL
    ):
        assert "doc_id" in m.group(0)
