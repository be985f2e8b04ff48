"""Corpus-quality ops (gopher_rules / ngram_diversity /
discounted_returns): algorithmic invariants on the Spark side.
Gate-level value-hash equality vs DuckDB is covered by
scripts/check_queries.py (green at sf0.001 and sf0.01)."""

from __future__ import annotations

import pandas as pd

from occular_ocr_spark.queries_quality import (
    _DR_HORIZON,
    _GR_MAX_WORDS,
    _GR_MIN_STOP,
    _GR_MIN_WORDS,
    _GR_MWL_HI,
    _GR_MWL_LO,
    _GR_STOPWORDS,
    q_discounted_returns,
    q_gopher_rules,
    q_ngram_diversity,
)

SF = "/root/testdata/sf0.001"


def _words(text):
    return [w for w in (text or "").split(" ") if w]


def test_gopher_rules_matches_bruteforce_pandas(spark):
    rows = {r.source: r for r in q_gopher_rules(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    expect = {}
    for src, grp in docs.groupby("source"):
        n_docs = kept = f_cnt = f_mwl = f_alpha = f_stop = 0
        for text in grp.text:
            ws = _words(text)
            n = len(ws)
            sum_len = sum(len(w) for w in ws)
            n_alpha = sum(1 for w in ws if any(c.isascii() and c.isalpha() for c in w))
            stop = sum(1 for s in _GR_STOPWORDS if s in ws)
            ok_c = _GR_MIN_WORDS <= n <= _GR_MAX_WORDS
            ok_m = n > 0 and _GR_MWL_LO * n <= sum_len <= _GR_MWL_HI * n
            ok_a = n > 0 and 5 * n_alpha >= 4 * n
            ok_s = stop >= _GR_MIN_STOP
            n_docs += 1
            kept += ok_c and ok_m and ok_a and ok_s
            f_cnt += not ok_c
            f_mwl += not ok_m
            f_alpha += not ok_a
            f_stop += not ok_s
        expect[src] = (n_docs, kept, f_cnt, f_mwl, f_alpha, f_stop)
    assert set(rows) == set(expect)
    for src, (n_docs, kept, f_cnt, f_mwl, f_alpha, f_stop) in expect.items():
        r = rows[src]
        assert (
            r.n_docs,
            r.kept,
            r.fail_word_count,
            r.fail_mean_word_len,
            r.fail_alpha_ratio,
            r.fail_stopwords,
        ) == (n_docs, kept, f_cnt, f_mwl, f_alpha, f_stop), src
    # the thresholds must have live pass AND fail populations somewhere
    assert sum(r.kept for r in rows.values()) > 0
    assert sum(r.n_docs - r.kept for r in rows.values()) > 0


def test_ngram_diversity_matches_bruteforce_pandas(spark):
    rows = {r.source: r for r in q_ngram_diversity(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, grp in docs.groupby("source"):
        tris = []
        for text in grp.text:
            ws = _words(text)
            tris += [
                " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
            ]
        r = rows[src]
        assert r.total_trigrams == len(tris)
        assert r.distinct_trigrams == len(set(tris))
        assert 0 < r.diversity <= 1.0


def test_discounted_returns_dyadic_exact_and_bruteforce(spark):
    from occular_ocr_spark.queries_transcript import _turns

    out = q_discounted_returns(spark, SF)
    rows = out.collect()
    turns = {
        (t.conv_id, t.turn_idx): len(t.text or "")
        for t in _turns(spark, SF).collect()
    }
    by_conv = {}
    for (conv, idx), r in turns.items():
        by_conv.setdefault(conv, {})[idx] = r
    scale = 1 << (_DR_HORIZON - 1)
    for r in rows:
        seq = by_conv[r.conv_id]
        idxs = sorted(i for i in seq if i >= r.turn_idx)[:_DR_HORIZON]
        # horizon counts POSITIONS in turn order, not index distance
        expect = sum(
            seq[i] * (scale >> j) for j, i in enumerate(idxs)
        )
        assert r.ret_x128 == expect, (r.conv_id, r.turn_idx)
        # the float surface is the exact dyadic rational — bit equality
        assert r.ret == r.ret_x128 / float(scale)
        assert r.reward == seq[r.turn_idx]
    assert len(rows) == len(turns)
