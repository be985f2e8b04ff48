"""Semantics tests for the wave-84 window-rewrite certifications:
lag≡join, rank≡histogram, cumsum≡triangular, topN≡count-of-greater,
first/last≡argmin/argmax.  The DuckDB value-hash gate is
scripts/check_queries.py; these assert the one property that gives
the wave its meaning — EVERY matches flag is true on the fixture —
plus spot recomputations of each certified side."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_winrewrite import (
    _TOPN,
    q_cumsum_scan_equiv,
    q_firstlast_minmax_equiv,
    q_lag_join_equiv,
    q_rank_count_equiv,
    q_topn_pergroup_equiv,
)

SF = "/root/testdata/sf0.001"


def test_all_certifications_hold(spark):
    for fn in (
        q_lag_join_equiv,
        q_rank_count_equiv,
        q_cumsum_scan_equiv,
        q_topn_pergroup_equiv,
        q_firstlast_minmax_equiv,
    ):
        rows = fn(spark, SF).collect()
        assert rows, fn.__name__
        bad = [r for r in rows if not r["matches"]]
        assert not bad, (fn.__name__, bad[:3])


def test_rank_identity_local(spark):
    vals = sorted(
        int(v)
        for (v,) in duckdb.sql(
            f"SELECT n_chars FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    got = {r["v"]: r for r in q_rank_count_equiv(spark, SF).collect()}
    assert set(got) == set(vals)
    for v, r in got.items():
        want_rank = 1 + sum(1 for x in vals if x < v)
        assert r["hist_rank"] == want_rank
        assert r["win_rank_min"] == want_rank
        assert r["m"] == sum(1 for x in vals if x == v)


def test_topn_membership_local(spark):
    rows = duckdb.sql(
        f"SELECT source, doc_id, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for s, d, v in rows:
        per[s].append((int(v), int(d)))
    want = set()
    for s, docs in per.items():
        top = sorted(docs, key=lambda t: (-t[0], t[1]))[:_TOPN]
        want |= {(s, d) for _v, d in top}
    got = q_topn_pergroup_equiv(spark, SF).collect()
    sel = {(r["source"], r["doc_id"]) for r in got if r["in_window"] == 1}
    assert sel == want
    assert len(got) == len(sel)  # full outer join adds no disagreements


def test_firstlast_local(spark):
    rows = duckdb.sql(
        f"SELECT source, doc_id, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for s, d, v in rows:
        per[s].append((int(v), int(d)))
    got = {r["source"]: r for r in q_firstlast_minmax_equiv(spark, SF).collect()}
    assert set(got) == set(per)
    for s, docs in per.items():
        first = min(docs)[1]
        last = max(docs)[1]
        r = got[s]
        assert r["first_doc_agg"] == first and r["first_doc_win"] == first
        assert r["last_doc_agg"] == last and r["last_doc_win"] == last


def test_registered_in_catalog():
    for name in (
        "lag_join_equiv",
        "rank_count_equiv",
        "cumsum_scan_equiv",
        "topn_pergroup_equiv",
        "firstlast_minmax_equiv",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
