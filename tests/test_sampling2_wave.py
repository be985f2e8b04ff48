"""Semantics tests for the wave-75 sampling-design entries: Madow
systematic PPS, inclusion audit, alternating split, Kish design
effect, Poisson plan.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against a direct grid
simulation of the draw and the theory's invariants."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_sampling2 import (
    _PPS_M,
    q_alternating_split_audit,
    q_kish_design_effect,
    q_poisson_sampling_plan,
    q_pps_inclusion_audit,
    q_pps_systematic_sample,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, source, n_chars"
        f" FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _grid_hits():
    """Direct simulation: place the m grid points on [0, W) and count
    how many land in each doc's cumulative span."""
    docs = _docs()
    bigw = sum(d[3] for d in docs)
    o = _h8("pps") % bigw
    # grid points in units of 1/m: positions (o + k*W/m) mod W for
    # k = 0..m-1  -> in integer m-scaled units: o*? use the identity
    # directly: a point k (0..m-1) lands where m*cum_prev <= o*? The
    # implementation's f(x) counts multiples of W in (o', o'+x]; we
    # replicate with exact rational arithmetic via fractions of W.
    hits = defaultdict(int)
    cum = 0
    spans = []
    for doc_id, _l, _s, w in docs:
        spans.append((doc_id, cum, cum + w))
        cum += w
    # the implementation's f(x) = (x + W - o - 1) DIV W counts values
    # p = o + 1 + k*W (k = 0..m-1) inside the half-open m-scaled span
    # (m*cum_prev, m*cum] — i.e. grid step W/m with offset (o+1)/m
    for k in range(_PPS_M):
        p = o + 1 + k * bigw
        for doc_id, lo, hi in spans:
            if _PPS_M * lo < p <= _PPS_M * hi:
                hits[doc_id] += 1
                break
    return hits, bigw, o


def test_pps_hits_match_grid_simulation(spark):
    hits, _w, _o = _grid_hits()
    got = {
        r["doc_id"]: r for r in q_pps_systematic_sample(spark, SF).collect()
    }
    assert {d: r["hits"] for d, r in got.items()} == dict(hits)
    assert sum(r["hits"] for r in got.values()) == _PPS_M


def test_pps_inclusion_audit_matches(spark):
    docs = _docs()
    bigw = sum(d[3] for d in docs)
    w_src = defaultdict(int)
    n_src = defaultdict(int)
    for _d, _l, s, w in docs:
        w_src[s] += w
        n_src[s] += 1
    hits, _w2, _o = _grid_hits()
    src_of = {d[0]: d[2] for d in docs}
    realized = defaultdict(int)
    for d, h in hits.items():
        realized[src_of[d]] += h
    got = {
        r["source"]: r for r in q_pps_inclusion_audit(spark, SF).collect()
    }
    assert set(got) == set(w_src)
    for s in w_src:
        r = got[s]
        assert r["n_docs"] == n_src[s]
        assert r["w_src"] == w_src[s]
        assert r["realized_hits"] == realized.get(s, 0)
        assert r["expected_hits_micro"] == _halfup(
            1_000_000 * _PPS_M * w_src[s], bigw
        )
        assert r["total_hits"] == _PPS_M
        # (no per-source deviation bound: the ±1 systematic-sampling
        # guarantee holds only for blocks CONTIGUOUS in the draw
        # order, and sources interleave across doc_id)


def test_alternating_split_balanced(spark):
    docs = _docs()
    strata = defaultdict(list)
    for doc_id, lang, source, w in docs:
        strata[(lang, source)].append((w, doc_id))
    got = {
        (r["lang"], r["source"]): r
        for r in q_alternating_split_audit(spark, SF).collect()
    }
    assert set(got) == set(strata)
    for key, items in strata.items():
        items.sort()
        w_a = sum(w for i, (w, _d) in enumerate(items) if i % 2 == 0)
        w_b = sum(w for i, (w, _d) in enumerate(items) if i % 2 == 1)
        r = got[key]
        assert r["n_docs"] == len(items)
        assert r["size_gap"] <= 1
        assert {r["w_a"], r["w_b"]} == {w_a, w_b}
        assert r["weight_gap_micro"] == _halfup(
            1_000_000 * abs(w_a - w_b), w_a + w_b
        )
        # provable bound for the sorted alternating split: the halves
        # differ by at most one (the largest) item's weight
        assert abs(w_a - w_b) <= max(w for w, _d in items)


def test_kish_matches_and_bounds(spark):
    docs = _docs()
    per = defaultdict(lambda: [0, 0, 0])
    for _d, _l, s, w in docs:
        a = per[s]
        a[0] += 1
        a[1] += w
        a[2] += w * w
    got = {
        r["source"]: r for r in q_kish_design_effect(spark, SF).collect()
    }
    assert set(got) == set(per)
    for s, (n, s1, s2) in per.items():
        r = got[s]
        assert r["n_docs"] == n and r["s1"] == s1 and r["s2"] == s2
        assert r["neff_micro"] == _halfup(1_000_000 * s1 * s1, s2)
        assert r["deff_micro"] == _halfup(1_000_000 * n * s2, s1 * s1)
        # Cauchy-Schwarz: n_eff <= n, deff >= 1
        assert r["neff_micro"] <= 1_000_000 * n + 500_000
        assert r["deff_micro"] >= 999_999


def test_poisson_plan_matches_replay(spark):
    docs = _docs()
    bigw = sum(d[3] for d in docs)
    exp = defaultdict(int)
    real = defaultdict(int)
    n = defaultdict(int)
    for doc_id, _l, s, w in docs:
        pi = min(1_000_000, (1_000_000 * _PPS_M * w) // bigw)
        exp[s] += pi
        n[s] += 1
        if _h8(f"poi:{doc_id}") % 1_000_000 < pi:
            real[s] += 1
    got = {
        r["source"]: r for r in q_poisson_sampling_plan(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for s in exp:
        r = got[s]
        assert r["n_docs"] == n[s]
        assert r["expected_micro"] == exp[s]
        assert r["realized"] == real[s]
    # the plan's global expectation is ~m (floor loss only)
    assert sum(exp.values()) <= _PPS_M * 1_000_000
    assert sum(exp.values()) > (_PPS_M - 1) * 1_000_000


def test_registered_in_catalog():
    for name in (
        "pps_systematic_sample",
        "pps_inclusion_audit",
        "alternating_split_audit",
        "kish_design_effect",
        "poisson_sampling_plan",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
