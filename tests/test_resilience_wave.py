"""Semantics tests for the wave-107 supply-resilience entries:
degree profiles, single-source fragility, hub attack, supplier
overlap, density.  The DuckDB value-hash gate is
scripts/check_queries.py; these replay the bipartite algebra in pure
Python and pin the graph structure (degree mass conserves, stranded
⊇ singly-sourced-by-hubs, Jaccard bounds, density identity)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_resilience import (
    _ATTACK_K,
    _OVL_K,
    q_bipartite_density_report,
    q_hub_attack_robustness,
    q_ps_graph_degree_profile,
    q_single_source_parts_report,
    q_supplier_overlap_jaccard,
)

SF = "/root/testdata/sf0.001"


def _edges():
    return {
        (int(p), int(s))
        for p, s in duckdb.sql(
            f"SELECT DISTINCT l_partkey, l_suppkey"
            f" FROM '{SF}/lineitem.parquet'"
        ).fetchall()
    }


def test_degree_profile_conserves(spark):
    edges = _edges()
    pdeg = Counter(p for p, _s in edges)
    sdeg = Counter(s for _p, s in edges)
    rows = q_ps_graph_degree_profile(spark, SF).collect()
    ph = {r["degree"]: r["n_nodes"] for r in rows if r["side"] == "suppliers_per_part"}
    sh = {r["degree"]: r["n_nodes"] for r in rows if r["side"] == "parts_per_supplier"}
    assert ph == dict(Counter(pdeg.values()))
    assert sh == dict(Counter(sdeg.values()))
    # degree mass equals edge count on both sides
    assert sum(d * n for d, n in ph.items()) == len(edges)
    assert sum(d * n for d, n in sh.items()) == len(edges)


def test_single_source(spark):
    edges = _edges()
    pdeg = Counter(p for p, _s in edges)
    singles = {p for p, d in pdeg.items() if d == 1}
    r = q_single_source_parts_report(spark, SF).collect()[0]
    assert r["single_source_parts"] == len(singles)
    assert r["total_parts"] == len(pdeg)
    assert 0 <= r["part_share_micro"] <= 1_000_000


def test_hub_attack(spark):
    edges = _edges()
    sdeg = Counter(s for _p, s in edges)
    hubs = {
        s
        for s, _d in sorted(sdeg.items(), key=lambda t: (-t[1], t[0]))[
            :_ATTACK_K
        ]
    }
    surviving = defaultdict(int)
    for p, s in edges:
        if s not in hubs:
            surviving[p] += 1
    pdeg = Counter(p for p, _s in edges)
    stranded = {p for p in pdeg if p not in surviving}
    r = q_hub_attack_robustness(spark, SF).collect()[0]
    assert r["suppliers_removed"] == _ATTACK_K
    assert r["parts_stranded"] == len(stranded)
    assert r["total_parts"] == len(pdeg)


def test_overlap_jaccard(spark):
    edges = _edges()
    parts_of = defaultdict(set)
    for p, s in edges:
        parts_of[s].add(p)
    rows = q_supplier_overlap_jaccard(spark, SF).collect()
    assert len(rows) <= _OVL_K
    for r in rows:
        a, b = parts_of[r["s1"]], parts_of[r["s2"]]
        assert r["shared"] == len(a & b)
        assert r["deg1"] == len(a) and r["deg2"] == len(b)
        assert 0 < r["jaccard_micro"] <= 1_000_000
    js = [r["jaccard_micro"] for r in rows]
    assert js == sorted(js, reverse=True)


def test_density_identity(spark):
    edges = _edges()
    r = q_bipartite_density_report(spark, SF).collect()[0]
    assert r["n_edges"] == len(edges)
    assert r["possible_edges"] == r["n_parts"] * r["n_suppliers"]
    assert 0 < r["density_micro"] <= 1_000_000


def test_registered_in_catalog():
    for name in (
        "ps_graph_degree_profile",
        "single_source_parts_report",
        "hub_attack_robustness",
        "supplier_overlap_jaccard",
        "bipartite_density_report",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
