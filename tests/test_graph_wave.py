"""Semantics tests for the wave-15 graph entries: clustering
coefficient, degree assortativity, and single-source BFS.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op against
an independent single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import re

from pyspark.sql import functions as F

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_graph import (
    _BFS_MAX_ROUNDS,
    _coorder_edges,
    q_bfs_distances,
    q_clustering_coefficient,
    q_degree_assortativity,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _adjacency(spark):
    adj = collections.defaultdict(set)
    for r in _coorder_edges(spark, SF).collect():
        adj[r["lo"]].add(r["hi"])
        adj[r["hi"]].add(r["lo"])
    return adj


# ---------------------------------------------------------------------------
# clustering_coefficient
# ---------------------------------------------------------------------------


def test_clustering_coefficient_matches_naive(spark):
    adj = _adjacency(spark)
    rows = {r["supp_id"]: r for r in q_clustering_coefficient(spark, SF).collect()}
    assert set(rows) == set(adj)
    for v, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and b in adj[a]
        )
        assert rows[v]["degree"] == deg
        assert rows[v]["n_triangles"] == tri
        want = 0.0 if deg < 2 else round(2 * tri / (deg * (deg - 1)), 6)
        assert abs(rows[v]["lcc"] - want) <= 5e-7


def test_clustering_coefficient_bounds(spark):
    for r in q_clustering_coefficient(spark, SF).collect():
        assert 0.0 <= r["lcc"] <= 1.0
        # tri(v) can never exceed deg-choose-2
        assert 2 * r["n_triangles"] <= r["degree"] * (r["degree"] - 1)


def test_clustering_coefficient_plan_no_cartesian(spark):
    p = _plan_of(q_clustering_coefficient(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    Q.release_persists()


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------


def test_degree_assortativity_matches_naive(spark):
    adj = _adjacency(spark)
    samples = [
        (len(adj[u]), len(adj[v])) for u in adj for v in adj[u]
    ]  # both orientations — the 2m-sample definition
    m = len(samples)
    s1 = sum(x for x, _ in samples)
    s2 = sum(x * x for x, _ in samples)
    s11 = sum(x * y for x, y in samples)
    den = m * s2 - s1 * s1
    want = 0.0 if den == 0 else round((m * s11 - s1 * s1) / den, 6)
    row = q_degree_assortativity(spark, SF).collect()[0]
    assert row["n_edges"] == m // 2
    assert abs(row["assortativity"] - want) <= 5e-7


def test_degree_assortativity_single_row_partial_agg(spark):
    df = q_degree_assortativity(spark, SF)
    p = _plan_of(df)
    assert "partial" in p  # map-side combine before the 1-row final agg
    assert "CartesianProduct" not in p
    assert df.count() == 1


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------


def test_bfs_distances_matches_naive(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in Q.q_dedup_minhash_verify(spark, SF).collect()
    ]
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    src = min(adj)
    dist = {src: 0}
    frontier = [src]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    got = {r["doc_id"]: r["dist"] for r in q_bfs_distances(spark, SF).collect()}
    assert got == dist
    assert max(dist.values()) < _BFS_MAX_ROUNDS  # cap has slack on fixtures


def test_bfs_distances_source_is_zero(spark):
    rows = q_bfs_distances(spark, SF).collect()
    by_dist = collections.Counter(r["dist"] for r in rows)
    assert by_dist[0] == 1  # exactly one source
    # hop levels are contiguous: a node at d>0 implies some node at d-1
    for d in range(1, max(by_dist) + 1):
        assert by_dist[d - 1] >= 1
