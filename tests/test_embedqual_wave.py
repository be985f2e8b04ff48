"""Semantics tests for the wave-99 embedding-quality entries:
centroids, separability, centroid cosines, k-NN purity, variance
ranking.  The DuckDB value-hash gate is scripts/check_queries.py;
these replay the quantized algebra in numpy-free pure Python and pin
the structure (centroid counts partition vectors, eta² in [0,1],
cosines in [-1,1], purity vs a local brute-force replay)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_embedqual import (
    _KNN_K,
    _KNN_PROBES,
    q_centroid_cosine_matrix,
    q_dim_variance_ranking,
    q_embed_centroid_table,
    q_fisher_separability_audit,
    q_label_knn_purity,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _codes():
    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding"
        f" FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    out = {}
    import math

    for v, l, emb in rows:
        out[int(v)] = (int(l), [int(math.floor(x * 1000 + 0.5)) for x in emb])
    return out


def test_centroids_partition(spark):
    codes = _codes()
    got = {(r["label"], r["dim"]): r for r in q_embed_centroid_table(spark, SF).collect()}
    dims = len(next(iter(codes.values()))[1])
    labels = {l for l, _c in codes.values()}
    assert len(got) == len(labels) * dims
    # spot-check one cell
    l0 = min(labels)
    members = [c[0] for _v, (l, c) in codes.items() if l == l0]
    s = sum(members)
    r = got[(l0, 1)]
    assert r["n"] == len(members)
    want = (
        _halfup(1000 * s, len(members))
        if s >= 0
        else -_halfup(1000 * -s, len(members))
    )
    assert r["mean_micro"] == want


def test_eta2_bounds(spark):
    rows = q_fisher_separability_audit(spark, SF).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["n_labels"] == 10
        # eta² within [0,1] up to per-class rounding slack
        assert -1000 <= r["eta2_micro"] <= 1_000_000
        assert r["ssw_micro"] <= r["sst_micro"] + r["n_labels"]


def test_cosines_bounded(spark):
    rows = q_centroid_cosine_matrix(spark, SF).collect()
    assert len(rows) == 45
    for r in rows:
        assert -1_000_001 <= r["cosine_micro"] <= 1_000_001
        assert r["label_a"] < r["label_b"]


def test_knn_purity_replay(spark):
    codes = _codes()
    probes = sorted(codes)[:_KNN_PROBES]
    got = {r["probe_id"]: r for r in q_label_knn_purity(spark, SF).collect()}
    assert set(got) == set(probes)
    for p in probes:
        pl, pc = codes[p]
        dots = []
        for v, (l, c) in codes.items():
            if v == p:
                continue
            dots.append((-sum(a * b for a, b in zip(pc, c)), v, l))
        top = sorted(dots)[:_KNN_K]
        same = sum(1 for _d, _v, l in top if l == pl)
        r = got[p]
        assert r["probe_label"] == pl
        assert r["same_label"] == same
        assert r["purity_micro"] == _halfup(1_000_000 * same, _KNN_K)


def test_variance_ranking_is_permutation(spark):
    rows = q_dim_variance_ranking(spark, SF).collect()
    assert len(rows) == 64
    ranks = sorted(r["variance_rank"] for r in rows)
    assert ranks == list(range(1, 65))
    by_rank = sorted(rows, key=lambda r: r["variance_rank"])
    vs = [r["var_numerator"] for r in by_rank]
    assert vs == sorted(vs, reverse=True)


def test_registered_in_catalog():
    for name in (
        "embed_centroid_table",
        "fisher_separability_audit",
        "centroid_cosine_matrix",
        "label_knn_purity",
        "dim_variance_ranking",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
