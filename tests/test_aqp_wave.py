"""Semantics tests for the wave-106 AQP-audit entries: top-K
fidelity, group-by error, quantile displacement, scale sweep,
stratified-vs-uniform.  The DuckDB value-hash gate is
scripts/check_queries.py; these replay the sampling in pure Python
(the same portable hash) and pin the audit structure."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_aqp import (
    _RATE,
    _SWEEP,
    _TK,
    q_sample_scale_sweep,
    q_sampled_groupby_error,
    q_sampled_quantile_error,
    q_sampled_topk_fidelity,
    q_stratified_vs_uniform_error,
)

SF = "/root/testdata/sf0.001"


def _h100(v, salt):
    return int(hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[:4], 16) % 100


def test_topk_fidelity_bounds(spark):
    r = q_sampled_topk_fidelity(spark, SF).collect()[0]
    assert r["k"] == _TK
    assert 0 <= r["overlap"] <= _TK
    assert 0 <= r["jaccard_micro"] <= 1_000_000
    assert r["worst_abs_error"] >= 0
    # sampling at 10% should still find most of the head
    assert r["overlap"] >= _TK // 4


def test_groupby_error_replay(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    exact = Counter(s for _d, s in rows)
    samp = Counter(
        s for d, s in rows if _h100(int(d), "gb") < _RATE
    )
    got = {r["source"]: r for r in q_sampled_groupby_error(spark, SF).collect()}
    assert set(got) == set(exact)
    for s, r in got.items():
        assert r["exact_n"] == exact[s]
        assert r["est_n"] == samp.get(s, 0) * (100 // _RATE)


def test_quantile_displacement(spark):
    rows = q_sampled_quantile_error(spark, SF).collect()
    assert len(rows) == 9
    for r in rows:
        assert r["abs_displacement"] == abs(r["sample_q"] - r["exact_q"])
        assert r["abs_displacement"] >= 0


def test_scale_sweep_converges(spark):
    got = {r["rate_pct"]: r for r in q_sample_scale_sweep(spark, SF).collect()}
    assert set(got) == set(_SWEEP)
    for r in got.values():
        assert r["exact_total"] > 0
    # all sweeps share the same exact total
    assert len({r["exact_total"] for r in got.values()}) == 1


def test_stratified_comparison(spark):
    r = q_stratified_vs_uniform_error(spark, SF).collect()[0]
    assert r["n_groups"] == 20
    assert r["uniform_abs_error"] >= 0
    assert r["stratified_abs_error"] >= 0


def test_registered_in_catalog():
    for name in (
        "sampled_topk_fidelity",
        "sampled_groupby_error",
        "sampled_quantile_error",
        "sample_scale_sweep",
        "stratified_vs_uniform_error",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
