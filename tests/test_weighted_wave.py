"""Semantics tests for the wave-105 weighted-statistics entries:
weighted quantiles, weighted moments, weighted Gini, Wilson bounds,
sample-size planner.  The DuckDB value-hash gate is
scripts/check_queries.py; these replay the weighted algebra in pure
Python and pin the statistics (weighted median between min/max,
Gini in [0,1], Wilson brackets the rate, planner monotone in MoE)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_weighted import (
    _MOE_GRID,
    q_moe_sample_size_planner,
    q_weighted_gini_index,
    q_weighted_mean_variance_report,
    q_weighted_quantile_table,
    q_wilson_interval_report,
)

SF = "/root/testdata/sf0.001"


def _wlines():
    rows = duckdb.sql(
        f"""SELECT l_extendedprice, l_quantity
            FROM '{SF}/lineitem.parquet' WHERE l_quantity > 0"""
    ).fetchall()
    return [
        (int(math.floor(1000 * ep / q)), int(math.floor(q)))
        for ep, q in rows
    ]


def test_weighted_deciles(spark):
    pw = _wlines()
    wh = defaultdict(int)
    for p, w in pw:
        wh[p] += w
    wtot = sum(wh.values())
    got = {r["decile"]: r for r in q_weighted_quantile_table(spark, SF).collect()}
    assert set(got) == set(range(1, 10))
    cum = 0
    marks = {}
    for v in sorted(wh):
        cum += wh[v]
        for k in range(1, 10):
            if k not in marks and cum >= -(-k * wtot // 10):
                marks[k] = v
    for k in range(1, 10):
        r = got[k]
        assert r["weighted_quantile_milli"] == marks[k]
        assert r["total_weight"] == wtot
    qs = [got[k]["weighted_quantile_milli"] for k in range(1, 10)]
    assert qs == sorted(qs)


def test_weighted_moments(spark):
    pw = _wlines()
    sw = sum(w for _p, w in pw)
    swx = sum(w * p for p, w in pw)
    swx2 = sum(w * p * p for p, w in pw)
    r = q_weighted_mean_variance_report(spark, SF).collect()[0]
    assert r["sw"] == sw
    assert r["weighted_mean_micro"] == (2 * 1000 * swx + sw) // (2 * sw)
    want_var = int((sw * swx2 - swx * swx) / (sw * sw) + 0.5)
    assert r["weighted_var_milli2"] == want_var


def test_weighted_gini_bounds(spark):
    r = q_weighted_gini_index(spark, SF).collect()[0]
    assert 0 <= r["weighted_gini_micro"] <= 1_000_000
    assert r["total_weight"] > 0 and r["total_value"] > 0


def test_wilson_brackets_rate(spark):
    rows = q_wilson_interval_report(spark, SF).collect()
    for r in rows:
        assert r["wilson_lo_micro"] <= r["rate_micro"] <= r["wilson_hi_micro"]
        assert 0 <= r["wilson_lo_micro"] <= 1_000_000
        assert 0 <= r["wilson_hi_micro"] <= 1_000_001


def test_planner_monotone(spark):
    rows = q_moe_sample_size_planner(spark, SF).collect()
    per = defaultdict(dict)
    for r in rows:
        per[r["source"]][r["moe_micro"]] = r["required_n"]
    for src, d in per.items():
        assert set(d) == set(_MOE_GRID)
        # tighter margins need more samples
        ns = [d[e] for e in sorted(_MOE_GRID)]
        assert ns == sorted(ns, reverse=True)
        for n in ns:
            assert n >= 1


def test_registered_in_catalog():
    for name in (
        "weighted_quantile_table",
        "weighted_mean_variance_report",
        "weighted_gini_index",
        "wilson_interval_report",
        "moe_sample_size_planner",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
