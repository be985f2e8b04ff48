"""Semantics tests for the wave-88 grid-fit entries: pinball grid,
Huber grid, LAD-vs-OLS, refinement audit, breakdown demo.  The DuckDB
value-hash gate is scripts/check_queries.py; these replay the grids
in pure Python and pin the robustness theory (argmin correctness,
refinement never regresses, LAD wins L1 / OLS wins L2, LAD slope
moves less under contamination)."""

from __future__ import annotations

import hashlib

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_gridfit import (
    _BP_PCT,
    _TAUS,
    q_breakdown_point_demo,
    q_grid_refinement_audit,
    q_huber_regression_grid,
    q_lad_vs_ols_compare,
    q_quantile_regression_grid,
)

SF = "/root/testdata/sf0.001"


def _series():
    rows = sorted(
        duckdb.sql(
            f"""SELECT CAST(l_shipdate AS DATE),
                  sum(CAST(floor(l_quantity) AS BIGINT))
                FROM '{SF}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )
    return [(t + 1, int(y)) for t, (_d, y) in enumerate(rows)], [
        d for d, _y in rows
    ]


def _grid(ser):
    n = len(ser)
    s1 = sum(y for _t, y in ser)
    b0s = [(s1 * k) // (10 * n) for k in range(6, 15)]
    b1s = list(range(-5, 6))
    return [(b0, b1) for b0 in b0s for b1 in b1s]


def test_quantile_grid_argmin(spark):
    ser, _days = _series()
    grid = _grid(ser)
    got = {(r["tau_num"], r["tau_den"]): r for r in q_quantile_regression_grid(spark, SF).collect()}
    assert set(got) == set(_TAUS)
    for num, den in _TAUS:
        losses = {}
        for b0, b1 in grid:
            l = 0
            for t, y in ser:
                r_ = y - (b0 + b1 * t)
                l += num * r_ if r_ >= 0 else (den - num) * (-r_)
            losses[(b0, b1)] = l
        best = min((l, b0, b1) for (b0, b1), l in losses.items())
        r = got[(num, den)]
        assert (r["best_loss_den"], r["best_b0"], r["best_b1"]) == best


def test_huber_grid_argmin(spark):
    ser, _days = _series()
    grid = _grid(ser)
    n = len(ser)
    s1 = sum(y for _t, y in ser)
    dlt = s1 // (10 * n)
    losses = {}
    for b0, b1 in grid:
        l = 0
        for t, y in ser:
            r_ = abs(y - (b0 + b1 * t))
            l += r_ * r_ if r_ <= dlt else 2 * dlt * r_ - dlt * dlt
        losses[(b0, b1)] = l
    best = min((l, b0, b1) for (b0, b1), l in losses.items())
    r = q_huber_regression_grid(spark, SF).collect()[0]
    assert r["delta_units"] == dlt
    assert (r["best_loss"], r["best_b0"], r["best_b1"]) == best


def test_lad_beats_ols_on_l1_and_vice_versa(spark):
    rows = {r["method"]: r for r in q_lad_vs_ols_compare(spark, SF).collect()}
    assert set(rows) == {"lad_grid", "ols_exact"}
    assert rows["lad_grid"]["l1_per_day_micro"] <= rows["ols_exact"]["l1_per_day_micro"]
    assert rows["ols_exact"]["l2_per_day_micro"] <= rows["lad_grid"]["l2_per_day_micro"]


def test_refinement_never_regresses(spark):
    r = q_grid_refinement_audit(spark, SF).collect()[0]
    assert bool(r["improved_or_equal"]) is True
    assert r["fine_loss"] <= r["coarse_loss"]
    # the fine winner stays in the neighborhood of the coarse winner
    assert r["fine_b1"] == r["coarse_b1"]


def test_breakdown_lad_more_stable(spark):
    rows = {r["contaminated"]: r for r in q_breakdown_point_demo(spark, SF).collect()}
    assert set(rows) == {0, 1}
    ols_shift = abs(rows[1]["ols_slope_micro"] - rows[0]["ols_slope_micro"])
    lad_shift = abs(rows[1]["lad_slope_micro"] - rows[0]["lad_slope_micro"])
    assert ols_shift >= lad_shift
    # local replay of the contamination mask size
    _ser, days = _series()
    k = sum(
        1
        for d in days
        if int(hashlib.md5(f"{d}:bp".encode()).hexdigest()[:4], 16) % 100
        < _BP_PCT
    )
    assert 0 < k < len(days)


def test_registered_in_catalog():
    for name in (
        "quantile_regression_grid",
        "huber_regression_grid",
        "lad_vs_ols_compare",
        "grid_refinement_audit",
        "breakdown_point_demo",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
