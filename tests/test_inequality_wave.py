"""Semantics tests for the wave-60 length-inequality entries: exact
Lorenz curve, Atkinson index, Bowley skewness, Moors kurtosis, Palma
ratio.  The DuckDB value-hash gate is scripts/check_queries.py; these
pin each op against an independent single-node recomputation plus
plan shapes."""

from __future__ import annotations

import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_inequality import (
    _LZ_POINTS,
    q_atkinson_index,
    q_bowley_skewness,
    q_lorenz_curve,
    q_moors_kurtosis,
    q_palma_ratio,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _values(spark):
    return sorted(
        r["n_chars"]
        for r in Q._t(spark, SF, "documents").select("n_chars").collect()
    )


def _lorenz_mass(vals, r):
    """Mass of the r smallest values (vals sorted ascending)."""
    return sum(vals[:r])


# ---------------------------------------------------------------------------
# lorenz_curve
# ---------------------------------------------------------------------------


def test_lorenz_matches_local(spark):
    vals = _values(spark)
    n, m = len(vals), sum(vals)
    want = {}
    for k in range(1, _LZ_POINTS + 1):
        r = (k * n) // _LZ_POINTS
        mass = _lorenz_mass(vals, r)
        b = vals[r - 1] if r > 0 else vals[0]
        want[k] = (r, b, mass, _halfup(2_000_000 * mass, 2 * m))
    got = {
        r["k"]: (
            r["r_k"],
            r["boundary_value"],
            r["mass"],
            r["share_micro"],
        )
        for r in q_lorenz_curve(spark, SF).collect()
    }
    assert got == want


def test_lorenz_convex_and_terminal(spark):
    rows = sorted(
        q_lorenz_curve(spark, SF).collect(), key=lambda r: r["k"]
    )
    shares = [r["share_micro"] for r in rows]
    assert shares == sorted(shares)
    assert rows[-1]["share_micro"] == 1_000_000
    # Lorenz curve lies under the diagonal
    for r in rows:
        assert r["share_micro"] <= r["k"] * 1_000_000 // _LZ_POINTS + 1


def test_lorenz_single_scan(spark):
    plan = _plan_of(q_lorenz_curve(spark, SF))
    assert plan.count("documents.parquet") == 1


# ---------------------------------------------------------------------------
# atkinson_index
# ---------------------------------------------------------------------------


def test_atkinson_matches_local(spark):
    vals = _values(spark)
    n, m = len(vals), sum(vals)
    hist = {}
    for v in vals:
        hist[v] = hist.get(v, 0) + 1
    sum_ln = sum(
        c * math.floor(math.log(v) * 1e6 + 0.5) for v, c in hist.items()
    )
    want = math.floor(
        (1.0 - math.exp((sum_ln / 1e6) / n) * n / m) * 1e6 + 0.5
    )
    row = q_atkinson_index(spark, SF).collect()[0]
    assert row["n"] == n and row["m"] == m
    assert row["sum_ln_micro"] == sum_ln
    assert row["atkinson_micro"] == want


def test_atkinson_in_unit_interval(spark):
    row = q_atkinson_index(spark, SF).collect()[0]
    # AM-GM: geomean <= mean, so A in [0, 1); equality iff degenerate
    assert 0 <= row["atkinson_micro"] < 1_000_000


# ---------------------------------------------------------------------------
# bowley_skewness / moors_kurtosis
# ---------------------------------------------------------------------------


def _octile(vals, k):
    n = len(vals)
    cum = 0
    hist = {}
    for v in vals:
        hist[v] = hist.get(v, 0) + 1
    for v in sorted(hist):
        cum += hist[v]
        if 8 * cum >= k * n:
            return v
    raise AssertionError


def test_bowley_matches_local(spark):
    vals = _values(spark)
    q1, q2, q3 = _octile(vals, 2), _octile(vals, 4), _octile(vals, 6)
    num = q3 + q1 - 2 * q2
    den = q3 - q1
    want = _halfup(2_000_000 * (num + den), 2 * den) - 1_000_000
    row = q_bowley_skewness(spark, SF).collect()[0]
    assert (row["q1"], row["q2"], row["q3"]) == (q1, q2, q3)
    assert row["bowley_micro"] == want
    assert -1_000_000 <= row["bowley_micro"] <= 1_000_000


def test_moors_matches_local(spark):
    vals = _values(spark)
    e = {k: _octile(vals, k) for k in range(1, 8)}
    num = (e[7] - e[5]) + (e[3] - e[1])
    den = e[6] - e[2]
    want = _halfup(2_000_000 * num, 2 * den)
    row = q_moors_kurtosis(spark, SF).collect()[0]
    assert (row["e1"], row["e3"], row["e5"], row["e7"]) == (
        e[1],
        e[3],
        e[5],
        e[7],
    )
    assert row["moors_micro"] == want
    assert row["moors_micro"] > 0


# ---------------------------------------------------------------------------
# palma_ratio
# ---------------------------------------------------------------------------


def test_palma_matches_local(spark):
    vals = _values(spark)
    n, m = len(vals), sum(vals)
    bottom40 = _lorenz_mass(vals, (4 * n) // 10)
    upto90 = _lorenz_mass(vals, n - n // 10)
    top10 = m - upto90
    want = _halfup(2_000_000 * top10, 2 * bottom40)
    row = q_palma_ratio(spark, SF).collect()[0]
    assert row["n"] == n and row["m"] == m
    assert row["bottom40_mass"] == bottom40
    assert row["top10_mass"] == top10
    assert row["palma_micro"] == want


def test_palma_exceeds_uniform_floor(spark):
    # with any inequality, 10% of docs vs 40% of docs: ratio > 1/4
    # exactly at uniform; the synthetic corpus is non-degenerate
    row = q_palma_ratio(spark, SF).collect()[0]
    assert row["palma_micro"] > 250_000
    assert row["bottom40_mass"] + row["top10_mass"] < row["m"]


def test_palma_plan_histogram_only(spark):
    plan = _plan_of(q_palma_ratio(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("documents.parquet") == 1
