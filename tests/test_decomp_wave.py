"""Semantics tests for the wave-86 decomposition entries: P/V split,
revenue bridge, shift-share, ABC migration, Pareto shift.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin the exact
reconciliation identities (bridge components sum to the total, P/V
residual bounded by rounding, shift residuals sum to ~0)."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_decomp import (
    q_abc_migration_matrix,
    q_pareto_shift_audit,
    q_price_volume_mix_decomp,
    q_revenue_bridge,
    q_shift_share_analysis,
)

SF = "/root/testdata/sf0.001"


def _mid():
    lo, hi = duckdb.sql(
        f"SELECT min(CAST(l_shipdate AS DATE)), max(CAST(l_shipdate AS DATE))"
        f" FROM '{SF}/lineitem.parquet'"
    ).fetchall()[0]
    return lo + timedelta(days=(hi - lo).days // 2)


def _ppp():
    mid = _mid()
    rows = duckdb.sql(
        f"""SELECT l_partkey, CAST(l_shipdate AS DATE),
              CAST(floor(l_extendedprice) AS BIGINT),
              CAST(floor(l_quantity) AS BIGINT)
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    agg = defaultdict(lambda: [0, 0])
    for p, d, r, q in rows:
        per = 1 if d <= mid else 2
        agg[(int(p), per)][0] += int(r)
        agg[(int(p), per)][1] += int(q)
    return agg


def test_pv_decomposition_reconciles(spark):
    agg = _ppp()
    got = {r["l_partkey"]: r for r in q_price_volume_mix_decomp(spark, SF).collect()}
    parts1 = {p for p, per in agg if per == 1 and agg[(p, 1)][1] > 0}
    parts2 = {p for p, per in agg if per == 2 and agg[(p, 2)][1] > 0}
    assert set(got) == parts1 & parts2
    for p, r in got.items():
        r1, q1 = agg[(p, 1)]
        r2, q2 = agg[(p, 2)]
        assert (r["r1"], r["q1"], r["r2"], r["q2"]) == (r1, q1, r2, q2)
        assert r["delta_micro"] == 1_000_000 * (r2 - r1)
        # the rational identity leaves only half-up rounding residue
        assert abs(r["resid_micro"]) <= 2
        assert (
            r["volume_effect_micro"]
            + r["price_effect_micro"]
            + r["resid_micro"]
            == r["delta_micro"]
        )


def test_bridge_reconciles_exactly(spark):
    agg = _ppp()
    r1tot = sum(v[0] for (p, per), v in agg.items() if per == 1)
    r2tot = sum(v[0] for (p, per), v in agg.items() if per == 2)
    r = q_revenue_bridge(spark, SF).collect()[0]
    assert r["delta_total"] == r2tot - r1tot
    assert (
        r["new_revenue"]
        + r["churned_revenue"]
        + r["expansion"]
        + r["contraction"]
        == r["delta_total"]
    )
    assert bool(r["reconciles"]) is True
    assert r["new_revenue"] >= 0 and r["expansion"] >= 0
    assert r["churned_revenue"] <= 0 and r["contraction"] <= 0


def test_shift_share_residuals_cancel(spark):
    rows = q_shift_share_analysis(spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r["actual_delta_micro"]
            == r["expected_delta_micro"] + r["regional_shift_micro"]
        )
    # expected deltas apportion the national delta: the shifts nearly
    # cancel (only half-up rounding survives)
    assert abs(sum(r["regional_shift_micro"] for r in rows)) <= len(rows) * 1_000_000


def test_abc_migration_covers_all_parts(spark):
    agg = _ppp()
    parts1 = {p for p, per in agg if per == 1}
    parts2 = {p for p, per in agg if per == 2}
    rows = q_abc_migration_matrix(spark, SF).collect()
    total = sum(r["n_parts"] for r in rows)
    assert total == len(parts1 | parts2)
    classes = {(r["from_class"], r["to_class"]) for r in rows}
    for f, t in classes:
        assert f in ("A", "B", "C", "NEW")
        assert t in ("A", "B", "C", "GONE")
    # P2 revenue in the matrix sums to the full P2 revenue
    r2tot = sum(v[0] for (p, per), v in agg.items() if per == 2)
    assert sum(r["p2_revenue"] for r in rows) == r2tot


def test_pareto_shift_bounds(spark):
    r = q_pareto_shift_audit(spark, SF).collect()[0]
    # top decile holds at least its proportional share
    assert r["share1_micro"] >= 100_000 and r["share2_micro"] >= 100_000
    assert r["share1_micro"] <= 1_000_000 and r["share2_micro"] <= 1_000_000
    assert r["shift_micro"] == r["share2_micro"] - r["share1_micro"]
    agg = _ppp()
    assert r["n1"] == len({p for p, per in agg if per == 1})
    assert r["n2"] == len({p for p, per in agg if per == 2})


def test_registered_in_catalog():
    for name in (
        "price_volume_mix_decomp",
        "revenue_bridge",
        "shift_share_analysis",
        "abc_migration_matrix",
        "pareto_shift_audit",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
