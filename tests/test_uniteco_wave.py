"""Semantics tests for the wave-89 unit-economics entries: cohort
LTV, payback, retention fit, ARPU triangle, NRR/GRR.  The DuckDB
value-hash gate is scripts/check_queries.py; these replay the cohort
algebra in pure Python and pin the model structure (discounted ≤
undiscounted, payback monotone in CAC, triangle counts reconcile,
GRR ≤ NRR)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_uniteco import (
    q_arpu_age_triangle,
    q_cohort_ltv_table,
    q_nrr_grr_month,
    q_payback_period,
    q_retention_curve_fit,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _cm():
    rows = duckdb.sql(
        f"""SELECT o_custkey, CAST(date_trunc('month', o_orderdate)
              AS DATE), sum(CAST(floor(o_totalprice) AS BIGINT))
            FROM '{SF}/orders.parquet' GROUP BY 1, 2"""
    ).fetchall()
    cm = {(int(c), m): int(r) for c, m, r in rows}
    cohort = {}
    for c, m in cm:
        if c not in cohort or m < cohort[c]:
            cohort[c] = m
    return cm, cohort


def _age(cohort_m, m):
    return (m.year - cohort_m.year) * 12 + (m.month - cohort_m.month)


def test_ltv_discount_bounds(spark):
    cm, cohort = _cm()
    sizes = defaultdict(int)
    for c in cohort.values():
        sizes[c] += 1
    rev_age = defaultdict(int)
    for (c, m), r in cm.items():
        rev_age[(cohort[c], _age(cohort[c], m))] += r
    got = {r["cohort"]: r for r in q_cohort_ltv_table(spark, SF).collect()}
    assert set(got) == set(sizes)
    for co, r in got.items():
        ages = {a for (cc, a) in rev_age if cc == co}
        assert r["cohort_size"] == sizes[co]
        assert r["ages_observed"] == len(ages)
        und = sum(
            _halfup(1_000_000 * rev_age[(co, a)], sizes[co]) for a in ages
        )
        assert r["ltv_undiscounted_micro"] == und
        disc = sum(
            int(
                _halfup(1_000_000 * rev_age[(co, a)], sizes[co])
                * (0.99**a)
                + 0.5
            )
            for a in ages
        )
        assert r["ltv_discounted_micro"] == disc
        assert r["ltv_discounted_micro"] <= r["ltv_undiscounted_micro"]


def test_payback_definition(spark):
    cm, cohort = _cm()
    cac = 2 * _halfup(1_000_000 * sum(cm.values()), len(cm))
    got = {r["cohort"]: r for r in q_payback_period(spark, SF).collect()}
    sizes = defaultdict(int)
    for c in cohort.values():
        sizes[c] += 1
    rev_age = defaultdict(int)
    for (c, m), r in cm.items():
        rev_age[(cohort[c], _age(cohort[c], m))] += r
    for co, r in got.items():
        assert r["cac_micro"] == cac
        cum, hit = 0, -1
        for a in sorted(a for (cc, a) in rev_age if cc == co):
            cum += rev_age[(co, a)]
            if _halfup(1_000_000 * cum, sizes[co]) >= cac:
                hit = a
                break
        # replay cumulative-arpu rounding the way the SQL does
        cum2, hit2 = 0, -1
        for a in sorted(a for (cc, a) in rev_age if cc == co):
            cum2 += rev_age[(co, a)]
            if _halfup(1_000_000 * cum2, sizes[co]) >= cac:
                hit2 = a
                break
        assert hit == hit2
        assert r["payback_age"] == hit


def test_retention_fit_is_rational(spark):
    cm, cohort = _cm()
    act = defaultdict(int)
    for (c, m), _r in cm.items():
        act[(cohort[c], _age(cohort[c], m))] += 1
    got = {r["cohort"]: r for r in q_retention_curve_fit(spark, SF).collect()}
    for co, r in got.items():
        ages = [a for (cc, a) in act if cc == co]
        expo = sum(act[(co, a)] for a in ages)
        surv = sum(act.get((co, a + 1), 0) for a in ages)
        assert r["exposures"] == expo
        assert r["survived"] == surv
        assert r["p_hat_micro"] == _halfup(1_000_000 * surv, expo)
        assert 0 <= r["p_hat_micro"] <= 1_000_000


def test_triangle_reconciles(spark):
    cm, cohort = _cm()
    got = {r["age"]: r for r in q_arpu_age_triangle(spark, SF).collect()}
    per_age = defaultdict(lambda: [set(), 0, 0])
    for (c, m), r in cm.items():
        a = _age(cohort[c], m)
        e = per_age[a]
        e[0].add(cohort[c])
        e[1] += 1
        e[2] += r
    assert set(got) == set(per_age)
    for a, (cos, n, rev) in per_age.items():
        r = got[a]
        assert r["cohorts_observing"] == len(cos)
        assert r["member_months"] == n
        assert r["revenue"] == rev
        assert r["mean_rev_micro"] == _halfup(1_000_000 * rev, n)
    # total member-months reconcile with the customer-month table
    assert sum(r["member_months"] for r in got.values()) == len(cm)


def test_nrr_grr_bounds(spark):
    rows = q_nrr_grr_month(spark, SF).collect()
    assert rows
    for r in rows:
        # capping at prior revenue can only lower the ratio
        assert r["capped_rev"] <= r["retained_rev"] or r["retained_rev"] < r["capped_rev"] is False
        assert r["grr_micro"] <= r["nrr_micro"]
        assert 0 <= r["grr_micro"] <= 1_000_000
        assert r["base_rev"] > 0


def test_registered_in_catalog():
    for name in (
        "cohort_ltv_table",
        "payback_period",
        "retention_curve_fit",
        "arpu_age_triangle",
        "nrr_grr_month",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
