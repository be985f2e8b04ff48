"""Semantics tests for the wave-80 CBO-statistics entries: stats
table, equi-depth selectivity audit, independence audit, MCV model,
sampled-NDV extrapolation.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against pure-Python
recomputations plus the estimator-theory structure (buckets partition
the table, MCV estimates are exact for MCV members, the MCV list
comes from TakeOrderedAndProject — never a global rank window)."""

from __future__ import annotations

import contextlib
import hashlib
import io
from collections import Counter

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_cbostats import (
    _MCV_K,
    _NBUCKETS,
    _NDV_PCT,
    _RANGES,
    q_cbo_stats_table,
    q_conjunction_independence_audit,
    q_equidepth_selectivity_audit,
    q_mcv_equality_audit,
    q_ndv_sample_extrapolation,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _prices():
    return sorted(
        int(v)
        for (v,) in duckdb.sql(
            f"SELECT CAST(floor(o_totalprice) AS BIGINT)"
            f" FROM '{SF}/orders.parquet'"
        ).fetchall()
    )


def _local_buckets(ps):
    n = len(ps)
    ubs = []
    for k in range(1, _NBUCKETS + 1):
        rk = -(-k * n // _NBUCKETS)
        ubs.append(ps[rk - 1])
    lbs = [ps[0] - 1] + ubs[:-1]
    return list(zip(range(1, _NBUCKETS + 1), lbs, ubs))


def test_stats_table_partitions_table(spark):
    ps = _prices()
    got = {r["k"]: r for r in q_cbo_stats_table(spark, SF).collect()}
    assert set(got) == set(range(1, _NBUCKETS + 1))
    for k, lb, ub in _local_buckets(ps):
        inb = [p for p in ps if lb < p <= ub]
        r = got[k]
        assert (r["lb"], r["ub"]) == (lb, ub)
        assert r["n_rows"] == len(inb)
        assert r["ndv"] == len(set(inb))
    # buckets partition the table exactly
    assert sum(r["n_rows"] for r in got.values()) == len(ps)


def test_selectivity_audit_matches_local(spark):
    ps = _prices()
    bks = _local_buckets(ps)
    cnt = Counter(ps)
    vmin, vmax = ps[0], ps[-1]
    got = {
        r["range_id"]: r
        for r in q_equidepth_selectivity_audit(spark, SF).collect()
    }
    assert set(got) == set(range(len(_RANGES)))
    for i, (a_pct, b_pct) in enumerate(_RANGES):
        a_cut = vmin + (vmax - vmin) * a_pct // 100
        b_cut = vmin + (vmax - vmin) * b_pct // 100
        est = 0
        for k, lb, ub in bks:
            rows_k = sum(m for v, m in cnt.items() if lb < v <= ub)
            ov = max(0, min(b_cut, ub) - max(a_cut, lb))
            est += _halfup(1_000_000 * rows_k * ov, ub - lb)
        actual = sum(m for v, m in cnt.items() if a_cut < v <= b_cut)
        r = got[i]
        assert (r["a_cut"], r["b_cut"]) == (a_cut, b_cut)
        assert r["est_rows_micro"] == est
        assert r["actual_rows"] == actual
        assert r["err_rows_micro"] == est - 1_000_000 * actual


def test_independence_audit_matches_local(spark):
    rows = duckdb.sql(
        f"SELECT o_orderstatus, o_orderpriority"
        f" FROM '{SF}/orders.parquet'"
    ).fetchall()
    n = len(rows)
    joint = Counter(rows)
    cs = Counter(s for s, _p in rows)
    cp = Counter(p for _s, p in rows)
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): r
        for r in q_conjunction_independence_audit(spark, SF).collect()
    }
    assert set(got) == set(joint)
    for (s, p), actual in joint.items():
        r = got[(s, p)]
        est = _halfup(1_000_000 * cs[s] * cp[p], n)
        assert r["actual_rows"] == actual
        assert r["cnt_s"] == cs[s] and r["cnt_p"] == cp[p]
        assert r["est_rows_micro"] == est
        assert r["err_rows_micro"] == est - 1_000_000 * actual


def test_mcv_audit_model(spark):
    keys = [
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT o_custkey FROM '{SF}/orders.parquet'"
        ).fetchall()
    ]
    freq = Counter(keys)
    n, ndv = len(keys), len(freq)
    mcv = sorted(freq.items(), key=lambda t: (-t[1], t[0]))[:_MCV_K]
    mcv_keys = {k for k, _c in mcv}
    mcv_sum = sum(c for _k, c in mcv)
    nonmcv = sorted(k for k in freq if k not in mcv_keys)[:_MCV_K]
    got = {r["o_custkey"]: r for r in q_mcv_equality_audit(spark, SF).collect()}
    assert set(got) == mcv_keys | set(nonmcv)
    rest_est = _halfup(1_000_000 * (n - mcv_sum), ndv - _MCV_K)
    for k, r in got.items():
        assert r["actual_rows"] == freq[k]
        if k in mcv_keys:
            assert r["in_mcv"] == 1
            # MCV members are estimated exactly
            assert r["est_rows_micro"] == 1_000_000 * freq[k]
            assert r["err_rows_micro"] == 0
        else:
            assert r["in_mcv"] == 0
            assert r["est_rows_micro"] == rest_est


def test_ndv_extrapolation_matches_local(spark):
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()

    def h16(x):
        return int(hashlib.md5(str(int(x)).encode()).hexdigest()[:4], 16)

    samp = [int(c) for o, c in rows if h16(o) % _NDV_PCT == 0]
    cnt = Counter(samp)
    d, f1 = len(cnt), sum(1 for c in cnt.values() if c == 1)
    f2 = sum(1 for c in cnt.values() if c == 2)
    exact = len({int(c) for _o, c in rows})
    r = q_ndv_sample_extrapolation(spark, SF).collect()[0]
    assert r["sample_rows"] == len(samp)
    assert r["d_sample"] == d and r["f1"] == f1 and r["f2"] == f2
    gee = int((_NDV_PCT**0.5) * f1 + (d - f1))
    assert r["gee_ndv"] == gee
    assert r["jk1_ndv"] == d + (_NDV_PCT - 1) * f1
    assert r["exact_ndv"] == exact
    assert r["gee_err"] == gee - exact
    assert r["jk1_err"] == r["jk1_ndv"] - exact


def test_mcv_plan_uses_take_ordered(spark):
    """The K-row MCV list must come from TakeOrderedAndProject — a
    global rank window over every key would be the scale anti-pattern."""
    df = q_mcv_equality_audit(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_registered_in_catalog():
    for name in (
        "cbo_stats_table",
        "equidepth_selectivity_audit",
        "conjunction_independence_audit",
        "mcv_equality_audit",
        "ndv_sample_extrapolation",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
