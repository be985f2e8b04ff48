"""Semantics tests for the wave-83 join-pruning entries: min/max and
Bloom runtime filters, Bloom size calibration, DPP partition pruning,
semi-join reduction ledger.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin the filter-theory structure: NO
false negatives ever (every true match passes every filter), FP rate
falls as m grows, pruning counts reconcile."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_joinprune import (
    _BLOOM_K,
    _BR_BITS,
    _BSC_BITS_GRID,
    _SEG,
    q_bloom_runtime_filter_audit,
    q_bloom_size_calibration,
    q_dpp_partition_prune_audit,
    q_minmax_runtime_filter_audit,
    q_semijoin_reduction_ledger,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _dim_keys():
    return {
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT c_custkey FROM '{SF}/customer.parquet'"
            f" WHERE c_mktsegment = '{_SEG}'"
        ).fetchall()
    }


def _fact_keys():
    return [
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT o_custkey FROM '{SF}/orders.parquet'"
        ).fetchall()
    ]


def _positions(key: int, m_bits: int):
    out = []
    for i in range(_BLOOM_K):
        h = hashlib.md5(f"{key}:j{i}".encode()).hexdigest()
        out.append(int(h[:4], 16) % m_bits)
    return out


def test_minmax_filter_no_false_negatives(spark):
    dim = _dim_keys()
    fact = _fact_keys()
    kmin, kmax = min(dim), max(dim)
    passed = sum(1 for k in fact if kmin <= k <= kmax)
    matches = sum(1 for k in fact if k in dim)
    r = q_minmax_runtime_filter_audit(spark, SF).collect()[0]
    assert r["n_dim_keys"] == len(dim)
    assert (r["kmin"], r["kmax"]) == (kmin, kmax)
    assert r["fact_rows"] == len(fact)
    assert r["passed_rows"] == passed
    assert r["match_rows"] == matches
    # the range filter can never drop a true match
    assert passed >= matches
    assert r["pass_micro"] == _halfup(1_000_000 * passed, len(fact))
    assert r["overscan_micro"] == _halfup(
        1_000_000 * (passed - matches), passed
    )


def test_bloom_filter_no_false_negatives(spark):
    dim = _dim_keys()
    fact = _fact_keys()
    words = Counter()
    bits = {}
    for k in dim:
        for p in _positions(k, _BR_BITS):
            bits[p // 32] = bits.get(p // 32, 0) | (1 << (p % 32))

    def passes(k):
        return all(
            bits.get(p // 32, 0) & (1 << (p % 32)) for p in _positions(k, _BR_BITS)
        )

    passed = sum(1 for k in fact if passes(k))
    matches = sum(1 for k in fact if k in dim)
    r = q_bloom_runtime_filter_audit(spark, SF).collect()[0]
    assert r["m_bits"] == _BR_BITS
    assert r["fact_rows"] == len(fact)
    assert r["passed_rows"] == passed
    assert r["match_rows"] == matches
    assert r["fp_rows"] == passed - matches
    # Bloom property: every member passes
    for k in fact:
        if k in dim:
            assert passes(k)


def test_bloom_calibration_monotone(spark):
    rows = {r["m_bits"]: r for r in q_bloom_size_calibration(spark, SF).collect()}
    assert set(rows) == set(_BSC_BITS_GRID)
    dim = _dim_keys()
    probe = sorted({k for k in _fact_keys() if k not in dim})
    for m_bits in _BSC_BITS_GRID:
        bits = {}
        for k in dim:
            for p in _positions(k, m_bits):
                bits[p // 32] = bits.get(p // 32, 0) | (1 << (p % 32))
        fp = sum(
            1
            for k in probe
            if all(
                bits.get(p // 32, 0) & (1 << (p % 32))
                for p in _positions(k, m_bits)
            )
        )
        r = rows[m_bits]
        assert r["n_member_keys"] == len(dim)
        assert r["probe_keys"] == len(probe)
        assert r["fp_keys"] == fp
        assert r["fp_measured_micro"] == _halfup(1_000_000 * fp, len(probe))
        theory = (1.0 - math.exp(-_BLOOM_K * len(dim) / m_bits)) ** _BLOOM_K
        assert abs(r["fp_theory_micro"] - int(theory * 1e6 + 0.5)) <= 1
    # bigger filter -> fewer false positives
    fps = [rows[m]["fp_keys"] for m in sorted(_BSC_BITS_GRID)]
    assert fps == sorted(fps, reverse=True)


def test_dpp_counts_reconcile(spark):
    dim = _dim_keys()
    rows = duckdb.sql(
        f"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE),
              o_custkey FROM '{SF}/orders.parquet'"""
    ).fetchall()
    parts = {}
    for m, k in rows:
        t, mt = parts.get(m, (0, 0))
        parts[m] = (t + 1, mt + (1 if int(k) in dim else 0))
    kept = {m for m, (t, mt) in parts.items() if mt > 0}
    r = q_dpp_partition_prune_audit(spark, SF).collect()[0]
    assert r["total_partitions"] == len(parts)
    assert r["partitions_kept"] == len(kept)
    assert r["rows_total"] == len(rows)
    assert r["rows_scanned"] == sum(t for m, (t, _mt) in parts.items() if m in kept)
    assert r["rows_matching"] == sum(mt for _t, mt in parts.values())
    assert r["rows_matching"] <= r["rows_scanned"] <= r["rows_total"]


def test_semijoin_ledger_partitions_fact(spark):
    fact = _fact_keys()
    seg_of = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_mktsegment FROM '{SF}/customer.parquet'"
        ).fetchall()
    )
    per = Counter(seg_of[k] for k in fact if k in seg_of)
    got = {r["c_mktsegment"]: r for r in q_semijoin_reduction_ledger(spark, SF).collect()}
    for seg, r in got.items():
        assert r["match_rows"] == per.get(seg, 0)
        assert r["fact_rows"] == len(fact)
        assert r["reduction_micro"] == _halfup(
            1_000_000 * (len(fact) - per.get(seg, 0)), len(fact)
        )
    # every fact row matches exactly one segment (FK into customer)
    assert sum(r["match_rows"] for r in got.values()) == len(fact)


def test_registered_in_catalog():
    for name in (
        "minmax_runtime_filter_audit",
        "bloom_runtime_filter_audit",
        "bloom_size_calibration",
        "dpp_partition_prune_audit",
        "semijoin_reduction_ledger",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
