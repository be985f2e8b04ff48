"""Semantics tests for the wave-73 algebraic-identity entries.  The
DuckDB value-hash gate is scripts/check_queries.py; these verify the
matches flags are TRUE on the fixture, the component counts agree
with independent duckdb reruns, and the Spark plans use the join
strategies the identities certify."""

from __future__ import annotations

import contextlib
import io

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_identities import (
    _ACCTBAL,
    q_agg_pushdown_equiv,
    q_filter_union_equiv,
    q_outer_join_decomposition,
    q_rollup_consistency,
    q_semijoin_rewrite_equiv,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _tbl(name: str) -> str:
    return f"'{SF}/{name}.parquet'"


def test_semijoin_identity_holds(spark):
    [r] = q_semijoin_rewrite_equiv(spark, SF).collect()
    assert r["matches"]
    want = duckdb.sql(
        f"""SELECT count(*) FROM {_tbl('orders')} o
            WHERE o.o_custkey IN (
              SELECT c_custkey FROM {_tbl('customer')}
              WHERE c_acctbal > {_ACCTBAL})"""
    ).fetchone()[0]
    assert r["n_semi"] == want
    assert r["n_semi"] + r["n_anti"] == r["n_orders"]
    assert 0 < r["n_semi"] < r["n_orders"]  # the predicate bites


def test_semijoin_plan_uses_semi_and_anti(spark):
    plan = _plan_of(q_semijoin_rewrite_equiv(spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_outer_join_decomposition_holds(spark):
    [r] = q_outer_join_decomposition(spark, SF).collect()
    assert r["matches"]
    inner = duckdb.sql(
        f"""SELECT count(*) FROM {_tbl('customer')} c
            JOIN {_tbl('orders')} o ON o.o_custkey = c.c_custkey"""
    ).fetchone()[0]
    assert r["n_inner"] == inner
    assert r["n_full"] == r["n_inner"] + r["n_left_only"] + r["n_right_only"]


def test_agg_pushdown_equiv_holds(spark):
    [r] = q_agg_pushdown_equiv(spark, SF).collect()
    assert r["matches"]
    assert r["n_diff"] == 0
    want = duckdb.sql(
        f"""SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
            FROM {_tbl('lineitem')} l
            JOIN {_tbl('orders')} o ON o.o_orderkey = l.l_orderkey"""
    ).fetchone()[0]
    assert r["total_a"] == r["total_b"] == want


def test_filter_union_equiv_holds(spark):
    [r] = q_filter_union_equiv(spark, SF).collect()
    assert r["matches"]
    assert r["n_or"] == r["n_a"] + r["n_b"] - r["n_ab"]
    # both predicates select something and overlap on the fixture
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["n_or"] <= r["n_a"] + r["n_b"]


def test_rollup_consistency_holds(spark):
    [r] = q_rollup_consistency(spark, SF).collect()
    assert r["matches"]
    n = duckdb.sql(f"SELECT count(*) FROM {_tbl('orders')}").fetchone()[0]
    assert r["grand"] == r["sum_level1"] == r["sum_level2"] == n
    assert r["n_groups_level2"] >= 1


def test_registered_in_catalog():
    for name in (
        "semijoin_rewrite_equiv",
        "outer_join_decomposition",
        "agg_pushdown_equiv",
        "filter_union_equiv",
        "rollup_consistency",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
