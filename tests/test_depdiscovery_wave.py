"""Semantics tests for the wave-93 dependency-discovery entries: FD
scan, g3 errors, IND scan, key discovery, transitivity.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin the profiling
theory: construction-guaranteed FDs are discovered, the FK lattice
holds and the negatives fail, g3 = 0 iff the FD holds, transitivity
closes universally."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_depdiscovery import (
    _FD_COLS,
    _IND_NEG,
    _IND_POS,
    q_afd_g3_error,
    q_fd_candidate_scan,
    q_fd_transitivity_check,
    q_ind_discovery_scan,
    q_key_discovery_audit,
)

SF = "/root/testdata/sf0.001"


def _base():
    return duckdb.sql(
        f"""SELECT p_partkey, p_name, p_brand, p_type, p_size,
              substr(p_brand, 1, 6), length(p_name)
            FROM '{SF}/part.parquet'"""
    ).fetchall()


def _col(rows, name):
    i = _FD_COLS.index(name)
    return [str(r[i]) for r in rows]


def test_fd_scan_discovers_guaranteed(spark):
    got = {r["pair"]: r for r in q_fd_candidate_scan(spark, SF).collect()}
    assert len(got) == len(_FD_COLS) * (len(_FD_COLS) - 1)
    # construction-guaranteed FDs
    for pair in (
        "p_partkey>p_name",
        "p_partkey>p_brand",
        "p_partkey>brand_pfx",
        "p_brand>brand_pfx",
        "p_name>name_len",
    ):
        assert bool(got[pair]["holds"]) is True, pair
    # local recomputation of one non-trivial pair
    rows = _base()
    a, b = _col(rows, "p_brand"), _col(rows, "p_type")
    groups = defaultdict(set)
    for x, y in zip(a, b):
        groups[x].add(y)
    r = got["p_brand>p_type"]
    assert r["lhs_groups"] == len(groups)
    assert r["violating_groups"] == sum(1 for v in groups.values() if len(v) > 1)
    assert bool(r["holds"]) is (r["violating_groups"] == 0)


def test_g3_zero_iff_holds(spark):
    fd = {r["pair"]: bool(r["holds"]) for r in q_fd_candidate_scan(spark, SF).collect()}
    g3 = {r["pair"]: r for r in q_afd_g3_error(spark, SF).collect()}
    assert set(fd) == set(g3)
    rows = _base()
    n = len(rows)
    for pair, r in g3.items():
        assert r["n_rows"] == n
        assert (r["g3_micro"] == 0) == fd[pair]
        assert (r["rows_to_delete"] == 0) == fd[pair]
    # local replay for one pair
    a, b = _col(rows, "p_type"), _col(rows, "p_size")
    best = defaultdict(lambda: defaultdict(int))
    for x, y in zip(a, b):
        best[x][y] += 1
    keep = sum(max(d.values()) for d in best.values())
    assert g3["p_type>p_size"]["rows_to_delete"] == n - keep


def test_ind_lattice_and_negatives(spark):
    got = {r["candidate"]: r for r in q_ind_discovery_scan(spark, SF).collect()}
    for lt, lc, rt, rc in _IND_POS:
        r = got[f"{lt}.{lc} ⊆ {rt}.{rc}"]
        assert bool(r["holds"]) is True
        assert r["missing_values"] == 0
    for lt, lc, rt, rc in _IND_NEG:
        r = got[f"{lt}.{lc} ⊆ {rt}.{rc}"]
        assert bool(r["holds"]) is False
        assert r["missing_values"] > 0


def test_key_discovery(spark):
    got = {r["candidate"]: r for r in q_key_discovery_audit(spark, SF).collect()}
    assert bool(got["part.p_partkey"]["is_key"]) is True
    assert bool(got["orders.o_orderkey"]["is_key"]) is True
    assert bool(got["part.p_brand"]["is_key"]) is False
    for r in got.values():
        assert 0 < r["uniqueness_micro"] <= 1_000_000
        assert (r["uniqueness_micro"] == 1_000_000) == bool(r["is_key"])
    # the fixture's composite lineitem key is known NON-unique
    # (pinned by the contract wave) — just assert consistency here
    comp = got["lineitem.(l_orderkey,l_linenumber)"]
    assert comp["n_distinct"] <= comp["n_rows"]


def test_transitivity_universal(spark):
    rows = q_fd_transitivity_check(spark, SF).collect()
    assert rows  # derived columns guarantee chains exist
    for r in rows:
        assert bool(r["a_to_c_holds"]) is True, r


def test_registered_in_catalog():
    for name in (
        "fd_candidate_scan",
        "afd_g3_error",
        "ind_discovery_scan",
        "key_discovery_audit",
        "fd_transitivity_check",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
