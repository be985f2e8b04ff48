"""Semantics tests for the wave-98 pipeline certifications — each
certificate's flags must hold and its counts must equal the corpus
size; a failure here means the extraction job broke one of its
operational contracts (lineage, determinism, salt invariance,
registry dispatch, fast-path parity)."""

from __future__ import annotations

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_pipelinecert import (
    _SNAP,
    q_fastpath_parity_audit,
    q_idempotent_rerun_audit,
    q_lineage_columns_audit,
    q_salted_repartition_equiv,
    q_strategy_registry_equiv,
)

SF = "/root/testdata/sf0.001"


def _n_docs():
    return duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchall()[0][0]


def test_lineage_stamped(spark):
    r = q_lineage_columns_audit(spark, SF).collect()[0]
    assert r["n_rows"] == _n_docs()
    assert r["n_snapshots"] == 1
    assert r["snapshot_id"] == _SNAP
    assert r["n_versions"] == 1
    assert bool(r["partitions_in_range"]) is True


def _assert_cert(r, n):
    assert r["n_rows"] == n
    assert r["n_matched"] == n
    assert r["n_unmatched"] == 0
    assert bool(r["all_text_equal"]) is True


def test_idempotent_rerun(spark):
    _assert_cert(q_idempotent_rerun_audit(spark, SF).collect()[0], _n_docs())


def test_salt_invariance(spark):
    _assert_cert(q_salted_repartition_equiv(spark, SF).collect()[0], _n_docs())


def test_registry_dispatch(spark):
    _assert_cert(q_strategy_registry_equiv(spark, SF).collect()[0], _n_docs())


def test_fastpath_parity(spark):
    _assert_cert(q_fastpath_parity_audit(spark, SF).collect()[0], _n_docs())


def test_registered_in_catalog():
    for name in (
        "lineage_columns_audit",
        "idempotent_rerun_audit",
        "salted_repartition_equiv",
        "strategy_registry_equiv",
        "fastpath_parity_audit",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
