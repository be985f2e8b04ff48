"""Semantics tests for the wave-90 span-analytics entries — these
drive the REAL Arrow extraction pipeline and pin the span geometry
the SQL oracles predict: per-branch offsets, multi-block layout,
coverage arithmetic, ordering certification, confidence floor."""

from __future__ import annotations

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_spans import (
    _MIN_AREA_SAFE,
    q_confidence_gate_audit,
    q_multiblock_span_ledger,
    q_reading_order_span_audit,
    q_span_coverage_by_method,
    q_span_offset_audit,
)

SF = "/root/testdata/sf0.001"

_PFX = {"html": 15, "pdf_text": 0, "markup": 4, "plain": 0}
_Y = {"html": 0, "pdf_text": 100, "markup": 1, "plain": 0}
_WRAP = {"html": 33, "pdf_text": 92, "markup": 8, "plain": 0}
_METHOD = {0: "html", 1: "pdf_text", 2: "markup", 3: "plain"}


def _docs():
    return {
        int(d): int(n)
        for d, n in duckdb.sql(
            f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
        ).fetchall()
    }


def test_span_offsets_exact(spark):
    docs = _docs()
    got = {r["doc_id"]: r for r in q_span_offset_audit(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, n in docs.items():
        r = got[d]
        m = _METHOD[d % 4]
        assert r["method"] == m
        assert r["span_start"] == _PFX[m]
        assert r["span_end"] == _PFX[m] + n
        assert r["span_y"] == _Y[m]
        assert bool(r["len_matches"]) is True


def test_multiblock_layout_exact(spark):
    docs = {d: n for d, n in _docs().items() if n >= _MIN_AREA_SAFE}
    got = {r["doc_id"]: r for r in q_multiblock_span_ledger(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, n in docs.items():
        r = got[d]
        assert r["n_blocks"] == 2
        assert (r["s1"], r["e1"]) == (8, 8 + n)
        assert (r["s2"], r["e2"]) == (15 + n, 15 + 2 * n)
        assert r["gap"] == 7
        assert r["out_len"] == 2 * n + 1
        assert bool(r["assembled_matches"]) is True


def test_coverage_arithmetic(spark):
    docs = _docs()
    got = {r["method"]: r for r in q_span_coverage_by_method(spark, SF).collect()}
    assert set(got) == set(_PFX)
    for m, r in got.items():
        members = [n for d, n in docs.items() if _METHOD[d % 4] == m]
        assert r["turns"] == len(members)
        assert r["span_mass"] == sum(members)
        assert r["payload_len"] == sum(n + _WRAP[m] for n in members)
        # the plain branch covers everything exactly
        if m == "plain":
            assert r["coverage_micro"] == 1_000_000
        else:
            assert r["coverage_micro"] < 1_000_000


def test_reading_order_certified(spark):
    r = q_reading_order_span_audit(spark, SF).collect()[0]
    assert r["n_docs"] == sum(
        1 for n in _docs().values() if n >= _MIN_AREA_SAFE
    )
    assert bool(r["all_two_blocks"]) is True
    assert bool(r["all_ordered"]) is True
    assert bool(r["all_nonoverlapping"]) is True
    assert bool(r["all_assembled"]) is True


def test_confidence_floor(spark):
    got = {r["method"]: r for r in q_confidence_gate_audit(spark, SF).collect()}
    for m, r in got.items():
        assert r["min_conf_micro"] == 1_000_000
        assert r["mean_conf_micro"] == 1_000_000
    assert sum(r["n_blocks"] for r in got.values()) == len(_docs())


def test_registered_in_catalog():
    for name in (
        "span_offset_audit",
        "multiblock_span_ledger",
        "span_coverage_by_method",
        "reading_order_span_audit",
        "confidence_gate_audit",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
