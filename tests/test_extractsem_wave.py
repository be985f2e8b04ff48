"""Semantics tests for the wave-97 extraction-semantics entries —
every identity flag must be universally true (the SQL oracle already
predicts each row; these assert the flags and spot-check one row per
entry against an independent local computation)."""

from __future__ import annotations

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_extractsem import (
    _ENT_OUT,
    _ENT_RAW,
    _MIN_AREA_SAFE,
    _NUM_OUT,
    _NUM_RAW,
    q_entity_decode_audit,
    q_fallback_empty_audit,
    q_numeric_entity_audit,
    q_tool_turn_line_blocks,
    q_whitespace_canon_audit,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return {
        int(d): int(n)
        for d, n in duckdb.sql(
            f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
            f" WHERE n_chars >= {_MIN_AREA_SAFE}"
        ).fetchall()
    }


def test_entity_decode_flags(spark):
    docs = _docs()
    rows = q_entity_decode_audit(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert bool(r["span_covers_raw"]) is True
        assert bool(r["text_is_decoded"]) is True
        n = docs[r["doc_id"]]
        assert r["e1"] - r["s1"] == n + _ENT_RAW
        assert r["out_len"] == n + _ENT_OUT
    # the constants really describe the planted suffix
    assert _ENT_RAW == len(' &amp; &lt;x&gt; &quot;q&quot;')
    assert _ENT_OUT == len(' & <x> "q"')


def test_numeric_entity_flags(spark):
    rows = q_numeric_entity_audit(spark, SF).collect()
    for r in rows:
        assert bool(r["span_covers_raw"]) is True
        assert bool(r["text_is_decoded"]) is True
    assert _NUM_RAW == len(" &#65;&#x42;")
    assert _NUM_OUT == len(" AB")


def test_whitespace_canon_flags(spark):
    docs = _docs()
    rows = q_whitespace_canon_audit(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert bool(r["span_covers_raw"]) is True
        assert bool(r["text_is_canonical"]) is True
        assert r["out_len"] == 2 * docs[r["doc_id"]] + 1


def test_fallback_never_raises_never_emits(spark):
    rows = q_fallback_empty_audit(spark, SF).collect()
    assert {r["planted_class"] for r in rows} == {0, 1, 2, 3}
    total = 0
    for r in rows:
        assert r["total_blocks"] == 0
        assert bool(r["all_empty_text"]) is True
        total += r["n_rows"]
    n_all = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchall()[0][0]
    assert total == n_all


def test_tool_dispatch_and_line_blocks(spark):
    docs = _docs()
    rows = q_tool_turn_line_blocks(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r["method"] == "plain"
        assert r["n_blocks"] == 2
        assert bool(r["line_offsets_exact"]) is True


def test_registered_in_catalog():
    for name in (
        "entity_decode_audit",
        "numeric_entity_audit",
        "whitespace_canon_audit",
        "fallback_empty_audit",
        "tool_turn_line_blocks",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
