"""Extraction-semantics certification catalog, round 4 (wave 97):
five operators extending the wave-90 span program to the D1
preprocessing, S4/S5 dispatch + fallback, and R1 guard semantics of
the REAL Arrow extractor — each planted payload's decode/canon
arithmetic is reproduced EXACTLY in SQL, so the per-turn contract is
value-hash-checked end to end (reference parity: ocr_skel's entity
decode and whitespace canonicalization in preprocessing, the dual
path's fallback, and the empty-crop guard).

Payload constructions (documents.text is single-spaced ASCII words,
n = n_chars; pinned by the wave-90 identities):

* ``entity_decode_audit`` — ``<p>text &amp; &lt;x&gt; &quot;q&quot;
  </p>``: the block span covers the RAW inner source (n + 30) while
  the emitted text is decoded (n + 10) — both identities flagged per
  document.
* ``numeric_entity_audit`` — ``<p>text &#65;&#x42;</p>``: decimal
  and hex numeric references decode to 'AB' (out = n + 3, raw span =
  n + 12).
* ``whitespace_canon_audit`` — ``<p>text␣␣⇥␣text</p>``: the 4-char
  whitespace run canonicalizes to one space (out = 2n + 1) while the
  span still covers the raw 2n + 4 inner.
* ``fallback_empty_audit`` — four planted degenerate classes by
  doc_id mod 4 (truncated JSON, wrong-typed JSON ``blocks``, empty
  string, whitespace-only): per class the row count, total blocks
  (must be 0) and the all-empty-text flag — S5's fallback lands in
  the HTML path and the D2-D4 gates then reject, R1 guards the empty
  emission; nothing ever raises.
* ``tool_turn_line_blocks`` — role='tool' rows with ``text\\ntext``:
  dispatch must choose 'plain' and the line splitter must emit two
  blocks at exactly (0, n) and (n+1, 2n+1) — flags per document.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_extractsem_wave.py.

Cross-engine float policy: offsets and lengths only — exact BIGINTs.

Scale notes: one extraction pass per entry (single MapInArrow stage)
plus map-side arithmetic; no windows, no joins beyond the broadcast
n_chars lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_ENT_RAW = 30   # ' &amp; &lt;x&gt; &quot;q&quot;'
_ENT_OUT = 10   # ' & <x> "q"'
_NUM_RAW = 12   # ' &#65;&#x42;'
_NUM_OUT = 3    # ' AB'
_WS_RAW = 4     # '  \t '
_MIN_AREA_SAFE = 38


def _run_extract(spark, sf_dir: str, payload_expr) -> DataFrame:
    from .job import extract_detailed

    d = _t(spark, sf_dir, "documents").where(
        f"n_chars >= {_MIN_AREA_SAFE}"
    )
    tr = d.select(
        F.lit("conv").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        payload_expr.alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    from .job import extract_detailed as _ed  # noqa: F401

    det = extract_detailed(tr)
    return det


def _audit_frame(spark, sf_dir: str, payload_expr) -> DataFrame:
    det = _run_extract(spark, sf_dir, payload_expr)
    n = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "CAST(n_chars AS BIGINT) AS n"
    )
    per = det.select(
        F.col("turn_idx").cast("long").alias("doc_id"),
        F.size("blocks").cast("long").alias("n_blocks"),
        F.expr("blocks[0].span.start").cast("long").alias("s1"),
        F.expr("blocks[0].span.end").cast("long").alias("e1"),
        F.length("text").cast("long").alias("out_len"),
    )
    return per.join(n, "doc_id")


# ---------------------------------------------------------------------------
# entity_decode_audit
# ---------------------------------------------------------------------------


def q_entity_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-entity decode: raw-span vs decoded-text identities."""
    payload = F.concat(
        F.lit("<p>"),
        F.col("text"),
        F.lit(' &amp; &lt;x&gt; &quot;q&quot;</p>'),
    )
    return _audit_frame(spark, sf_dir, payload).selectExpr(
        "doc_id",
        "n_blocks",
        "s1",
        "e1",
        "out_len",
        f"e1 - s1 = n + {_ENT_RAW} AS span_covers_raw",
        f"out_len = n + {_ENT_OUT} AS text_is_decoded",
    )


ORACLE_ENTITY_DECODE_AUDIT = f"""
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_blocks,
       CAST(3 AS BIGINT) AS s1,
       CAST(3 + n_chars + {_ENT_RAW} AS BIGINT) AS e1,
       CAST(n_chars + {_ENT_OUT} AS BIGINT) AS out_len,
       TRUE AS span_covers_raw,
       TRUE AS text_is_decoded
FROM documents WHERE n_chars >= {_MIN_AREA_SAFE}
"""


# ---------------------------------------------------------------------------
# numeric_entity_audit
# ---------------------------------------------------------------------------


def q_numeric_entity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal + hex numeric references decode to literal chars."""
    payload = F.concat(
        F.lit("<p>"), F.col("text"), F.lit(" &#65;&#x42;</p>")
    )
    return _audit_frame(spark, sf_dir, payload).selectExpr(
        "doc_id",
        "n_blocks",
        "s1",
        "e1",
        "out_len",
        f"e1 - s1 = n + {_NUM_RAW} AS span_covers_raw",
        f"out_len = n + {_NUM_OUT} AS text_is_decoded",
    )


ORACLE_NUMERIC_ENTITY_AUDIT = f"""
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_blocks,
       CAST(3 AS BIGINT) AS s1,
       CAST(3 + n_chars + {_NUM_RAW} AS BIGINT) AS e1,
       CAST(n_chars + {_NUM_OUT} AS BIGINT) AS out_len,
       TRUE AS span_covers_raw,
       TRUE AS text_is_decoded
FROM documents WHERE n_chars >= {_MIN_AREA_SAFE}
"""


# ---------------------------------------------------------------------------
# whitespace_canon_audit
# ---------------------------------------------------------------------------


def q_whitespace_canon_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 4-char whitespace run collapses to one space in the text
    while the span still covers the raw inner."""
    payload = F.concat(
        F.lit("<p>"),
        F.col("text"),
        F.lit("  \t "),
        F.col("text"),
        F.lit("</p>"),
    )
    return _audit_frame(spark, sf_dir, payload).selectExpr(
        "doc_id",
        "n_blocks",
        "s1",
        "e1",
        "out_len",
        f"e1 - s1 = 2 * n + {_WS_RAW} AS span_covers_raw",
        "out_len = 2 * n + 1 AS text_is_canonical",
    )


ORACLE_WHITESPACE_CANON_AUDIT = f"""
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_blocks,
       CAST(3 AS BIGINT) AS s1,
       CAST(3 + 2 * n_chars + {_WS_RAW} AS BIGINT) AS e1,
       CAST(2 * n_chars + 1 AS BIGINT) AS out_len,
       TRUE AS span_covers_raw,
       TRUE AS text_is_canonical
FROM documents WHERE n_chars >= {_MIN_AREA_SAFE}
"""


# ---------------------------------------------------------------------------
# fallback_empty_audit
# ---------------------------------------------------------------------------


def q_fallback_empty_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate payloads never raise: per planted class the counts
    and the everything-empty flags."""
    from .job import extract_detailed

    d = _t(spark, sf_dir, "documents")
    payload = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit('{"blocks": [{"type": 0, "lines"'),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit('{"blocks": "not-a-list"}'))
        .when(F.col("doc_id") % 4 == 2, F.lit(""))
        .otherwise(F.lit("   \n  \t "))
    )
    tr = d.select(
        F.lit("conv").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        payload.alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    det = extract_detailed(tr)
    return (
        det.selectExpr(
            "CAST(turn_idx AS BIGINT) % 4 AS planted_class",
            "size(blocks) AS nb",
            "length(text) AS lt",
        )
        .groupBy("planted_class")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("nb").cast("long").alias("total_blocks"),
            F.expr("CAST(bool_and(lt = 0) AS BOOLEAN)").alias(
                "all_empty_text"
            ),
        )
    )


ORACLE_FALLBACK_EMPTY_AUDIT = """
SELECT CAST(doc_id % 4 AS BIGINT) AS planted_class,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS total_blocks,
       TRUE AS all_empty_text
FROM documents GROUP BY doc_id % 4
"""


# ---------------------------------------------------------------------------
# tool_turn_line_blocks
# ---------------------------------------------------------------------------


def q_tool_turn_line_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """role='tool' dispatches to 'plain'; the line splitter emits one
    block per line at exact offsets."""
    from .job import extract_detailed

    d = _t(spark, sf_dir, "documents").where(
        f"n_chars >= {_MIN_AREA_SAFE}"
    )
    tr = d.select(
        F.lit("conv").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.concat(F.col("text"), F.lit("\n"), F.col("text")).alias("text"),
        F.lit("bash").alias("tool"),
    )
    det = extract_detailed(tr)
    n = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "CAST(n_chars AS BIGINT) AS n"
    )
    per = det.select(
        F.col("turn_idx").cast("long").alias("doc_id"),
        "method",
        F.size("blocks").cast("long").alias("n_blocks"),
        F.expr("blocks[0].span.start").cast("long").alias("s1"),
        F.expr("blocks[0].span.end").cast("long").alias("e1"),
        F.expr("blocks[1].span.start").cast("long").alias("s2"),
        F.expr("blocks[1].span.end").cast("long").alias("e2"),
    )
    return per.join(n, "doc_id").selectExpr(
        "doc_id",
        "method",
        "n_blocks",
        "s1",
        "e1",
        "s2",
        "e2",
        "s1 = 0 AND e1 = n AND s2 = n + 1 AND e2 = 2 * n + 1"
        " AS line_offsets_exact",
    )


ORACLE_TOOL_TURN_LINE_BLOCKS = f"""
SELECT doc_id,
       'plain' AS method,
       CAST(2 AS BIGINT) AS n_blocks,
       CAST(0 AS BIGINT) AS s1,
       CAST(n_chars AS BIGINT) AS e1,
       CAST(n_chars + 1 AS BIGINT) AS s2,
       CAST(2 * n_chars + 1 AS BIGINT) AS e2,
       TRUE AS line_offsets_exact
FROM documents WHERE n_chars >= {_MIN_AREA_SAFE}
"""


EXTRACTSEM_QUERIES = {
    "entity_decode_audit": q_entity_decode_audit,
    "numeric_entity_audit": q_numeric_entity_audit,
    "whitespace_canon_audit": q_whitespace_canon_audit,
    "fallback_empty_audit": q_fallback_empty_audit,
    "tool_turn_line_blocks": q_tool_turn_line_blocks,
}

EXTRACTSEM_ORACLES = {
    "entity_decode_audit": ORACLE_ENTITY_DECODE_AUDIT,
    "numeric_entity_audit": ORACLE_NUMERIC_ENTITY_AUDIT,
    "whitespace_canon_audit": ORACLE_WHITESPACE_CANON_AUDIT,
    "fallback_empty_audit": ORACLE_FALLBACK_EMPTY_AUDIT,
    "tool_turn_line_blocks": ORACLE_TOOL_TURN_LINE_BLOCKS,
}

_q.QUERIES.update(EXTRACTSEM_QUERIES)
_q.ORACLES.update(EXTRACTSEM_ORACLES)
