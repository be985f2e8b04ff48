"""Span-analytics catalog, round 4 (wave 90): five operators that
drive the REAL Arrow extraction pipeline (``job.extract_detailed`` —
the north rule's span-tree offsets) over deterministic synthetic
payloads and oracle the resulting span geometry EXACTLY in SQL — the
``extract_transcripts`` pattern extended from text equality to
offset/coverage/ordering equality.

Payload branches (doc_id mod 4, the flagship's wrappers): html
(prefix 15, y 0), pdf_text (prefix 0, y 100 — the bbox row), markup
(prefix 4, y 1), plain (prefix 0, y 0); each yields ONE block with
span = [prefix, prefix + n_chars) and confidence 1.0.  The
multi-block entries wrap the SAME text twice in ``<div><p>…</p>
<p>…</p></div>`` (prefix 8, separator 7), which the DOM tokenizer
must emit as two blocks at exactly (8, 8+n) and (8+n+7, 8+2n+7),
assembled with one newline.

* ``span_offset_audit`` — per document: method, the block span
  (start/end/y), block count, and the end−start == n_chars identity
  flag — the offset contract, row by row.
* ``multiblock_span_ledger`` — the two-paragraph payload: both
  blocks' offsets, the inter-block gap (= 7, the separator), and the
  assembled-length identity len(text_out) == 2·n_chars + 1.
* ``span_coverage_by_method`` — per method: turns, span mass,
  payload length (n_chars + wrapper constant), coverage micro — how
  much of the source the extractor claims.
* ``reading_order_span_audit`` — 1-row certification over the
  two-block corpus: starts strictly increase, blocks never overlap,
  every assembly matches — bool_and over the ledger.
* ``confidence_gate_audit`` — per method: block count and min/mean
  confidence micro (exactly 10⁶ for these payloads) — the R5
  min-confidence floor is observed, not clipping.

House contract: DuckDB value-hash oracle with identical aliases
(the oracle reproduces the span arithmetic from the documents
columns — the Spark side really runs the Arrow UDF), self-
registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_spans_wave.py.

Cross-engine float policy: offsets and lengths are exact BIGINTs;
confidence is exactly 1.0 for these payloads (micro-quantized);
coverage is half-up micro.

Scale notes: one extraction pass (single MapInArrow stage, the
flagship plan) + explode(blocks) → partial aggs; every window-free;
the per-branch constants fold into the scan.

Reference parity: the span struct replays ocr_skel's region boxes
(dbnet_detector.py box emission) as source offsets; reading order is
A2's Y-sort contract (SURVEY.md §2 A2/D8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_MIN_AREA_SAFE = 38


def _single_block_extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's 4-branch payloads through the real extractor,
    blocks exploded."""
    from .job import extract_detailed

    d = _t(spark, sf_dir, "documents")
    payload = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("<html><body><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit(
                    '{"blocks": [{"type": 0, "lines": [{"bbox": '
                    '[72, 100, 540, 112], "spans": [{"text": "'
                ),
                F.col("text"),
                F.lit('"}]}]}]}'),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("```\n"), F.col("text"), F.lit("\n```")),
        )
        .otherwise(F.col("text"))
    )
    tr = d.select(
        F.lit("conv").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        payload.alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    det = extract_detailed(tr)
    return det.select(
        F.col("turn_idx").cast("long").alias("doc_id"),
        "method",
        F.explode("blocks").alias("b"),
    ).select(
        "doc_id",
        "method",
        F.col("b.span.start").cast("long").alias("span_start"),
        F.col("b.span.end").cast("long").alias("span_end"),
        F.col("b.span.y").cast("long").alias("span_y"),
        F.col("b.confidence").alias("confidence"),
    )


# branch constants: (method, prefix, y)
_BRANCH_SQL = """
branch AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n,
         CASE doc_id % 4 WHEN 0 THEN 'html' WHEN 1 THEN 'pdf_text'
              WHEN 2 THEN 'markup' ELSE 'plain' END AS method,
         CAST(CASE doc_id % 4 WHEN 0 THEN 15 WHEN 1 THEN 0
              WHEN 2 THEN 4 ELSE 0 END AS BIGINT) AS pfx,
         CAST(CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 100
              WHEN 2 THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM documents)
"""


# ---------------------------------------------------------------------------
# span_offset_audit
# ---------------------------------------------------------------------------


def q_span_offset_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: the real extractor's span vs the n_chars
    identity."""
    ex = _single_block_extracted(spark, sf_dir)
    n = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "CAST(n_chars AS BIGINT) AS n"
    )
    return ex.join(n, "doc_id").selectExpr(
        "doc_id",
        "method",
        "span_start",
        "span_end",
        "span_y",
        "span_end - span_start = n AS len_matches",
    )


ORACLE_SPAN_OFFSET_AUDIT = f"""
WITH {_BRANCH_SQL}
SELECT doc_id, method,
       pfx AS span_start,
       pfx + n AS span_end,
       y AS span_y,
       TRUE AS len_matches
FROM branch
"""


# ---------------------------------------------------------------------------
# multiblock_span_ledger
# ---------------------------------------------------------------------------


def _two_block_extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .job import extract_detailed

    d = _t(spark, sf_dir, "documents").where(
        f"n_chars >= {_MIN_AREA_SAFE}"
    )
    tr = d.select(
        F.lit("conv").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit("<div><p>"),
            F.col("text"),
            F.lit("</p><p>"),
            F.col("text"),
            F.lit("</p></div>"),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    return extract_detailed(tr)


def q_multiblock_span_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-paragraph payload: both block spans, the separator gap,
    the assembled-length identity."""
    det = _two_block_extracted(spark, sf_dir)
    per = det.select(
        F.col("turn_idx").cast("long").alias("doc_id"),
        F.size("blocks").cast("long").alias("n_blocks"),
        F.expr("blocks[0].span.start").cast("long").alias("s1"),
        F.expr("blocks[0].span.end").cast("long").alias("e1"),
        F.expr("blocks[1].span.start").cast("long").alias("s2"),
        F.expr("blocks[1].span.end").cast("long").alias("e2"),
        F.length("text").cast("long").alias("out_len"),
    )
    n = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "CAST(n_chars AS BIGINT) AS n"
    )
    return per.join(n, "doc_id").selectExpr(
        "doc_id",
        "n_blocks",
        "s1",
        "e1",
        "s2",
        "e2",
        "s2 - e1 AS gap",
        "out_len",
        "out_len = 2 * n + 1 AS assembled_matches",
    )


ORACLE_MULTIBLOCK_SPAN_LEDGER = f"""
SELECT doc_id,
       CAST(2 AS BIGINT) AS n_blocks,
       CAST(8 AS BIGINT) AS s1,
       CAST(8 + n_chars AS BIGINT) AS e1,
       CAST(8 + n_chars + 7 AS BIGINT) AS s2,
       CAST(8 + 2 * n_chars + 7 AS BIGINT) AS e2,
       CAST(7 AS BIGINT) AS gap,
       CAST(2 * n_chars + 1 AS BIGINT) AS out_len,
       TRUE AS assembled_matches
FROM documents WHERE n_chars >= {_MIN_AREA_SAFE}
"""


# ---------------------------------------------------------------------------
# span_coverage_by_method
# ---------------------------------------------------------------------------


def q_span_coverage_by_method(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per method: span mass over payload length, half-up micro."""
    ex = _single_block_extracted(spark, sf_dir)
    n = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CAST(n_chars AS BIGINT) AS n",
        "CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 92"
        " WHEN 2 THEN 8 ELSE 0 END AS BIGINT) AS wrapper_len",
    )
    return (
        ex.join(n, "doc_id")
        .groupBy("method")
        .agg(
            F.count("*").cast("long").alias("turns"),
            F.sum(F.expr("span_end - span_start"))
            .cast("long")
            .alias("span_mass"),
            F.sum(F.expr("n + wrapper_len")).cast("long").alias(
                "payload_len"
            ),
        )
        .selectExpr(
            "method",
            "turns",
            "span_mass",
            "payload_len",
            "CAST((2000000 * span_mass + payload_len)"
            " DIV (2 * payload_len) AS BIGINT) AS coverage_micro",
        )
    )


ORACLE_SPAN_COVERAGE_BY_METHOD = f"""
WITH {_BRANCH_SQL},
w AS (
  SELECT method, n,
         CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 92
              WHEN 2 THEN 8 ELSE 0 END AS BIGINT) AS wrapper_len
  FROM branch)
SELECT method,
       CAST(count(*) AS BIGINT) AS turns,
       CAST(sum(n) AS BIGINT) AS span_mass,
       CAST(sum(n + wrapper_len) AS BIGINT) AS payload_len,
       CAST((2000000 * sum(n) + sum(n + wrapper_len))
            // (2 * sum(n + wrapper_len)) AS BIGINT)
         AS coverage_micro
FROM w GROUP BY method
"""


# ---------------------------------------------------------------------------
# reading_order_span_audit
# ---------------------------------------------------------------------------


def q_reading_order_span_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-row certification over the two-block corpus: ordering,
    non-overlap, assembly — all must hold everywhere."""
    led = q_multiblock_span_ledger(spark, sf_dir)
    return led.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("CAST(bool_and(n_blocks = 2) AS BOOLEAN)").alias(
            "all_two_blocks"
        ),
        F.expr("CAST(bool_and(s2 > s1) AS BOOLEAN)").alias(
            "all_ordered"
        ),
        F.expr("CAST(bool_and(s2 >= e1) AS BOOLEAN)").alias(
            "all_nonoverlapping"
        ),
        F.expr("CAST(bool_and(assembled_matches) AS BOOLEAN)").alias(
            "all_assembled"
        ),
    )


ORACLE_READING_ORDER_SPAN_AUDIT = f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       TRUE AS all_two_blocks,
       TRUE AS all_ordered,
       TRUE AS all_nonoverlapping,
       TRUE AS all_assembled
FROM documents WHERE n_chars >= {_MIN_AREA_SAFE}
"""


# ---------------------------------------------------------------------------
# confidence_gate_audit
# ---------------------------------------------------------------------------


def q_confidence_gate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per method: block count + min/mean confidence micro (exactly
    10⁶ for these payloads) — R5's floor observed, not clipping."""
    ex = _single_block_extracted(spark, sf_dir)
    return ex.groupBy("method").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.expr("CAST(floor(min(confidence) * 1e6 + 0.5) AS BIGINT)").alias(
            "min_conf_micro"
        ),
        F.expr(
            "CAST(floor(avg(confidence) * 1e6 + 0.5) AS BIGINT)"
        ).alias("mean_conf_micro"),
    )


ORACLE_CONFIDENCE_GATE_AUDIT = """
SELECT CASE doc_id % 4 WHEN 0 THEN 'html' WHEN 1 THEN 'pdf_text'
            WHEN 2 THEN 'markup' ELSE 'plain' END AS method,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(1000000 AS BIGINT) AS min_conf_micro,
       CAST(1000000 AS BIGINT) AS mean_conf_micro
FROM documents
GROUP BY CASE doc_id % 4 WHEN 0 THEN 'html' WHEN 1 THEN 'pdf_text'
              WHEN 2 THEN 'markup' ELSE 'plain' END
"""


SPANS_QUERIES = {
    "span_offset_audit": q_span_offset_audit,
    "multiblock_span_ledger": q_multiblock_span_ledger,
    "span_coverage_by_method": q_span_coverage_by_method,
    "reading_order_span_audit": q_reading_order_span_audit,
    "confidence_gate_audit": q_confidence_gate_audit,
}

SPANS_ORACLES = {
    "span_offset_audit": ORACLE_SPAN_OFFSET_AUDIT,
    "multiblock_span_ledger": ORACLE_MULTIBLOCK_SPAN_LEDGER,
    "span_coverage_by_method": ORACLE_SPAN_COVERAGE_BY_METHOD,
    "reading_order_span_audit": ORACLE_READING_ORDER_SPAN_AUDIT,
    "confidence_gate_audit": ORACLE_CONFIDENCE_GATE_AUDIT,
}

_q.QUERIES.update(SPANS_QUERIES)
_q.ORACLES.update(SPANS_ORACLES)
