"""Conversation-certification catalog, round 4 (wave 100): five
operators that certify the north rule's END-TO-END story — mixed-
payload multi-turn conversations through the real extract → assemble
→ order-restore pipeline, with the ASSEMBLED CONVERSATION TEXT
value-hash-checked against the SQL-predicted concatenation (per-turn
text equality under stable turn ordering, composed to whole
conversations).  Conversations are synthesized from the documents
table: conv = source, turn_idx = doc_id, payloads = the flagship's
four wrappers (whose extracted text equals the original text — the
``extract_transcripts`` contract).

* ``conversation_roundtrip_audit`` — per conversation: turn count
  and the FULL assembled text, which must equal
  string_agg(text, '\\n' ORDER BY doc_id) — A3 assembly + D8/A2
  ordering, hash-checked string-for-string.
* ``turn_shuffle_invariance`` — the same pipeline fed a HASH-SHUFFLED
  input order: the assembled text must still match the ordered
  concatenation — A4 order restore certified (a failure would
  hash-mismatch, not just flip a flag).
* ``split_resume_union_audit`` — extract hash-half A and half B in
  two separate passes and union: full-outer-joined against the
  one-shot run, row counts equal, text equal everywhere — the
  checkpoint/resume identity the north rule requires, as a 1-row
  certificate.
* ``mega_conversation_audit`` — one synthetic mega-conversation
  absorbs the hash-picked {_MEGA_PCT}% of documents (the zipf-skew
  story): per conversation the turn count and the assembled-length
  identity Σn + (turns−1) — the skew path produces bit-correct
  assemblies too.
* ``method_mix_matrix`` — per conversation: the html/pdf_text/
  markup/plain method counts, which must equal the doc_id mod-4
  arithmetic of its members — S4 dispatch audited at conversation
  grain.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_convcert_wave.py.

Cross-engine float policy: strings and exact BIGINT counts only.

Scale notes: extraction is the flagship single-MapInArrow stage;
assembly is the one-shuffle groupBy + array_sort (job.
conversation_text — no window); the certificates add one
key-partitioned join each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_MEGA_PCT = 10


def _payload(col_doc="doc_id", col_text="text"):
    return (
        F.when(
            F.col(col_doc) % 4 == 0,
            F.concat(
                F.lit("<html><body><p>"),
                F.col(col_text),
                F.lit("</p></body></html>"),
            ),
        )
        .when(
            F.col(col_doc) % 4 == 1,
            F.concat(
                F.lit(
                    '{"blocks": [{"type": 0, "lines": [{"bbox": '
                    '[72, 100, 540, 112], "spans": [{"text": "'
                ),
                F.col(col_text),
                F.lit('"}]}]}]}'),
            ),
        )
        .when(
            F.col(col_doc) % 4 == 2,
            F.concat(F.lit("```\n"), F.col(col_text), F.lit("\n```")),
        )
        .otherwise(F.col(col_text))
    )


def _conv_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        _payload().alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )


def _assembled(spark: SparkSession, sf_dir: str, frame) -> DataFrame:
    from .job import conversation_text, extract_text

    return conversation_text(extract_text(frame))


_ROUNDTRIP_ORACLE = """
SELECT source AS conv_id,
       string_agg(text, chr(10) ORDER BY doc_id) AS text,
       CAST(count(*) AS BIGINT) AS n_turns
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# conversation_roundtrip_audit
# ---------------------------------------------------------------------------


def q_conversation_roundtrip_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Assembled conversation text vs the ordered concatenation."""
    out = _assembled(spark, sf_dir, _conv_frame(spark, sf_dir))
    return out.select(
        "conv_id", "text", F.col("n_turns").cast("long").alias("n_turns")
    )


ORACLE_CONVERSATION_ROUNDTRIP_AUDIT = _ROUNDTRIP_ORACLE


# ---------------------------------------------------------------------------
# turn_shuffle_invariance
# ---------------------------------------------------------------------------


def q_turn_shuffle_invariance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-shuffled input order; assembly must restore turn order."""
    frame = _conv_frame(spark, sf_dir).orderBy(
        F.md5(F.concat(F.col("turn_idx").cast("string"), F.lit(":shuf")))
    )
    out = _assembled(spark, sf_dir, frame)
    return out.select(
        "conv_id", "text", F.col("n_turns").cast("long").alias("n_turns")
    )


ORACLE_TURN_SHUFFLE_INVARIANCE = _ROUNDTRIP_ORACLE


# ---------------------------------------------------------------------------
# split_resume_union_audit
# ---------------------------------------------------------------------------


def q_split_resume_union_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two half-corpus passes unioned ≡ the one-shot run."""
    from .job import extract_text

    base = _conv_frame(spark, sf_dir)
    half = F.expr(
        "(((instr('0123456789abcdef', substr(md5(CAST(turn_idx AS"
        " STRING) || ':rs'), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(turn_idx AS"
        " STRING) || ':rs'), 2, 1)) - 1)) % 2)"
    )
    a = extract_text(base.where(half == 0))
    b = extract_text(base.where(half == 1))
    u = a.unionAll(b).selectExpr(
        "conv_id", "turn_idx", "coalesce(text, '') AS tu"
    )
    full = extract_text(base).selectExpr(
        "conv_id", "turn_idx", "coalesce(text, '') AS tf"
    )
    j = u.join(full, ["conv_id", "turn_idx"], "full")
    return j.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.expr(
                "CASE WHEN tu IS NULL OR tf IS NULL THEN 1L ELSE 0L END"
            )
        )
        .cast("long")
        .alias("n_unmatched"),
        F.expr("CAST(bool_and(tu = tf) AS BOOLEAN)").alias(
            "all_text_equal"
        ),
    )


ORACLE_SPLIT_RESUME_UNION_AUDIT = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_unmatched,
       TRUE AS all_text_equal
FROM documents
"""


# ---------------------------------------------------------------------------
# mega_conversation_audit
# ---------------------------------------------------------------------------


def _mega_expr(dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"CASE WHEN (((instr('0123456789abcdef', substr(md5("
        f"CAST(doc_id AS {strtype}) || ':mega'), 1, 1)) - 1) * 16"
        f" + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS"
        f" {strtype}) || ':mega'), 2, 1)) - 1)) % 100) < {_MEGA_PCT}"
        f" THEN 'MEGA' ELSE source END"
    )


def q_mega_conversation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The hash-picked mega conversation assembles bit-correctly."""
    d = _t(spark, sf_dir, "documents")
    frame = d.select(
        F.expr(_mega_expr("spark")).alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        _payload().alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    out = _assembled(spark, sf_dir, frame)
    return out.selectExpr(
        "conv_id",
        "CAST(n_turns AS BIGINT) AS n_turns",
        "CAST(length(text) AS BIGINT) AS text_len",
    )


ORACLE_MEGA_CONVERSATION_AUDIT = f"""
SELECT {_mega_expr('duck')} AS conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(n_chars) + count(*) - 1 AS BIGINT) AS text_len
FROM documents GROUP BY {_mega_expr('duck')}
"""


# ---------------------------------------------------------------------------
# method_mix_matrix
# ---------------------------------------------------------------------------


def q_method_mix_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per conversation: method counts from the real dispatch."""
    from .job import extract_detailed

    det = extract_detailed(_conv_frame(spark, sf_dir))
    return (
        det.groupBy("conv_id", "method")
        .agg(F.count("*").cast("long").alias("n_turns"))
    )


ORACLE_METHOD_MIX_MATRIX = """
SELECT source AS conv_id,
       CASE doc_id % 4 WHEN 0 THEN 'html' WHEN 1 THEN 'pdf_text'
            WHEN 2 THEN 'markup' ELSE 'plain' END AS method,
       CAST(count(*) AS BIGINT) AS n_turns
FROM documents
GROUP BY source, CASE doc_id % 4 WHEN 0 THEN 'html'
         WHEN 1 THEN 'pdf_text' WHEN 2 THEN 'markup'
         ELSE 'plain' END
"""


CONVCERT_QUERIES = {
    "conversation_roundtrip_audit": q_conversation_roundtrip_audit,
    "turn_shuffle_invariance": q_turn_shuffle_invariance,
    "split_resume_union_audit": q_split_resume_union_audit,
    "mega_conversation_audit": q_mega_conversation_audit,
    "method_mix_matrix": q_method_mix_matrix,
}

CONVCERT_ORACLES = {
    "conversation_roundtrip_audit": ORACLE_CONVERSATION_ROUNDTRIP_AUDIT,
    "turn_shuffle_invariance": ORACLE_TURN_SHUFFLE_INVARIANCE,
    "split_resume_union_audit": ORACLE_SPLIT_RESUME_UNION_AUDIT,
    "mega_conversation_audit": ORACLE_MEGA_CONVERSATION_AUDIT,
    "method_mix_matrix": ORACLE_METHOD_MIX_MATRIX,
}

_q.QUERIES.update(CONVCERT_QUERIES)
_q.ORACLES.update(CONVCERT_ORACLES)
