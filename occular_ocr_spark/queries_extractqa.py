"""Extraction-QA catalog, round 4 (wave 68): five operators that
audit the OUTPUT of the real extraction pipeline — the
quality-control tables a 10^12-turn extraction job publishes next to
its data so consumers can trust per-turn text without re-reading it.
Each Spark entry drives the actual Arrow-UDF pipeline
(``q_extract_transcripts``: the same dual-path extractor, salting,
lineage) and reduces its output; each oracle replays the documented
SQL model of that pipeline (the ``ORACLE_EXTRACT_TRANSCRIPTS``
base/gated CTEs, kept in lockstep by
tests/test_extractqa_wave.py::test_cte_fragment_matches_registered_oracle).

* ``extraction_yield_report`` — per method: turns, canonicalized
  input chars vs extracted chars, half-up micro yield, empty
  extractions — the strip-overhead ledger.
* ``gate_rejection_report`` — per method: kept vs rejected turns
  with the html rejections split into D4-short (< 38 chars) vs
  D5-score causes — the detection-gate telemetry.
* ``conversation_assembly_audit`` — per conversation: turn counts,
  distinct/contiguous turn_idx flags, extracted chars — the
  stable-turn-ordering contract as an auditable table.
* ``method_position_matrix`` — method × turn-position counts with
  within-position micro shares.
* ``turn_length_profile`` — per turn position: mean extracted chars
  (micro) and share of the corpus's extracted mass.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_extractqa_wave.py.

Cross-engine float policy: exact integers (string lengths, counts);
ratios are single half-up micro divisions.

Scale notes: every entry is the extraction job (conv_id-partitioned,
single MapInArrow — see job.py) followed by one partial agg to
#methods / #positions / #convs rows; the raw-side join reconstructs
doc_id arithmetically from (conv_id, turn_idx), an equi-join on the
same key the extraction partitioned by.

Reference parity: axis-A replay — these audit the same
document-to-text contract the reference's pipeline.py emits
per-document; the reporting layer is net-new (SURVEY.md §2 A3/D3-D5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t, q_extract_transcripts

# SQL model of the extraction pipeline over the synthesized payloads —
# MUST stay in lockstep with queries.ORACLE_EXTRACT_TRANSCRIPTS (the
# parity test diffs the two row sets).  `extracted` additionally keeps
# raw/branch for the QA reductions below.
_EXTRACT_CTES = """
base AS (
  SELECT 'conv-' || CAST(doc_id // 10 AS VARCHAR) AS conv_id,
         CAST(doc_id % 10 AS INT) AS turn_idx,
         doc_id % 4 AS branch,
         trim(regexp_replace(text, ' +', ' ', 'g')) AS raw
  FROM documents),
gated AS (
  SELECT conv_id, turn_idx, branch, raw,
         CASE WHEN branch <> 0 THEN TRUE ELSE
           (length(raw) >= 38
            AND list_avg(list_transform(string_split(raw, ' '),
                  t -> CAST(length(regexp_replace(t, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE)
                       / length(t))) >= 0.52)
         END AS keep
  FROM base),
extracted AS (
  SELECT conv_id, turn_idx, branch, raw,
         CASE branch WHEN 0 THEN 'html' WHEN 1 THEN 'pdf_text'
                     WHEN 2 THEN 'markup' ELSE 'plain' END AS method,
         CASE WHEN keep THEN raw ELSE '' END AS extracted
  FROM gated)
"""


def _with_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-pipeline output joined back to the canonicalized input:
    (conv_id, turn_idx, method, extracted, raw)."""
    ex = q_extract_transcripts(spark, sf_dir)
    raw = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "trim(regexp_replace(text, ' +', ' ')) AS raw",
    )
    return (
        ex.selectExpr(
            "conv_id",
            "turn_idx",
            "method",
            "extracted",
            "CAST(substring(conv_id, 6) AS BIGINT) * 10 + turn_idx"
            " AS doc_id",
        )
        .join(raw, "doc_id")
        .drop("doc_id")
    )


# ---------------------------------------------------------------------------
# extraction_yield_report
# ---------------------------------------------------------------------------


def q_extraction_yield_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-method strip-overhead ledger: turns, canonicalized input
    chars, extracted chars, half-up micro yield, empty extractions.

    Scale: the extraction job + one partial agg to #methods rows;
    the raw join is equi on the reconstructed doc_id.
    """
    return (
        _with_raw(spark, sf_dir)
        .groupBy("method")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(F.length("raw")).cast("long").alias("raw_chars"),
            F.sum(F.length("extracted")).cast("long").alias(
                "extracted_chars"
            ),
            F.sum(F.expr("CASE WHEN extracted = '' THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_empty"),
        )
        .selectExpr(
            "method",
            "n_turns",
            "raw_chars",
            "extracted_chars",
            "n_empty",
            "CAST((2000000 * extracted_chars + raw_chars)"
            " DIV (2 * raw_chars) AS BIGINT) AS yield_micro",
        )
    )


ORACLE_EXTRACTION_YIELD_REPORT = f"""
WITH {_EXTRACT_CTES}
SELECT method,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(raw)) AS BIGINT) AS raw_chars,
       CAST(sum(length(extracted)) AS BIGINT) AS extracted_chars,
       CAST(sum(CASE WHEN extracted = '' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_empty,
       CAST((2000000 * sum(length(extracted)) + sum(length(raw)))
            // (2 * sum(length(raw))) AS BIGINT) AS yield_micro
FROM extracted GROUP BY method
"""


# ---------------------------------------------------------------------------
# gate_rejection_report
# ---------------------------------------------------------------------------


def q_gate_rejection_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection-gate telemetry per method: kept vs rejected turns,
    rejections split into D4-short (canonicalized length < 38) vs
    D5-score causes (html only; other methods never reject).

    Scale: same single extraction pass + #methods-row partial agg.
    """
    return (
        _with_raw(spark, sf_dir)
        .selectExpr(
            "method",
            "CASE WHEN extracted <> '' THEN 1 ELSE 0 END AS kept",
            "CASE WHEN extracted = '' AND length(raw) < 38"
            " THEN 1 ELSE 0 END AS rej_short",
            "CASE WHEN extracted = '' AND length(raw) >= 38"
            " THEN 1 ELSE 0 END AS rej_score",
        )
        .groupBy("method")
        .agg(
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum("rej_short").cast("long").alias("n_rejected_short"),
            F.sum("rej_score").cast("long").alias("n_rejected_score"),
        )
        .selectExpr(
            "method",
            "n_kept",
            "n_rejected_short",
            "n_rejected_score",
            "n_rejected_short + n_rejected_score AS n_rejected",
            "CAST((2000000 * (n_rejected_short + n_rejected_score)"
            " + (n_kept + n_rejected_short + n_rejected_score))"
            " DIV (2 * (n_kept + n_rejected_short + n_rejected_score))"
            " AS BIGINT) AS reject_micro",
        )
    )


ORACLE_GATE_REJECTION_REPORT = f"""
WITH {_EXTRACT_CTES},
flags AS (
  SELECT method,
         CASE WHEN extracted <> '' THEN 1 ELSE 0 END AS kept,
         CASE WHEN extracted = '' AND length(raw) < 38
              THEN 1 ELSE 0 END AS rej_short,
         CASE WHEN extracted = '' AND length(raw) >= 38
              THEN 1 ELSE 0 END AS rej_score
  FROM extracted)
SELECT method,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(rej_short) AS BIGINT) AS n_rejected_short,
       CAST(sum(rej_score) AS BIGINT) AS n_rejected_score,
       CAST(sum(rej_short) + sum(rej_score) AS BIGINT) AS n_rejected,
       CAST((2000000 * (sum(rej_short) + sum(rej_score)) + count(*))
            // (2 * count(*)) AS BIGINT) AS reject_micro
FROM flags GROUP BY method
"""


# ---------------------------------------------------------------------------
# conversation_assembly_audit
# ---------------------------------------------------------------------------


def q_conversation_assembly_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-conversation ordering contract: turn counts, distinct and
    contiguous turn_idx flags, extracted chars — the stable-turn-
    ordering invariant of the north rule as a table.

    Scale: one partial agg keyed by conv_id (the job's own partition
    key — no extra shuffle after extraction).
    """
    return (
        q_extract_transcripts(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.countDistinct("turn_idx").cast("long").alias("n_distinct"),
            F.min("turn_idx").cast("long").alias("first_idx"),
            F.max("turn_idx").cast("long").alias("last_idx"),
            F.sum(F.length("extracted")).cast("long").alias(
                "extracted_chars"
            ),
        )
        .selectExpr(
            "conv_id",
            "n_turns",
            "n_distinct",
            "first_idx",
            "last_idx",
            "(n_turns = n_distinct AND"
            " last_idx - first_idx + 1 = n_turns) AS contiguous",
            "extracted_chars",
        )
    )


ORACLE_CONVERSATION_ASSEMBLY_AUDIT = f"""
WITH {_EXTRACT_CTES}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT turn_idx) AS BIGINT) AS n_distinct,
       CAST(min(turn_idx) AS BIGINT) AS first_idx,
       CAST(max(turn_idx) AS BIGINT) AS last_idx,
       (count(*) = count(DISTINCT turn_idx) AND
        max(turn_idx) - min(turn_idx) + 1 = count(*)) AS contiguous,
       CAST(sum(length(extracted)) AS BIGINT) AS extracted_chars
FROM extracted GROUP BY conv_id
"""


# ---------------------------------------------------------------------------
# method_position_matrix
# ---------------------------------------------------------------------------


def q_method_position_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """method × turn-position histogram with within-position micro
    shares — where in a conversation each payload kind lands.

    Scale: one partial agg to ≤ #methods × #positions rows, then a
    broadcast join of position totals.
    """
    ex = _q._persist_tracked(
        q_extract_transcripts(spark, sf_dir).select("turn_idx", "method")
    )
    cell = ex.groupBy("turn_idx", "method").agg(
        F.count("*").cast("long").alias("n_turns")
    )
    tot = ex.groupBy("turn_idx").agg(
        F.count("*").cast("long").alias("pos_total")
    )
    return cell.join(F.broadcast(tot), "turn_idx").selectExpr(
        "turn_idx",
        "method",
        "n_turns",
        "pos_total",
        "CAST((2000000 * n_turns + pos_total) DIV (2 * pos_total)"
        " AS BIGINT) AS share_micro",
    )


ORACLE_METHOD_POSITION_MATRIX = f"""
WITH {_EXTRACT_CTES},
cell AS (
  SELECT turn_idx, method, CAST(count(*) AS BIGINT) AS n_turns
  FROM extracted GROUP BY turn_idx, method),
tot AS (
  SELECT turn_idx, CAST(count(*) AS BIGINT) AS pos_total
  FROM extracted GROUP BY turn_idx)
SELECT c.turn_idx, c.method, c.n_turns, t.pos_total,
       CAST((2000000 * c.n_turns + t.pos_total) // (2 * t.pos_total)
            AS BIGINT) AS share_micro
FROM cell c JOIN tot t ON t.turn_idx = c.turn_idx
"""


# ---------------------------------------------------------------------------
# turn_length_profile
# ---------------------------------------------------------------------------


def q_turn_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional length economics: per turn position, mean extracted
    chars (half-up micro) and the position's share of the corpus's
    extracted mass — the profile SFT context packing reads.

    Scale: one partial agg to #positions rows + a 1-row total.
    """
    ex = _q._persist_tracked(
        q_extract_transcripts(spark, sf_dir).selectExpr(
            "turn_idx", "length(extracted) AS ec"
        )
    )
    per = ex.groupBy("turn_idx").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("ec").cast("long").alias("chars"),
    )
    tot = ex.agg(F.sum("ec").cast("long").alias("total_chars"))
    return per.crossJoin(F.broadcast(tot)).selectExpr(
        "turn_idx",
        "n_turns",
        "chars",
        "CAST((2000000 * chars + n_turns) DIV (2 * n_turns) AS BIGINT)"
        " AS mean_chars_micro",
        "CAST((2000000 * chars + total_chars) DIV (2 * total_chars)"
        " AS BIGINT) AS mass_share_micro",
    )


ORACLE_TURN_LENGTH_PROFILE = f"""
WITH {_EXTRACT_CTES},
per AS (
  SELECT turn_idx, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(length(extracted)) AS BIGINT) AS chars
  FROM extracted GROUP BY turn_idx),
tot AS (
  SELECT CAST(sum(length(extracted)) AS BIGINT) AS total_chars
  FROM extracted)
SELECT p.turn_idx, p.n_turns, p.chars,
       CAST((2000000 * p.chars + p.n_turns) // (2 * p.n_turns) AS BIGINT)
         AS mean_chars_micro,
       CAST((2000000 * p.chars + t.total_chars) // (2 * t.total_chars)
            AS BIGINT) AS mass_share_micro
FROM per p CROSS JOIN tot t
"""


EXTRACTQA_QUERIES = {
    "extraction_yield_report": q_extraction_yield_report,
    "gate_rejection_report": q_gate_rejection_report,
    "conversation_assembly_audit": q_conversation_assembly_audit,
    "method_position_matrix": q_method_position_matrix,
    "turn_length_profile": q_turn_length_profile,
}

EXTRACTQA_ORACLES = {
    "extraction_yield_report": ORACLE_EXTRACTION_YIELD_REPORT,
    "gate_rejection_report": ORACLE_GATE_REJECTION_REPORT,
    "conversation_assembly_audit": ORACLE_CONVERSATION_ASSEMBLY_AUDIT,
    "method_position_matrix": ORACLE_METHOD_POSITION_MATRIX,
    "turn_length_profile": ORACLE_TURN_LENGTH_PROFILE,
}

_q.QUERIES.update(EXTRACTQA_QUERIES)
_q.ORACLES.update(EXTRACTQA_ORACLES)
