"""Annotation-quality catalog, round 4 (wave 72): five operators that
replay the label-quality toolkit a training-data platform runs over
crowd/model annotations — agreement, majority vote, rater
calibration — with K={_K} synthetic labelers derived deterministically
from the embeddings ground truth: labeler k flips item ``vec_id``'s
true label with probability p_k ∈ {_FLIP_MICRO} micro (salted-md5
Bernoulli) to a uniformly-chosen WRONG class among the {_L} labels —
so every statistic has a known expectation to sanity-check.

* ``labeler_accuracy_report`` — per labeler: items, correct votes,
  half-up micro accuracy, and the designed flip rate side by side.
* ``majority_vote_eval`` — the (count desc, label asc) majority per
  item (3-way ties resolve to the lowest label, documented):
  accuracy, unanimous share, tie share.
* ``fleiss_kappa`` — multi-rater chance-corrected agreement: P_o and
  P_e in exact micro from the per-item category counts, κ with a
  sign-split half-up (integer division of negatives differs between
  the engines, so the division only ever sees non-negative
  operands).
* ``vote_rule_sweep`` — coverage/accuracy frontier of three
  promotion rules: unanimous, majority, single-labeler.
* ``item_difficulty_profile`` — items bucketed by #distinct votes
  (1..{_K}): share and majority-accuracy per bucket — the
  disagreement-as-difficulty signal.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_annotation_wave.py.

Cross-engine float policy: exact integers end-to-end; ratios are
single half-up micro divisions; κ's signed step is CASE-split so no
negative ever reaches an integer division.

Scale notes: the vote frame is K×items rows built map-side (a
{_K}-row broadcast crossJoin); every statistic is one partial agg
over it, with the majority pick a per-item (≤K-row) window.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_K = 3
_L = 10
_FLIP_MICRO = [100_000, 200_000, 300_000]


def _h_spark(salt: str) -> str:
    return (
        f"CAST(conv(substr(md5(concat('{salt}:', CAST(k AS STRING), ':',"
        " CAST(vec_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )


def _h_sql(salt: str) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('{salt}:' || CAST(k AS VARCHAR)"
        " || ':' || CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS BIGINT)"
    )


def _votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, k, p_micro, vote) — the K×items vote frame."""
    labelers = spark.createDataFrame(
        [(k + 1, p) for k, p in enumerate(_FLIP_MICRO)],
        "k int, p_micro long",
    )
    return (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .crossJoin(F.broadcast(labelers))
        .selectExpr(
            "vec_id",
            "label",
            "k",
            "p_micro",
            f"CASE WHEN {_h_spark('v')} % 1000000 >= p_micro THEN label"
            f" ELSE CAST((label + 1 + {_h_spark('w')} % {_L - 1})"
            f" % {_L} AS INT) END AS vote",
        )
    )


_VOTES_SQL = f"""
votes AS (
  SELECT e.vec_id, e.label, l.k, l.p_micro,
         CASE WHEN {_h_sql('v')} % 1000000 >= l.p_micro THEN e.label
              ELSE CAST((e.label + 1 + {_h_sql('w')} % {_L - 1})
                        % {_L} AS INT) END AS vote
  FROM embeddings e CROSS JOIN (
    SELECT * FROM (VALUES {", ".join(f"({k + 1}, {p})" for k, p in enumerate(_FLIP_MICRO))})
      AS t(k, p_micro)) l)
"""


# ---------------------------------------------------------------------------
# labeler_accuracy_report
# ---------------------------------------------------------------------------


def q_labeler_accuracy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-labeler calibration: observed accuracy vs designed flip
    rate."""
    return (
        _votes(spark, sf_dir)
        .groupBy("k", "p_micro")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.expr("CASE WHEN vote = label THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_correct"),
        )
        .selectExpr(
            "k AS labeler",
            "CAST(p_micro AS BIGINT) AS designed_flip_micro",
            "n_items",
            "n_correct",
            "CAST((2000000 * n_correct + n_items) DIV (2 * n_items)"
            " AS BIGINT) AS accuracy_micro",
        )
    )


ORACLE_LABELER_ACCURACY_REPORT = f"""
WITH {_VOTES_SQL}
SELECT k AS labeler,
       CAST(p_micro AS BIGINT) AS designed_flip_micro,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN vote = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST((2000000 * sum(CASE WHEN vote = label THEN 1 ELSE 0 END)
             + count(*)) // (2 * count(*)) AS BIGINT) AS accuracy_micro
FROM votes GROUP BY k, p_micro
"""


# ---------------------------------------------------------------------------
# majority_vote_eval
# ---------------------------------------------------------------------------

_MAJ_SQL = f"""
counts AS (
  SELECT vec_id, label, vote, CAST(count(*) AS BIGINT) AS c
  FROM votes GROUP BY vec_id, label, vote),
maj AS (
  SELECT vec_id, label, vote AS majority, c FROM (
    SELECT vec_id, label, vote, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY c DESC, vote) AS rn
    FROM counts) WHERE rn = 1)
"""


def _majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _votes(spark, sf_dir)
        .groupBy("vec_id", "label", "vote")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        counts.selectExpr(
            "vec_id",
            "label",
            "vote",
            "c",
            "row_number() OVER (PARTITION BY vec_id"
            " ORDER BY c DESC, vote) AS rn",
        )
        .where("rn = 1")
        .selectExpr("vec_id", "label", "vote AS majority", "c")
    )


def q_majority_vote_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote quality: accuracy, unanimous share, 3-way-tie
    share (ties resolve to the lowest label — documented)."""
    return _majority(spark, sf_dir).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.expr("CASE WHEN majority = label THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_correct"),
        F.sum(F.expr(f"CASE WHEN c = {_K} THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_unanimous"),
        F.sum(F.expr("CASE WHEN c = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_ties"),
    ).selectExpr(
        "n_items",
        "n_correct",
        "n_unanimous",
        "n_ties",
        "CAST((2000000 * n_correct + n_items) DIV (2 * n_items)"
        " AS BIGINT) AS accuracy_micro",
    )


ORACLE_MAJORITY_VOTE_EVAL = f"""
WITH {_VOTES_SQL},
{_MAJ_SQL}
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN majority = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(sum(CASE WHEN c = {_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unanimous,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ties,
       CAST((2000000 * sum(CASE WHEN majority = label THEN 1 ELSE 0 END)
             + count(*)) // (2 * count(*)) AS BIGINT) AS accuracy_micro
FROM maj
"""


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' κ in exact micro: P_o from Σ n_ij(n_ij-1), P_e from
    squared category shares; the signed κ step CASE-splits so integer
    division never sees a negative operand."""
    votes = _q._persist_tracked(_votes(spark, sf_dir))
    cell = votes.groupBy("vec_id", "vote").agg(
        F.count("*").cast("long").alias("nij")
    )
    po = cell.agg(
        F.countDistinct("vec_id").cast("long").alias("n_items"),
        F.sum(F.expr("nij * (nij - 1)")).cast("long").alias("agree"),
    ).selectExpr(
        "n_items",
        f"CAST((2000000 * agree + n_items * {_K * (_K - 1)})"
        f" DIV (2 * n_items * {_K * (_K - 1)}) AS BIGINT) AS po_micro",
    )
    pe = (
        votes.groupBy("vote")
        .agg(F.count("*").cast("long").alias("cj"))
        .crossJoin(F.broadcast(po.selectExpr("n_items")))
        .selectExpr(
            f"CAST((2000000 * cj + n_items * {_K})"
            f" DIV (2 * n_items * {_K}) AS BIGINT) AS pj_micro"
        )
        .agg(
            F.expr(
                "CAST((2 * sum(pj_micro * pj_micro) + 1000000)"
                " DIV 2000000 AS BIGINT)"
            ).alias("pe_micro")
        )
    )
    return po.crossJoin(F.broadcast(pe)).selectExpr(
        "n_items",
        "po_micro",
        "pe_micro",
        "CASE WHEN po_micro >= pe_micro THEN"
        " CAST((2000000 * (po_micro - pe_micro) + (1000000 - pe_micro))"
        " DIV (2 * (1000000 - pe_micro)) AS BIGINT)"
        " ELSE -CAST((2000000 * (pe_micro - po_micro)"
        " + (1000000 - pe_micro))"
        " DIV (2 * (1000000 - pe_micro)) AS BIGINT) END AS kappa_micro",
    )


ORACLE_FLEISS_KAPPA = f"""
WITH {_VOTES_SQL},
cell AS (
  SELECT vec_id, vote, CAST(count(*) AS BIGINT) AS nij
  FROM votes GROUP BY vec_id, vote),
po AS (
  SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_items,
         CAST((2000000 * sum(nij * (nij - 1))
               + count(DISTINCT vec_id) * {_K * (_K - 1)})
              // (2 * count(DISTINCT vec_id) * {_K * (_K - 1)}) AS BIGINT)
           AS po_micro
  FROM cell),
pe AS (
  SELECT CAST((2 * sum(pj_micro * pj_micro) + 1000000)
              // 2000000 AS BIGINT) AS pe_micro
  FROM (
    SELECT CAST((2000000 * count(*) + p.n_items * {_K})
                // (2 * p.n_items * {_K}) AS BIGINT) AS pj_micro
    FROM votes v CROSS JOIN po p
    GROUP BY v.vote, p.n_items))
SELECT p.n_items, p.po_micro, e.pe_micro,
       CASE WHEN p.po_micro >= e.pe_micro THEN
         CAST((2000000 * (p.po_micro - e.pe_micro)
               + (1000000 - e.pe_micro))
              // (2 * (1000000 - e.pe_micro)) AS BIGINT)
       ELSE -CAST((2000000 * (e.pe_micro - p.po_micro)
               + (1000000 - e.pe_micro))
              // (2 * (1000000 - e.pe_micro)) AS BIGINT)
       END AS kappa_micro
FROM po p CROSS JOIN pe e
"""


# ---------------------------------------------------------------------------
# vote_rule_sweep
# ---------------------------------------------------------------------------


def q_vote_rule_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-rule frontier: unanimous / majority / single-labeler
    coverage vs accuracy-on-covered."""
    maj = _q._persist_tracked(_majority(spark, sf_dir))
    total = maj.agg(F.count("*").cast("long").alias("t"))
    una = (
        maj.where(f"c = {_K}")
        .agg(
            F.count("*").cast("long").alias("covered"),
            F.sum(F.expr("CASE WHEN majority = label THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("correct"),
        )
        .selectExpr("'unanimous' AS rule", "covered", "correct")
    )
    mjr = (
        maj.where("c >= 2")
        .agg(
            F.count("*").cast("long").alias("covered"),
            F.sum(F.expr("CASE WHEN majority = label THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("correct"),
        )
        .selectExpr("'majority' AS rule", "covered", "correct")
    )
    single = (
        _votes(spark, sf_dir)
        .where("k = 1")
        .agg(
            F.count("*").cast("long").alias("covered"),
            F.sum(F.expr("CASE WHEN vote = label THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("correct"),
        )
        .selectExpr("'single' AS rule", "covered", "correct")
    )
    return (
        una.unionAll(mjr)
        .unionAll(single)
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "rule",
            "covered",
            "correct",
            "CAST((2000000 * covered + t) DIV (2 * t) AS BIGINT)"
            " AS coverage_micro",
            "CAST((2000000 * correct + covered) DIV (2 * covered)"
            " AS BIGINT) AS accuracy_micro",
        )
    )


ORACLE_VOTE_RULE_SWEEP = f"""
WITH {_VOTES_SQL},
{_MAJ_SQL},
total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM maj),
rules AS (
  SELECT 'unanimous' AS rule,
         CAST(count(*) AS BIGINT) AS covered,
         CAST(sum(CASE WHEN majority = label THEN 1 ELSE 0 END)
              AS BIGINT) AS correct
  FROM maj WHERE c = {_K}
  UNION ALL
  SELECT 'majority' AS rule,
         CAST(count(*) AS BIGINT) AS covered,
         CAST(sum(CASE WHEN majority = label THEN 1 ELSE 0 END)
              AS BIGINT) AS correct
  FROM maj WHERE c >= 2
  UNION ALL
  SELECT 'single' AS rule,
         CAST(count(*) AS BIGINT) AS covered,
         CAST(sum(CASE WHEN vote = label THEN 1 ELSE 0 END) AS BIGINT)
           AS correct
  FROM votes WHERE k = 1)
SELECT r.rule, r.covered, r.correct,
       CAST((2000000 * r.covered + t.t) // (2 * t.t) AS BIGINT)
         AS coverage_micro,
       CAST((2000000 * r.correct + r.covered) // (2 * r.covered)
            AS BIGINT) AS accuracy_micro
FROM rules r CROSS JOIN total t
"""


# ---------------------------------------------------------------------------
# item_difficulty_profile
# ---------------------------------------------------------------------------


def q_item_difficulty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items bucketed by #distinct votes: share and majority accuracy
    per disagreement level."""
    votes = _q._persist_tracked(_votes(spark, sf_dir))
    dd = votes.groupBy("vec_id").agg(
        F.countDistinct("vote").cast("long").alias("n_distinct")
    )
    maj = _majority(spark, sf_dir).select("vec_id", "label", "majority")
    per = (
        dd.join(maj, "vec_id")
        .groupBy("n_distinct")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.expr("CASE WHEN majority = label THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_correct"),
        )
    )
    total = dd.agg(F.count("*").cast("long").alias("t"))
    return per.crossJoin(F.broadcast(total)).selectExpr(
        "n_distinct",
        "n_items",
        "n_correct",
        "CAST((2000000 * n_items + t) DIV (2 * t) AS BIGINT)"
        " AS share_micro",
        "CAST((2000000 * n_correct + n_items) DIV (2 * n_items)"
        " AS BIGINT) AS accuracy_micro",
    )


ORACLE_ITEM_DIFFICULTY_PROFILE = f"""
WITH {_VOTES_SQL},
{_MAJ_SQL},
dd AS (
  SELECT vec_id, CAST(count(DISTINCT vote) AS BIGINT) AS n_distinct
  FROM votes GROUP BY vec_id),
per AS (
  SELECT d.n_distinct,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CASE WHEN m.majority = m.label THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
  FROM dd d JOIN maj m ON m.vec_id = d.vec_id
  GROUP BY d.n_distinct),
total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM dd)
SELECT p.n_distinct, p.n_items, p.n_correct,
       CAST((2000000 * p.n_items + t.t) // (2 * t.t) AS BIGINT)
         AS share_micro,
       CAST((2000000 * p.n_correct + p.n_items) // (2 * p.n_items)
            AS BIGINT) AS accuracy_micro
FROM per p CROSS JOIN total t
"""


ANNOTATION_QUERIES = {
    "labeler_accuracy_report": q_labeler_accuracy_report,
    "majority_vote_eval": q_majority_vote_eval,
    "fleiss_kappa": q_fleiss_kappa,
    "vote_rule_sweep": q_vote_rule_sweep,
    "item_difficulty_profile": q_item_difficulty_profile,
}

ANNOTATION_ORACLES = {
    "labeler_accuracy_report": ORACLE_LABELER_ACCURACY_REPORT,
    "majority_vote_eval": ORACLE_MAJORITY_VOTE_EVAL,
    "fleiss_kappa": ORACLE_FLEISS_KAPPA,
    "vote_rule_sweep": ORACLE_VOTE_RULE_SWEEP,
    "item_difficulty_profile": ORACLE_ITEM_DIFFICULTY_PROFILE,
}

_q.QUERIES.update(ANNOTATION_QUERIES)
_q.ORACLES.update(ANNOTATION_ORACLES)
