"""Planted-truth certification catalog, round 4 (wave 96): five
operators that PLANT known structure into the fixture inside the
query (duplicates, spikes, FK violations, hot keys, drift — all via
the portable hash, no randomness) and certify that the corresponding
detector recovers exactly what was planted — detection power proven
against ground truth instead of assumed, the evaluation-harness
companion to the breakdown/placebo waves.

* ``planted_dup_recall`` — union the documents with a re-keyed copy
  (doc_id + max+1): the md5 exact-dedup grouping must report every
  content hash at multiplicity exactly 2 (the fixture's texts are
  unique — pinned elsewhere); emits the multiplicity histogram and
  recall micro.
* ``planted_anomaly_recall`` — hash-picked {_PA_PCT}% of demand days
  ×10: the MAD rule (|x−med| > 3·MAD, both medians exact ceil-rank
  from value histograms of the PLANTED series) scored against the
  plant: planted/flagged/true-positive counts, recall and precision
  micro.
* ``planted_fk_violation_detect`` — hash-picked {_FK_PCT}% of orders
  get custkey + (max+100000): the customer anti-join must count
  EXACTLY the planted rows; emits both counts and the exact_match
  flag.
* ``planted_skew_hotkey_detect`` — the minimum custkey's order rows
  are replicated ×{_SK_AMP} (sequence join): top-key frequency and
  share before vs after, the amplification ratio micro — what the
  skew-salt planner must light up on.
* ``planted_drift_detection`` — snapshot B shifts a hash-half of
  n_chars by +{_DR_SHIFT}; the two-sample chi² drift statistic
  (exact per-bin rationals, micro-quantized) for the planted
  comparison AND the A/A null split; the detected flag requires the
  planted statistic to exceed {_DR_RATIO}× the null.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_planted_wave.py.

Cross-engine float policy: pure exact BIGINT counts, ceil-rank
medians, half-up micro rationals — no floating point (the drift
statistic is the exact-rational chi², not a log-based PSI).

Scale notes: the plants are map-side column edits or bounded
sequence joins; detectors reuse the catalog's scale shapes
(hash-group dedup, value-histogram medians, anti-joins, frequency
partial aggs, bin histograms); no corpus-sized window, no driver
loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_PA_PCT = 5
_FK_PCT = 3
_SK_AMP = 20
_DR_SHIFT = 150
_DR_RATIO = 3
_DR_BIN = 50


def _h100(col: str, salt: str, dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"

    def hexv(j: int) -> str:
        return (
            f"(instr('0123456789abcdef', substr(md5("
            f"CAST({col} AS {strtype}) || ':{salt}'"
            f"), {j}, 1)) - 1)"
        )

    return (
        f"(((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)})"
        f" * 16 + {hexv(4)}) % 100)"
    )


# ---------------------------------------------------------------------------
# planted_dup_recall
# ---------------------------------------------------------------------------


def _dup_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT d.doc_id + f.o AS doc_id, d.text
  FROM documents d CROSS JOIN off f),
groups AS (
  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS copies
  FROM corpus GROUP BY md5(text)),
hist AS (
  SELECT copies, CAST(count(*) AS BIGINT) AS n_groups
  FROM groups GROUP BY copies),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS planted_groups FROM documents)
SELECT h.copies, h.n_groups, t.planted_groups,
       CAST((2000000 * CASE WHEN h.copies = 2 THEN h.n_groups
            ELSE 0 END + t.planted_groups)
            {intdiv} (2 * t.planted_groups) AS BIGINT) AS recall_micro
FROM hist h CROSS JOIN tot t
"""


def q_planted_dup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup recall on a planted duplicated corpus."""
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_dup_sql("spark"))


ORACLE_PLANTED_DUP_RECALL = _dup_sql("duck")


# ---------------------------------------------------------------------------
# planted_anomaly_recall
# ---------------------------------------------------------------------------


def _anomaly_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    h = _h100("d", "pa", dialect)
    return f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS y0
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)),
planted AS (
  SELECT d,
         CASE WHEN {h} < {_PA_PCT} THEN 10 * y0 ELSE y0 END AS y,
         CASE WHEN {h} < {_PA_PCT} THEN 1 ELSE 0 END AS is_planted
  FROM daily),
-- exact lower median of y via the value histogram
vh AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS m FROM planted
       GROUP BY y),
vc AS (
  SELECT v, sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS cum, sum(m) OVER () AS n
  FROM vh),
med AS (SELECT CAST(min(v) AS BIGINT) AS med FROM vc
        WHERE cum >= (n + 1) {intdiv} 2),
-- exact lower median of |y - med|
dh AS (
  SELECT abs(p.y - m.med) AS v, CAST(count(*) AS BIGINT) AS cnt
  FROM planted p CROSS JOIN med m GROUP BY abs(p.y - m.med)),
dc AS (
  SELECT v, sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS cum, sum(cnt) OVER () AS n
  FROM dh),
mad AS (SELECT CAST(min(v) AS BIGINT) AS mad FROM dc
        WHERE cum >= (n + 1) {intdiv} 2),
scored AS (
  SELECT p.is_planted,
         CASE WHEN abs(p.y - m.med) > 3 * x.mad THEN 1 ELSE 0 END
           AS flagged
  FROM planted p CROSS JOIN med m CROSS JOIN mad x)
SELECT CAST(sum(is_planted) AS BIGINT) AS planted_days,
       CAST(sum(flagged) AS BIGINT) AS flagged_days,
       CAST(sum(is_planted * flagged) AS BIGINT) AS true_positives,
       CAST((2000000 * sum(is_planted * flagged) + sum(is_planted))
            {intdiv} (2 * sum(is_planted)) AS BIGINT) AS recall_micro,
       CASE WHEN sum(flagged) > 0 THEN
         CAST((2000000 * sum(is_planted * flagged) + sum(flagged))
              {intdiv} (2 * sum(flagged)) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS precision_micro
FROM scored
"""


def q_planted_anomaly_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-rule recall/precision against hash-planted ×10 spikes."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_anomaly_sql("spark"))


ORACLE_PLANTED_ANOMALY_RECALL = _anomaly_sql("duck")


# ---------------------------------------------------------------------------
# planted_fk_violation_detect
# ---------------------------------------------------------------------------


def _fk_sql(dialect: str) -> str:
    h = _h100("o_orderkey", "fk", dialect)
    return f"""
WITH off AS (SELECT max(c_custkey) + 100000 AS o FROM customer),
corrupted AS (
  SELECT o_orderkey,
         CASE WHEN {h} < {_FK_PCT}
           THEN o_custkey + f.o ELSE o_custkey END AS k,
         CASE WHEN {h} < {_FK_PCT} THEN 1 ELSE 0 END AS is_planted
  FROM orders CROSS JOIN off f),
detected AS (
  SELECT c.is_planted,
         CASE WHEN NOT EXISTS (SELECT 1 FROM customer x
           WHERE x.c_custkey = c.k) THEN 1 ELSE 0 END AS is_orphan
  FROM corrupted c)
SELECT CAST(sum(is_planted) AS BIGINT) AS planted_violations,
       CAST(sum(is_orphan) AS BIGINT) AS detected_orphans,
       CAST(sum(is_planted * is_orphan) AS BIGINT) AS overlap,
       CAST(sum(is_planted) = sum(is_orphan)
            AND sum(is_planted) = sum(is_planted * is_orphan)
            AS BOOLEAN) AS exact_match
FROM detected
"""


def q_planted_fk_violation_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The orphan anti-join must count exactly the planted FK
    corruptions."""
    _q._register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(_fk_sql("spark"))


ORACLE_PLANTED_FK_VIOLATION_DETECT = _fk_sql("duck")


# ---------------------------------------------------------------------------
# planted_skew_hotkey_detect
# ---------------------------------------------------------------------------


def _skew_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    reps = (
        f"SELECT explode(sequence(1, {_SK_AMP})) AS r"
        if dialect == "spark"
        else f"SELECT unnest(generate_series(1, {_SK_AMP})) AS r"
    )
    return f"""
WITH hot AS (SELECT min(o_custkey) AS hk FROM orders),
before AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey),
amplified AS (
  SELECT o.o_custkey AS k
  FROM orders o CROSS JOIN hot h CROSS JOIN ({reps}) g
  WHERE o.o_custkey = h.hk
  UNION ALL
  SELECT o.o_custkey AS k FROM orders o CROSS JOIN hot h
  WHERE o.o_custkey <> h.hk),
after_ AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n
  FROM amplified GROUP BY k),
tops AS (
  SELECT h.hk,
         (SELECT n FROM before b WHERE b.k = h.hk) AS freq_before,
         (SELECT n FROM after_ a WHERE a.k = h.hk) AS freq_after,
         (SELECT CAST(sum(n) AS BIGINT) FROM before) AS tot_before,
         (SELECT CAST(sum(n) AS BIGINT) FROM after_) AS tot_after
  FROM hot h)
SELECT CAST(hk AS BIGINT) AS hot_key,
       freq_before, freq_after, tot_before, tot_after,
       CAST((2000000 * freq_before + tot_before)
            {intdiv} (2 * tot_before) AS BIGINT) AS share_before_micro,
       CAST((2000000 * freq_after + tot_after)
            {intdiv} (2 * tot_after) AS BIGINT) AS share_after_micro,
       CAST((2000000 * freq_after + freq_before)
            {intdiv} (2 * freq_before) AS BIGINT)
         AS amplification_micro
FROM tops
"""


def q_planted_skew_hotkey_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frequency profile of the deliberately amplified key — what the
    skew planner must flag."""
    _q._register_views(spark, sf_dir, ["orders"])
    return spark.sql(_skew_sql("spark"))


ORACLE_PLANTED_SKEW_HOTKEY_DETECT = _skew_sql("duck")


# ---------------------------------------------------------------------------
# planted_drift_detection
# ---------------------------------------------------------------------------


def _drift_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    h = _h100("doc_id", "dr", dialect)
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH base AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS v,
         CASE WHEN {h} < 50 THEN 1 ELSE 0 END AS half
  FROM documents),
-- planted comparison: half B shifted; null comparison: raw halves
snap AS (
  SELECT 'planted' AS scenario,
         CASE WHEN half = 1 THEN 'b' ELSE 'a' END AS side,
         CASE WHEN half = 1 THEN v + {_DR_SHIFT} ELSE v END AS v
  FROM base
  UNION ALL
  SELECT 'null' AS scenario,
         CASE WHEN half = 1 THEN 'b' ELSE 'a' END AS side,
         v
  FROM base),
bins AS (
  SELECT scenario, side, v {intdiv} {_DR_BIN} AS bin,
         CAST(count(*) AS BIGINT) AS c
  FROM snap GROUP BY scenario, side, v {intdiv} {_DR_BIN}),
piv AS (
  SELECT scenario, bin,
         CAST(sum(CASE WHEN side = 'a' THEN c ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(sum(CASE WHEN side = 'b' THEN c ELSE 0 END) AS BIGINT)
           AS cb
  FROM bins GROUP BY scenario, bin),
tots AS (
  SELECT scenario,
         CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM piv GROUP BY scenario),
terms AS (
  SELECT p.scenario,
         -- two-sample chi² bin term:
         -- (ca·nb − cb·na)² / (na·nb·(ca+cb)), micro-quantized
         CAST((2000000 * (CAST(p.ca AS {wide}) * t.nb
              - CAST(p.cb AS {wide}) * t.na)
              * (CAST(p.ca AS {wide}) * t.nb
              - CAST(p.cb AS {wide}) * t.na)
              + CAST(t.na AS {wide}) * t.nb * (p.ca + p.cb))
              {intdiv} (2 * CAST(t.na AS {wide}) * t.nb
              * (p.ca + p.cb)) AS BIGINT) AS term_micro
  FROM piv p JOIN tots t ON t.scenario = p.scenario
  WHERE p.ca + p.cb > 0),
chi AS (
  SELECT scenario, CAST(sum(term_micro) AS BIGINT) AS chi2_micro
  FROM terms GROUP BY scenario)
SELECT c.scenario, c.chi2_micro,
       CAST(CASE WHEN c.scenario = 'planted' THEN
         c.chi2_micro > {_DR_RATIO} * (SELECT chi2_micro FROM chi
           WHERE scenario = 'null')
       ELSE FALSE END AS BOOLEAN) AS detected
FROM chi c
"""


def q_planted_drift_detection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-rational chi² drift: planted shift vs the A/A null."""
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_drift_sql("spark"))


ORACLE_PLANTED_DRIFT_DETECTION = _drift_sql("duck")


PLANTED_QUERIES = {
    "planted_dup_recall": q_planted_dup_recall,
    "planted_anomaly_recall": q_planted_anomaly_recall,
    "planted_fk_violation_detect": q_planted_fk_violation_detect,
    "planted_skew_hotkey_detect": q_planted_skew_hotkey_detect,
    "planted_drift_detection": q_planted_drift_detection,
}

PLANTED_ORACLES = {
    "planted_dup_recall": ORACLE_PLANTED_DUP_RECALL,
    "planted_anomaly_recall": ORACLE_PLANTED_ANOMALY_RECALL,
    "planted_fk_violation_detect": ORACLE_PLANTED_FK_VIOLATION_DETECT,
    "planted_skew_hotkey_detect": ORACLE_PLANTED_SKEW_HOTKEY_DETECT,
    "planted_drift_detection": ORACLE_PLANTED_DRIFT_DETECTION,
}

_q.QUERIES.update(PLANTED_QUERIES)
_q.ORACLES.update(PLANTED_ORACLES)
