"""Survey-sampling design catalog, round 4 (wave 75): five operators
from classical sampling theory (Madow systematic PPS, Kish design
effects, Poisson πps) — the machinery a 100 TB curation pipeline uses
to draw SMALL audited samples whose inclusion probabilities are
provable, not vibes.  Weights are document lengths (n_chars); all
randomness is the portable salted-md5 hash.

* ``pps_systematic_sample`` — Madow's systematic
  probability-proportional-to-size draw of m={_PPS_M}: the all-integer
  grid-crossing identity hits_i = f(m·cum_i) - f(m·cum_prev) with
  f(x) = (x + W - o - 1) DIV W (the +W shift keeps every operand
  non-negative, so the engines' negative-division difference never
  engages); Σ hits = m EXACTLY, by construction.
* ``pps_inclusion_audit`` — per source: realized hits vs the exact
  expected m·w_src/W in half-up micro — the inclusion-probability
  contract of the draw above.
* ``alternating_split_audit`` — deterministic matched-halves split:
  within each (lang, source) stratum, rank by (n_chars, doc_id) and
  alternate A/B; per stratum the size gap is provably ≤ 1 and the
  weight gap is reported in half-up micro.
* ``kish_design_effect`` — per source: Kish's effective sample size
  n_eff = (Σw)²/Σw² and the design effect n/n_eff, exact micro
  (operands bounded < 2^63 at the tested scales, documented).
* ``poisson_sampling_plan`` — fixed-π Poisson sampling at target
  m={_PPS_M}: π_i = min(1e6, ⌊1e6·m·w_i/W⌋) micro (floor,
  documented), hash-Bernoulli selection, and the per-source
  expected-vs-realized ledger.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_sampling2_wave.py.

Cross-engine float policy: exact integers end-to-end; the only
divisions are floors/half-ups over non-negative operands.

Scale notes: the cumulative-weight prefix is one global ordered
window (two-level rank at 10^12 rows, as documented at
group_quantiles_dist); everything downstream is partial aggs to
#selected / #sources / #strata rows.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_PPS_M = 20


def _h_spark(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def _h_sql(expr: str) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT) AS BIGINT)"
    )


def _cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, w, cum_prev, cum) over the doc_id order plus
    the grand total W and the draw offset o = H('pps') % W."""
    base = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", "n_chars AS w"
    )
    cum = base.selectExpr(
        "doc_id",
        "source",
        "w",
        "sum(w) OVER (ORDER BY doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum",
    ).selectExpr("doc_id", "source", "w", "cum - w AS cum_prev", "cum")
    tot = base.agg(F.sum("w").cast("long").alias("bigw")).selectExpr(
        "bigw",
        f"{_h_spark(chr(39) + 'pps' + chr(39))} % bigw AS o",
    )
    return cum.crossJoin(F.broadcast(tot))


_CUM_SQL = f"""
cum AS (
  SELECT doc_id, source, w, cum - w AS cum_prev, cum, bigw, o
  FROM (
    SELECT doc_id, source, n_chars AS w,
           sum(n_chars) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM documents) c
  CROSS JOIN (
    SELECT CAST(sum(n_chars) AS BIGINT) AS bigw,
           {_h_sql("'pps'")} % CAST(sum(n_chars) AS BIGINT) AS o
    FROM documents) t)
"""

_HITS_EXPR_SPARK = (
    f"CAST(({_PPS_M} * cum + bigw - o - 1) DIV bigw"
    f" - ({_PPS_M} * cum_prev + bigw - o - 1) DIV bigw AS BIGINT)"
)
_HITS_EXPR_SQL = (
    f"CAST(({_PPS_M} * cum + bigw - o - 1) // bigw"
    f" - ({_PPS_M} * cum_prev + bigw - o - 1) // bigw AS BIGINT)"
)


# ---------------------------------------------------------------------------
# pps_systematic_sample
# ---------------------------------------------------------------------------


def q_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Madow systematic PPS draw: selected docs with their weight
    spans and hit multiplicities (a doc heavier than the step can be
    hit more than once — with-replacement semantics, documented)."""
    return (
        _cum(spark, sf_dir)
        .selectExpr(
            "doc_id",
            "source",
            "w",
            "cum_prev",
            "cum",
            f"{_HITS_EXPR_SPARK} AS hits",
        )
        .where("hits >= 1")
    )


ORACLE_PPS_SYSTEMATIC_SAMPLE = f"""
WITH {_CUM_SQL}
SELECT doc_id, source, w, cum_prev, cum, {_HITS_EXPR_SQL} AS hits
FROM cum
WHERE {_HITS_EXPR_SQL} >= 1
"""


# ---------------------------------------------------------------------------
# pps_inclusion_audit
# ---------------------------------------------------------------------------


def q_pps_inclusion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: realized systematic-PPS hits vs the exact expected
    m·w_src/W (half-up micro) — plus the global Σhits = m invariant
    carried on every row."""
    c = _q._persist_tracked(
        _cum(spark, sf_dir).selectExpr(
            "source", "w", "bigw", f"{_HITS_EXPR_SPARK} AS hits"
        )
    )
    per = c.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("w_src"),
        F.sum("hits").cast("long").alias("realized_hits"),
        F.max("bigw").cast("long").alias("bigw"),
    )
    tot = c.agg(F.sum("hits").cast("long").alias("total_hits"))
    return per.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "n_docs",
        "w_src",
        "realized_hits",
        f"CAST((2000000 * {_PPS_M} * w_src + bigw) DIV (2 * bigw)"
        " AS BIGINT) AS expected_hits_micro",
        "total_hits",
    )


ORACLE_PPS_INCLUSION_AUDIT = f"""
WITH {_CUM_SQL},
h AS (
  SELECT source, w, bigw, {_HITS_EXPR_SQL} AS hits FROM cum),
per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS w_src,
         CAST(sum(hits) AS BIGINT) AS realized_hits,
         CAST(max(bigw) AS BIGINT) AS bigw
  FROM h GROUP BY source),
tot AS (SELECT CAST(sum(hits) AS BIGINT) AS total_hits FROM h)
SELECT p.source, p.n_docs, p.w_src, p.realized_hits,
       CAST((2000000 * {_PPS_M} * p.w_src + p.bigw) // (2 * p.bigw)
            AS BIGINT) AS expected_hits_micro,
       t.total_hits
FROM per p CROSS JOIN tot t
"""


# ---------------------------------------------------------------------------
# alternating_split_audit
# ---------------------------------------------------------------------------


def q_alternating_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-halves split: within each (lang, source) stratum,
    alternate A/B down the (n_chars, doc_id) ranking; per stratum the
    size gap ≤ 1 by construction and the weight gap in half-up micro
    of the stratum weight."""
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "lang",
            "source",
            "n_chars AS w",
            "row_number() OVER (PARTITION BY lang, source"
            " ORDER BY n_chars, doc_id) % 2 AS side_b",
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("side_b").cast("long").alias("n_a"),
            F.sum(F.expr("(1 - side_b) * w")).cast("long").alias("w_b"),
            F.sum(F.expr("side_b * w")).cast("long").alias("w_a"),
            F.sum("w").cast("long").alias("w_total"),
        )
        .selectExpr(
            "lang",
            "source",
            "n_docs",
            "n_a",
            "n_docs - n_a AS n_b",
            "w_a",
            "w_b",
            "abs(n_a - (n_docs - n_a)) AS size_gap",
            "CAST((2000000 * abs(w_a - w_b) + w_total)"
            " DIV (2 * w_total) AS BIGINT) AS weight_gap_micro",
        )
    )


ORACLE_ALTERNATING_SPLIT_AUDIT = """
WITH ranked AS (
  SELECT lang, source, n_chars AS w,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY n_chars, doc_id) % 2 AS side_b
  FROM documents)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(side_b) AS BIGINT) AS n_a,
       CAST(count(*) - sum(side_b) AS BIGINT) AS n_b,
       CAST(sum(side_b * w) AS BIGINT) AS w_a,
       CAST(sum((1 - side_b) * w) AS BIGINT) AS w_b,
       CAST(abs(sum(side_b) - (count(*) - sum(side_b))) AS BIGINT)
         AS size_gap,
       CAST((2000000 * abs(sum(side_b * w) - sum((1 - side_b) * w))
             + sum(w)) // (2 * sum(w)) AS BIGINT) AS weight_gap_micro
FROM ranked GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# kish_design_effect
# ---------------------------------------------------------------------------


def q_kish_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish per source: n_eff = (Σw)²/Σw² and deff = n·Σw²/(Σw)² in
    half-up micro (operands < 2^63 at the tested scales — the 1e6·S1²
    product bounds the valid weight mass, documented)."""
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr("source", "n_chars AS w")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("s1"),
            F.sum(F.expr("w * w")).cast("long").alias("s2"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "s1",
            "s2",
            "CAST((2000000 * s1 * s1 + s2) DIV (2 * s2) AS BIGINT)"
            " AS neff_micro",
            "CAST((2000000 * n_docs * s2 + s1 * s1)"
            " DIV (2 * s1 * s1) AS BIGINT) AS deff_micro",
        )
    )


ORACLE_KISH_DESIGN_EFFECT = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS s1,
       CAST(sum(n_chars * n_chars) AS BIGINT) AS s2,
       CAST((2000000 * sum(n_chars) * sum(n_chars) + sum(n_chars * n_chars))
            // (2 * sum(n_chars * n_chars)) AS BIGINT) AS neff_micro,
       CAST((2000000 * count(*) * sum(n_chars * n_chars)
             + sum(n_chars) * sum(n_chars))
            // (2 * sum(n_chars) * sum(n_chars)) AS BIGINT) AS deff_micro
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# poisson_sampling_plan
# ---------------------------------------------------------------------------


def q_poisson_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-π Poisson sampling at target m: π_i = min(1e6,
    ⌊1e6·m·w_i/W⌋) micro, selection by salted hash; per source the
    expected (Σπ) vs realized ledger."""
    base = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", "n_chars AS w"
    )
    tot = base.agg(F.sum("w").cast("long").alias("bigw"))
    flagged = base.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        f"least(1000000L, (1000000 * {_PPS_M} * w) DIV bigw) AS pi_micro",
        "CASE WHEN "
        + _h_spark("concat('poi:', CAST(doc_id AS STRING))")
        + f" % 1000000 < least(1000000L, (1000000 * {_PPS_M} * w)"
        " DIV bigw) THEN 1 ELSE 0 END AS sel",
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("pi_micro").cast("long").alias("expected_micro"),
        F.sum("sel").cast("long").alias("realized"),
    )


ORACLE_POISSON_SAMPLING_PLAN = f"""
WITH tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS bigw FROM documents),
flagged AS (
  SELECT d.source,
         least(1000000, (1000000 * {_PPS_M} * d.n_chars) // t.bigw)
           AS pi_micro,
         CASE WHEN {_h_sql("'poi:' || CAST(d.doc_id AS VARCHAR)")}
              % 1000000 < least(1000000,
                (1000000 * {_PPS_M} * d.n_chars) // t.bigw)
              THEN 1 ELSE 0 END AS sel
  FROM documents d CROSS JOIN tot t)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pi_micro) AS BIGINT) AS expected_micro,
       CAST(sum(sel) AS BIGINT) AS realized
FROM flagged GROUP BY source
"""


SAMPLING2_QUERIES = {
    "pps_systematic_sample": q_pps_systematic_sample,
    "pps_inclusion_audit": q_pps_inclusion_audit,
    "alternating_split_audit": q_alternating_split_audit,
    "kish_design_effect": q_kish_design_effect,
    "poisson_sampling_plan": q_poisson_sampling_plan,
}

SAMPLING2_ORACLES = {
    "pps_systematic_sample": ORACLE_PPS_SYSTEMATIC_SAMPLE,
    "pps_inclusion_audit": ORACLE_PPS_INCLUSION_AUDIT,
    "alternating_split_audit": ORACLE_ALTERNATING_SPLIT_AUDIT,
    "kish_design_effect": ORACLE_KISH_DESIGN_EFFECT,
    "poisson_sampling_plan": ORACLE_POISSON_SAMPLING_PLAN,
}

_q.QUERIES.update(SAMPLING2_QUERIES)
_q.ORACLES.update(SAMPLING2_ORACLES)
