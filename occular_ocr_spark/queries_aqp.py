"""Approximate-query-processing audit catalog, round 4 (wave 106):
five operators that measure what portable-hash sampling actually
costs — the BlinkDB-style error audits a 100 TB shop runs before
trusting sampled dashboards.  All samples are deterministic
(the md5 hex-alphabet row hash), so sampled and exact sides are both
value-hash-checkable.

* ``sampled_topk_fidelity`` — exact top-{_TK} parts by revenue vs
  the top-{_TK} from the {_RATE}% sample (scaled ×100/{_RATE}):
  overlap count, Jaccard micro, and the worst absolute revenue
  mis-estimate among the overlap.
* ``sampled_groupby_error`` — per-source document counts: sampled ×
  scale vs exact, per-group signed error micro and the summary
  mean-|error| row (micro, half-up).
* ``sampled_quantile_error`` — exact n_chars deciles vs sample
  deciles: per decile the absolute displacement in value units and
  rank micro.
* ``sample_scale_sweep`` — sampling rates {_SWEEP}%: per rate the
  estimated total revenue, the exact total, and the signed relative
  error micro — the error-vs-budget curve.
* ``stratified_vs_uniform_error`` — at the same {_RATE}% budget:
  uniform row sample vs per-source stratified (hash within source) —
  per-source absolute count-estimate errors summed, both designs,
  one comparison row.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_aqp_wave.py.

Cross-engine float policy: exact BIGINT counts and half-up micro
ratios; sampling is the deterministic portable hash — no randomness,
no floating point.

Scale notes: every sampled side is a map-side filter before the same
partial aggs as the exact side; top-K lists are TakeOrdered; the
audits join bounded frames (K rows, sources, deciles).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_TK = 20
_RATE = 10
_SWEEP = [1, 5, 10, 20]


def _h100(col: str, salt: str, dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        # ONE md5 per row: the first 4 hex digits as an integer via
        # conv(, 16, 10) — value-identical to the digit-by-digit form
        # below, which evaluates md5 four times per row (Catalyst's
        # subexpression elimination does not collapse them across the
        # instr/substr nesting; measured 4x the hash cost on the
        # sampled scans).  The oracle keeps the digit form.
        return (
            f"(CAST(conv(substr(md5(CAST({col} AS {strtype})"
            f" || ':{salt}'), 1, 4), 16, 10) AS BIGINT) % 100)"
        )

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
# sampled_topk_fidelity
# ---------------------------------------------------------------------------


def _topk_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    h = _h100("l_orderkey || '-' || l_linenumber", "tk", dialect)
    return f"""
WITH exact_rev AS (
  SELECT l_partkey, CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
           AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey),
exact_top AS (
  SELECT l_partkey, rev FROM exact_rev
  ORDER BY rev DESC, l_partkey LIMIT {_TK}),
samp_rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
              * (100 {intdiv} {_RATE}) AS BIGINT) AS est_rev
  FROM lineitem WHERE {h} < {_RATE}
  GROUP BY l_partkey),
samp_top AS (
  SELECT l_partkey, est_rev FROM samp_rev
  ORDER BY est_rev DESC, l_partkey LIMIT {_TK}),
ov AS (
  SELECT e.l_partkey, e.rev, s.est_rev
  FROM exact_top e JOIN samp_top s ON s.l_partkey = e.l_partkey)
SELECT CAST({_TK} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM ov) AS overlap,
       CAST((2000000 * (SELECT count(*) FROM ov)
            + (2 * {_TK} - (SELECT count(*) FROM ov)))
            {intdiv} (2 * (2 * {_TK} - (SELECT count(*) FROM ov)))
            AS BIGINT) AS jaccard_micro,
       (SELECT CAST(coalesce(max(abs(est_rev - rev)), 0) AS BIGINT)
        FROM ov) AS worst_abs_error
"""


def q_sampled_topk_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs sampled top-K parts: overlap, Jaccard, worst error.

    DataFrame twin of ``_topk_sql``: Spark inlines CTEs, so the SQL
    form's three scalar subqueries over ``ov`` re-ran BOTH top-K
    chains once per reference (~4x); here the ≤K-row overlap join is
    computed once and all three fidelity numbers come out of ONE agg
    row.  The md5-per-row sample hash runs above a scale-adaptive
    fan-out (single local split otherwise; no-op at scale).
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    rev = F.sum(F.expr("CAST(floor(l_extendedprice) AS BIGINT)"))
    ex_top = (
        li.groupBy("l_partkey")
        .agg(rev.cast("bigint").alias("rev"))
        .orderBy(F.col("rev").desc(), "l_partkey")
        .limit(_TK)
    )
    h = _h100("l_orderkey || '-' || l_linenumber", "tk", "spark")
    samp_top = (
        _q._spread(li)
        .where(F.expr(f"{h} < {_RATE}"))
        .groupBy("l_partkey")
        .agg((rev * (100 // _RATE)).cast("bigint").alias("est_rev"))
        .orderBy(F.col("est_rev").desc(), "l_partkey")
        .limit(_TK)
    )
    ov = ex_top.join(samp_top, "l_partkey")
    return ov.agg(
        F.count("*").alias("nov"),
        F.max(F.expr("abs(est_rev - rev)")).alias("werr"),
    ).selectExpr(
        f"CAST({_TK} AS BIGINT) AS k",
        "CAST(nov AS BIGINT) AS overlap",
        f"CAST((2000000 * nov + (2 * {_TK} - nov))"
        f" DIV (2 * (2 * {_TK} - nov)) AS BIGINT) AS jaccard_micro",
        "CAST(coalesce(werr, 0) AS BIGINT) AS worst_abs_error",
    )


ORACLE_SAMPLED_TOPK_FIDELITY = _topk_sql("duck")


# ---------------------------------------------------------------------------
# sampled_groupby_error
# ---------------------------------------------------------------------------


def _gb_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    h = _h100("doc_id", "gb", dialect)
    return f"""
WITH exact_ AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source),
samp AS (
  SELECT source,
         CAST(count(*) * (100 {intdiv} {_RATE}) AS BIGINT) AS est
  FROM documents WHERE {h} < {_RATE} GROUP BY source)
SELECT e.source, e.n AS exact_n,
       coalesce(s.est, 0) AS est_n,
       CASE WHEN coalesce(s.est, 0) >= e.n THEN
         CAST((2000000 * (coalesce(s.est, 0) - e.n) + e.n)
              {intdiv} (2 * e.n) AS BIGINT)
       ELSE -CAST((2000000 * (e.n - coalesce(s.est, 0)) + e.n)
              {intdiv} (2 * e.n) AS BIGINT) END AS rel_error_micro
FROM exact_ e LEFT JOIN samp s ON s.source = e.source
"""


def q_sampled_groupby_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group sampled-count estimates vs exact, signed micro."""
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_gb_sql("spark"))


ORACLE_SAMPLED_GROUPBY_ERROR = _gb_sql("duck")


# ---------------------------------------------------------------------------
# sampled_quantile_error
# ---------------------------------------------------------------------------


def _qe_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    h = _h100("doc_id", "qe", dialect)
    ks = (
        "SELECT explode(sequence(1, 9)) AS k"
        if dialect == "spark"
        else "SELECT unnest(generate_series(1, 9)) AS k"
    )
    return f"""
WITH ks AS ({ks}),
eh AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS m
       FROM documents GROUP BY n_chars),
er AS (
  SELECT v, sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS cum, sum(m) OVER () AS n
  FROM eh),
eq AS (
  SELECT ks.k, CAST(min(v) AS BIGINT) AS exact_q
  FROM er CROSS JOIN ks WHERE cum >= (ks.k * n + 9) {intdiv} 10
  GROUP BY ks.k),
sh AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS m
       FROM documents WHERE {h} < {_RATE} GROUP BY n_chars),
sr AS (
  SELECT v, sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS cum, sum(m) OVER () AS n
  FROM sh),
sq AS (
  SELECT ks.k, CAST(min(v) AS BIGINT) AS sample_q
  FROM sr CROSS JOIN ks WHERE cum >= (ks.k * n + 9) {intdiv} 10
  GROUP BY ks.k)
SELECT e.k AS decile, e.exact_q, s.sample_q,
       CAST(abs(s.sample_q - e.exact_q) AS BIGINT)
         AS abs_displacement
FROM eq e JOIN sq s ON s.k = e.k
"""


def q_sampled_quantile_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sample deciles vs exact deciles: absolute displacement."""
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_qe_sql("spark"))


ORACLE_SAMPLED_QUANTILE_ERROR = _qe_sql("duck")


# ---------------------------------------------------------------------------
# sample_scale_sweep
# ---------------------------------------------------------------------------


def _sweep_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    h = _h100("l_orderkey || '-' || l_linenumber", "sw", dialect)
    legs = []
    for rate in _SWEEP:
        legs.append(f"""
SELECT CAST({rate} AS BIGINT) AS rate_pct,
       CAST(sum(CASE WHEN {h} < {rate} THEN
            CAST(floor(l_extendedprice) AS BIGINT) ELSE 0 END)
            * (100 {intdiv} {rate}) AS BIGINT) AS est_total,
       CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
         AS exact_total
FROM lineitem""")
    body = " UNION ALL ".join(legs)
    return f"""
WITH sweeps AS ({body})
SELECT rate_pct, est_total, exact_total,
       CASE WHEN est_total >= exact_total THEN
         CAST((2000000 * (est_total - exact_total) + exact_total)
              {intdiv} (2 * exact_total) AS BIGINT)
       ELSE -CAST((2000000 * (exact_total - est_total) + exact_total)
              {intdiv} (2 * exact_total) AS BIGINT) END
         AS rel_error_micro
FROM sweeps
"""


def q_sample_scale_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated vs exact totals across the sampling-rate grid."""
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_sweep_sql("spark"))


ORACLE_SAMPLE_SCALE_SWEEP = _sweep_sql("duck")


# ---------------------------------------------------------------------------
# stratified_vs_uniform_error
# ---------------------------------------------------------------------------


def _strat_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    hu = _h100("doc_id", "un", dialect)
    hs = _h100("doc_id", "st", dialect)
    return f"""
WITH exact_ AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source),
uni AS (
  SELECT source,
         CAST(count(*) * (100 {intdiv} {_RATE}) AS BIGINT) AS est
  FROM documents WHERE {hu} < {_RATE} GROUP BY source),
strat AS (
  SELECT source,
         CAST(count(*) * (100 {intdiv} {_RATE}) AS BIGINT) AS est
  FROM documents WHERE {hs} < {_RATE} GROUP BY source),
errs AS (
  SELECT e.source,
         abs(coalesce(u.est, 0) - e.n) AS uni_err,
         abs(coalesce(s.est, 0) - e.n) AS strat_err
  FROM exact_ e
  LEFT JOIN uni u ON u.source = e.source
  LEFT JOIN strat s ON s.source = e.source)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(uni_err) AS BIGINT) AS uniform_abs_error,
       CAST(sum(strat_err) AS BIGINT) AS stratified_abs_error
FROM errs
"""


def q_stratified_vs_uniform_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two same-budget designs' total absolute group errors."""
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_strat_sql("spark"))


ORACLE_STRATIFIED_VS_UNIFORM_ERROR = _strat_sql("duck")


AQP_QUERIES = {
    "sampled_topk_fidelity": q_sampled_topk_fidelity,
    "sampled_groupby_error": q_sampled_groupby_error,
    "sampled_quantile_error": q_sampled_quantile_error,
    "sample_scale_sweep": q_sample_scale_sweep,
    "stratified_vs_uniform_error": q_stratified_vs_uniform_error,
}

AQP_ORACLES = {
    "sampled_topk_fidelity": ORACLE_SAMPLED_TOPK_FIDELITY,
    "sampled_groupby_error": ORACLE_SAMPLED_GROUPBY_ERROR,
    "sampled_quantile_error": ORACLE_SAMPLED_QUANTILE_ERROR,
    "sample_scale_sweep": ORACLE_SAMPLE_SCALE_SWEEP,
    "stratified_vs_uniform_error": ORACLE_STRATIFIED_VS_UNIFORM_ERROR,
}

_q.QUERIES.update(AQP_QUERIES)
_q.ORACLES.update(AQP_ORACLES)
