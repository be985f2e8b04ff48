"""Probabilistic-forecast evaluation catalog, round 4 (wave 63): five
operators that score a calibrated forecaster the way a
quality-classifier gate on a 100 TB corpus is audited before its
threshold ships.  The forecast pair is synthesized deterministically
and identically on both engines from salted md5 of doc_id:
``p_micro = H('p:'||doc_id) % 1000001`` (the forecast probability in
micro) and ``y = [H('y:'||doc_id) % 1000000 < p_micro]`` (a Bernoulli
outcome that is *exactly* calibrated by construction — so every
statistic below has a known ballpark to sanity-check against).
The ensemble entries add M={_M} members ``m_k = H('m:k:'||doc_id) %
{_X_MOD}`` forecasting the target ``x = n_chars % {_X_MOD}``.

* ``brier_decomposition`` — Murphy's reliability / resolution /
  uncertainty split of the Brier score over {_BR_BINS} forecast bins,
  all in exact micro² fixed point.
* ``crps_ensemble`` — the empirical-ensemble CRPS ``mean|m-x| -
  ½·mean|m_i-m_j|`` per lang, kept integer by the 2M² scaling and
  expanded to scalar expressions (M constant) — zero shuffle beyond
  the per-lang partial agg.
* ``pinball_loss`` — quantile loss of the per-lang exact empirical
  quantile predictor at q ∈ {_PB_QS} micro; the empirical quantile is
  the pinball minimizer, which the tests exploit.
* ``interval_coverage`` — central [lo, hi] exact-quantile intervals
  at nominal levels {_IC_LEVELS} micro: width and achieved coverage.
* ``pit_histogram`` — probability-integral-transform ranks of x
  among the M members (0..M), with uniformity χ² in exact micro via
  the (6n_r - N)²/(6N) integer form.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_forecast_wave.py.

Cross-engine float policy: everything is integer fixed point —
probabilities/levels in micro, squared terms in micro², CRPS scaled
by 2M² before its single half-up micro division.

Scale notes: brier/pit collapse via partial aggs to ≤#bins rows; the
quantile selections window per lang (bounded groups; production form
is group_quantiles_dist's two-pass histogram); crps is pure per-row
scalar arithmetic inside codegen before a per-lang partial agg.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_M = 5
_X_MOD = 1001
_BR_BINS = 20  # p_micro DIV 50000 -> 0..20 (21st bin only at p=1.0)
_BR_W = 1_000_000 // _BR_BINS
_PB_QS = [100_000, 500_000, 900_000]
_IC_LEVELS = [500_000, 800_000, 900_000]


def _h_spark(salt: str, col: str = "doc_id") -> str:
    return (
        f"CAST(conv(substr(md5(concat('{salt}:', CAST({col} AS STRING))),"
        " 1, 8), 16, 10) AS BIGINT)"
    )


def _h_sql(salt: str, col: str = "doc_id") -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('{salt}:' ||"
        f" CAST({col} AS VARCHAR)), 1, 8) AS BIGINT) AS BIGINT)"
    )


def _forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, p_micro, y): the calibrated synthetic pair."""
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "lang",
        f"{_h_spark('p')} % 1000001 AS p_micro",
        f"CASE WHEN {_h_spark('y')} % 1000000 <"
        f" {_h_spark('p')} % 1000001 THEN 1 ELSE 0 END AS y",
    )


_FORECAST_SQL = f"""
forecast AS (
  SELECT doc_id, lang,
         {_h_sql('p')} % 1000001 AS p_micro,
         CASE WHEN {_h_sql('y')} % 1000000 <
              {_h_sql('p')} % 1000001 THEN 1 ELSE 0 END AS y
  FROM documents)
"""


# ---------------------------------------------------------------------------
# brier_decomposition
# ---------------------------------------------------------------------------


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score, exact micro² fixed
    point: REL - RES + UNC ≈ Brier (equality up to binning).

    Scale: one partial agg to ≤{_BR_BINS}+1 bins, a 1-row global
    crossJoin, and a final ≤#bins-row agg — the corpus is scanned
    once.
    """
    fc = _q._persist_tracked(_forecast(spark, sf_dir))
    bins = fc.selectExpr(
        f"p_micro DIV {_BR_W} AS bin", "p_micro", "y"
    ).groupBy("bin").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("p_micro").cast("long").alias("s_p"),
        F.sum("y").cast("long").alias("s_y"),
    )
    glob = fc.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(
            (F.col("p_micro") - 1_000_000 * F.col("y"))
            * (F.col("p_micro") - 1_000_000 * F.col("y"))
        ).cast("long").alias("sq"),
    ).selectExpr(
        "n",
        "CAST((2000000 * sy + n) DIV (2 * n) AS BIGINT) AS ybar_micro",
        "CAST((2 * sq + n) DIV (2 * n) AS BIGINT) AS brier_micro2",
    )
    return (
        bins.crossJoin(F.broadcast(glob))
        .selectExpr(
            "n",
            "ybar_micro",
            "brier_micro2",
            "n_b",
            "CAST((2 * s_p + n_b) DIV (2 * n_b) AS BIGINT) AS pbar",
            "CAST((2000000 * s_y + n_b) DIV (2 * n_b) AS BIGINT) AS ybar_b",
        )
        .groupBy("n", "ybar_micro", "brier_micro2")
        .agg(
            F.expr(
                "CAST((2 * sum(n_b * (pbar - ybar_b) * (pbar - ybar_b))"
                " + n) DIV (2 * n) AS BIGINT)"
            ).alias("reliability_micro2"),
            F.expr(
                "CAST((2 * sum(n_b * (ybar_b - ybar_micro)"
                " * (ybar_b - ybar_micro)) + n) DIV (2 * n) AS BIGINT)"
            ).alias("resolution_micro2"),
        )
        .selectExpr(
            "n",
            "ybar_micro",
            "brier_micro2",
            "reliability_micro2",
            "resolution_micro2",
            "ybar_micro * (1000000 - ybar_micro) AS uncertainty_micro2",
        )
    )


ORACLE_BRIER_DECOMPOSITION = f"""
WITH {_FORECAST_SQL},
bins AS (
  SELECT p_micro // {_BR_W} AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(p_micro) AS BIGINT) AS s_p,
         CAST(sum(y) AS BIGINT) AS s_y
  FROM forecast GROUP BY 1),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST((2000000 * sum(y) + count(*)) // (2 * count(*)) AS BIGINT)
           AS ybar_micro,
         CAST((2 * sum((p_micro - 1000000 * y) * (p_micro - 1000000 * y))
               + count(*)) // (2 * count(*)) AS BIGINT) AS brier_micro2
  FROM forecast),
terms AS (
  SELECT g.n, g.ybar_micro, g.brier_micro2, b.n_b,
         CAST((2 * b.s_p + b.n_b) // (2 * b.n_b) AS BIGINT) AS pbar,
         CAST((2000000 * b.s_y + b.n_b) // (2 * b.n_b) AS BIGINT) AS ybar_b
  FROM bins b CROSS JOIN gstats g)
SELECT n, ybar_micro, brier_micro2,
       CAST((2 * sum(n_b * (pbar - ybar_b) * (pbar - ybar_b)) + n)
            // (2 * n) AS BIGINT) AS reliability_micro2,
       CAST((2 * sum(n_b * (ybar_b - ybar_micro) * (ybar_b - ybar_micro))
             + n) // (2 * n) AS BIGINT) AS resolution_micro2,
       ybar_micro * (1000000 - ybar_micro) AS uncertainty_micro2
FROM terms GROUP BY n, ybar_micro, brier_micro2
"""


# ---------------------------------------------------------------------------
# crps_ensemble
# ---------------------------------------------------------------------------


def _member_exprs(h) -> list[str]:
    return [f"{h(f'm:{k}')} % {_X_MOD}" for k in range(1, _M + 1)]


def q_crps_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang empirical-ensemble CRPS, integer via the 2M² scaling:
    crps_micro = ⌈1e6·(2M·Σ|m-x| - ΣΣ|m_i-m_j|) / (2M²·n)⌋ half-up.

    Scale: the M members are constant-count scalar expressions — no
    explode, no shuffle; the only exchange is the per-lang partial
    agg.
    """
    ms = _member_exprs(_h_spark)
    t1 = " + ".join(f"abs(({m}) - x)" for m in ms)
    t2 = " + ".join(
        f"abs(({ms[i]}) - ({ms[j]}))"
        for i in range(_M)
        for j in range(_M)
        if i != j
    )
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr("doc_id", "lang", f"n_chars % {_X_MOD} AS x")
        .selectExpr("lang", f"{t1} AS term1", f"{t2} AS term2")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("term1").cast("long").alias("sum_absdev"),
            F.sum("term2").cast("long").alias("sum_pairdev"),
        )
        .selectExpr(
            "lang",
            "n_docs",
            "sum_absdev",
            "sum_pairdev",
            f"CAST((2000000 * ({2 * _M} * sum_absdev - sum_pairdev)"
            f" + {2 * _M * _M} * n_docs)"
            f" DIV (2 * {2 * _M * _M} * n_docs) AS BIGINT)"
            " AS mean_crps_micro",
        )
    )


def _crps_oracle() -> str:
    ms = _member_exprs(_h_sql)
    t1 = " + ".join(f"abs(({m}) - x)" for m in ms)
    t2 = " + ".join(
        f"abs(({ms[i]}) - ({ms[j]}))"
        for i in range(_M)
        for j in range(_M)
        if i != j
    )
    return f"""
WITH base AS (
  SELECT doc_id, lang, n_chars % {_X_MOD} AS x FROM documents),
terms AS (
  SELECT lang, {t1} AS term1, {t2} AS term2 FROM base)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(term1) AS BIGINT) AS sum_absdev,
       CAST(sum(term2) AS BIGINT) AS sum_pairdev,
       CAST((2000000 * ({2 * _M} * sum(term1) - sum(term2))
             + {2 * _M * _M} * count(*))
            // (2 * {2 * _M * _M} * count(*)) AS BIGINT)
         AS mean_crps_micro
FROM terms GROUP BY lang
"""


ORACLE_CRPS_ENSEMBLE = _crps_oracle()


# ---------------------------------------------------------------------------
# pinball_loss
# ---------------------------------------------------------------------------

_QUANT_SQL = """
ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
"""


def _vcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_chars, _n, _cum, n) — the compressed twin of the SQL
    rank frame: per-(lang, value) counts with an inclusive cumulative
    and the per-lang total.  The value AT raw rank k (n_chars,
    doc_id order) is the smallest value whose cumulative count reaches
    k — the doc_id tiebreak cannot change the selected VALUE — so rank
    SELECTION reads off this bounded frame instead of a full-rank
    window partitioned by the fixed-cardinality lang over raw rows
    (the r6 two-level-rank doctrine; windows here run over distinct
    n_chars values only)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "n_chars")
        .agg(F.count("*").alias("_n"))
        .selectExpr(
            "lang",
            "n_chars",
            "_n",
            "sum(_n) OVER (PARTITION BY lang ORDER BY n_chars) AS _cum",
            "sum(_n) OVER (PARTITION BY lang) AS n",
        )
    )


def q_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the per-lang exact empirical
    q-quantile predictor, q in {_PB_QS} micro; the ceil-rank
    empirical quantile is the pinball minimizer over the same data.

    Scale: rank windows partition by lang (bounded groups; production
    = group_quantiles_dist); the loss pass is one broadcast join of
    the ≤#langs×#qs predictor frame against the corpus.
    """
    qs = spark.createDataFrame([(q,) for q in _PB_QS], "q_micro long")
    ranked = _q._persist_tracked(_vcounts(spark, sf_dir))
    yhat = (
        ranked.crossJoin(F.broadcast(qs))
        .withColumn(
            "_tgt", F.expr("greatest(1L, (q_micro * n + 999999) DIV 1000000)")
        )
        .where("_cum >= _tgt AND _cum - _n < _tgt")
        .selectExpr("lang", "q_micro", "n_chars AS yhat")
    )
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr("lang", "n_chars")
        .join(F.broadcast(yhat), "lang")
        .selectExpr(
            "lang",
            "q_micro",
            "yhat",
            "CASE WHEN n_chars >= yhat THEN q_micro * (n_chars - yhat)"
            " ELSE (1000000 - q_micro) * (yhat - n_chars) END AS loss",
        )
        .groupBy("lang", "q_micro", "yhat")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("loss").cast("long").alias("loss_sum"),
        )
        .selectExpr(
            "lang",
            "q_micro",
            "yhat",
            "n_docs",
            "loss_sum",
            "CAST((2 * loss_sum + n_docs) DIV (2 * n_docs) AS BIGINT)"
            " AS mean_loss_micro",
        )
    )


ORACLE_PINBALL_LOSS = f"""
WITH {_QUANT_SQL},
qs AS (SELECT unnest(ARRAY{_PB_QS}) AS q_micro),
yhat AS (
  SELECT r.lang, q.q_micro, r.n_chars AS yhat
  FROM ranked r CROSS JOIN qs q
  WHERE r.rk = greatest(1, (q.q_micro * r.n + 999999) // 1000000)),
loss AS (
  SELECT d.lang, y.q_micro, y.yhat,
         CASE WHEN d.n_chars >= y.yhat
              THEN y.q_micro * (d.n_chars - y.yhat)
              ELSE (1000000 - y.q_micro) * (y.yhat - d.n_chars)
         END AS loss
  FROM documents d JOIN yhat y ON y.lang = d.lang)
SELECT lang, CAST(q_micro AS BIGINT) AS q_micro, yhat,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(loss) AS BIGINT) AS loss_sum,
       CAST((2 * sum(loss) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mean_loss_micro
FROM loss GROUP BY lang, q_micro, yhat
"""


# ---------------------------------------------------------------------------
# interval_coverage
# ---------------------------------------------------------------------------


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Central exact-quantile interval audit per (lang, nominal
    level): bounds, width, achieved half-up micro coverage.

    Scale: same bounded rank windows as pinball_loss; the coverage
    pass is one broadcast join + partial agg.
    """
    levels = spark.createDataFrame(
        [(lv,) for lv in _IC_LEVELS], "level_micro long"
    )
    ranked = _q._persist_tracked(_vcounts(spark, sf_dir))
    lo = (
        ranked.crossJoin(F.broadcast(levels))
        .withColumn(
            "_tgt",
            F.expr(
                "greatest(1L, (((1000000 - level_micro) DIV 2) * n"
                " + 999999) DIV 1000000)"
            ),
        )
        .where("_cum >= _tgt AND _cum - _n < _tgt")
        .selectExpr("lang", "level_micro", "n_chars AS lo")
    )
    hi = (
        ranked.crossJoin(F.broadcast(levels))
        .withColumn(
            "_tgt",
            F.expr(
                "greatest(1L, ((1000000 - (1000000 - level_micro) DIV 2)"
                " * n + 999999) DIV 1000000)"
            ),
        )
        .where("_cum >= _tgt AND _cum - _n < _tgt")
        .selectExpr("lang", "level_micro", "n_chars AS hi")
    )
    bounds = lo.join(hi, ["lang", "level_micro"])
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr("lang", "n_chars")
        .join(F.broadcast(bounds), "lang")
        .groupBy("lang", "level_micro", "lo", "hi")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.expr(
                    "CASE WHEN n_chars >= lo AND n_chars <= hi"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("long").alias("covered"),
        )
        .selectExpr(
            "lang",
            "level_micro",
            "lo",
            "hi",
            "hi - lo AS width",
            "n_docs",
            "covered",
            "CAST((2000000 * covered + n_docs) DIV (2 * n_docs) AS BIGINT)"
            " AS coverage_micro",
        )
    )


ORACLE_INTERVAL_COVERAGE = f"""
WITH {_QUANT_SQL},
levels AS (SELECT unnest(ARRAY{_IC_LEVELS}) AS level_micro),
lo AS (
  SELECT r.lang, l.level_micro, r.n_chars AS lo
  FROM ranked r CROSS JOIN levels l
  WHERE r.rk = greatest(1, (((1000000 - l.level_micro) // 2) * r.n
                            + 999999) // 1000000)),
hi AS (
  SELECT r.lang, l.level_micro, r.n_chars AS hi
  FROM ranked r CROSS JOIN levels l
  WHERE r.rk = greatest(1, ((1000000 - (1000000 - l.level_micro) // 2)
                            * r.n + 999999) // 1000000)),
bounds AS (
  SELECT lo.lang, lo.level_micro, lo.lo, hi.hi
  FROM lo JOIN hi ON hi.lang = lo.lang
                 AND hi.level_micro = lo.level_micro)
SELECT d.lang, CAST(b.level_micro AS BIGINT) AS level_micro, b.lo, b.hi,
       b.hi - b.lo AS width,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.n_chars >= b.lo AND d.n_chars <= b.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS covered,
       CAST((2000000 * sum(CASE WHEN d.n_chars >= b.lo AND
                 d.n_chars <= b.hi THEN 1 ELSE 0 END) + count(*))
            // (2 * count(*)) AS BIGINT) AS coverage_micro
FROM documents d JOIN bounds b ON b.lang = d.lang
GROUP BY d.lang, b.level_micro, b.lo, b.hi
"""


# ---------------------------------------------------------------------------
# pit_histogram
# ---------------------------------------------------------------------------


def q_pit_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT ranks of x among the M members (strict-less count, 0..M)
    with exact-integer uniformity χ²: Σ((M+1)·n_r - N)² / ((M+1)·N)
    in half-up micro, repeated on every histogram row.

    Scale: rank is per-row scalar arithmetic; histogram ≤ M+1 rows.
    """
    ms = _member_exprs(_h_spark)
    rank_expr = " + ".join(
        f"CASE WHEN ({m}) < x THEN 1 ELSE 0 END" for m in ms
    )
    hist = (
        _t(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"n_chars % {_X_MOD} AS x")
        .selectExpr(f"{rank_expr} AS pit_rank")
        .groupBy("pit_rank")
        .agg(F.count("*").cast("long").alias("n"))
    )
    hist = _q._persist_tracked(hist)
    k = _M + 1
    chi = hist.agg(
        F.sum("n").cast("long").alias("total"),
        F.sum(
            F.expr(f"({k} * n) * ({k} * n)")
        ).cast("long").alias("sq_kn"),
    ).selectExpr(
        "total",
        # sum((k*n_r - N)^2) = sum(k^2 n_r^2) - 2N*k*sum(n_r) + k*N^2
        #                    = sq_kn - 2*N*k*total/k... expand directly:
        f"CAST((2000000 * (sq_kn - 2 * {k} * total * total"
        f" + {k} * total * total) + {k} * total)"
        f" DIV (2 * {k} * total) AS BIGINT) AS chi2_micro",
    )
    return hist.crossJoin(F.broadcast(chi)).selectExpr(
        "pit_rank",
        "n",
        "total",
        "CAST((2000000 * n + total) DIV (2 * total) AS BIGINT)"
        " AS share_micro",
        "chi2_micro",
    )


def _pit_oracle() -> str:
    ms = _member_exprs(_h_sql)
    rank_expr = " + ".join(
        f"CASE WHEN ({m}) < x THEN 1 ELSE 0 END" for m in ms
    )
    k = _M + 1
    return f"""
WITH base AS (
  SELECT doc_id, n_chars % {_X_MOD} AS x FROM documents),
hist AS (
  SELECT {rank_expr} AS pit_rank, CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY 1),
chi AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         CAST((2000000 * (sum(({k} * n) * ({k} * n))
               - 2 * {k} * sum(n) * sum(n) + {k} * sum(n) * sum(n))
               + {k} * sum(n))
              // (2 * {k} * sum(n)) AS BIGINT) AS chi2_micro
  FROM hist)
SELECT h.pit_rank, h.n, c.total,
       CAST((2000000 * h.n + c.total) // (2 * c.total) AS BIGINT)
         AS share_micro,
       c.chi2_micro
FROM hist h CROSS JOIN chi c
"""


ORACLE_PIT_HISTOGRAM = _pit_oracle()


FORECAST_QUERIES = {
    "brier_decomposition": q_brier_decomposition,
    "crps_ensemble": q_crps_ensemble,
    "pinball_loss": q_pinball_loss,
    "interval_coverage": q_interval_coverage,
    "pit_histogram": q_pit_histogram,
}

FORECAST_ORACLES = {
    "brier_decomposition": ORACLE_BRIER_DECOMPOSITION,
    "crps_ensemble": ORACLE_CRPS_ENSEMBLE,
    "pinball_loss": ORACLE_PINBALL_LOSS,
    "interval_coverage": ORACLE_INTERVAL_COVERAGE,
    "pit_histogram": ORACLE_PIT_HISTOGRAM,
}

_q.QUERIES.update(FORECAST_QUERIES)
_q.ORACLES.update(FORECAST_ORACLES)
