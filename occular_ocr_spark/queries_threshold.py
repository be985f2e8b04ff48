"""Classifier-threshold evaluation catalog, round 4 (wave 58): five
operators grading a scalar score against a binary label — here the
house harness scores docs by ``n_chars`` against label
``lang = 'en'`` (the machinery is the product; the score/label pair
is the fixture) —

* ``roc_youden`` — ROC sweep over every distinct score threshold with
  Youden's J = TPR − FPR; emits the top-{_RY_TOP} operating points.
  All rates are half-up micro rationals from exact confusion counts.
* ``pr_auc`` — precision-recall AUC by the step (average-precision)
  interpolation Σ ΔTP·precision_i / P: with precision pre-quantized
  to micro per threshold, the sum is exact integers end-to-end.
* ``mcc_eval`` — Matthews correlation at the exact median-score
  threshold (selected from the value histogram): the numerator
  tp·tn − fp·fn and squared denominator are exact DECIMAL; the one
  sqrt runs on those exact integers and quantizes to micro (the ln
  convention).
* ``fbeta_sweep`` — F_β for β² ∈ {{¼, 1, 4}} at the score-quintile
  thresholds: Fβ = (1+β²)tp / ((1+β²)tp + β²·fn + fp), one half-up
  micro division per cell from exact counts (β² cleared by 4).
* ``lift_gains`` — decile lift & cumulative-gains table: rank docs by
  (score desc, doc_id), split into 10 equal-count buckets via the
  ntile identity on the two-level rank, and report per-decile
  positive rate, lift vs the base rate, and cumulative gains — exact
  integers.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_threshold_wave.py.

Cross-engine float policy: every confusion count, ΔTP, and rank is an
exact BIGINT; rates/F-scores/lifts are single half-up micro divisions
on those integers; ``mcc_eval``'s sqrt is the module's only libm call
and it runs on identical exact integers on both engines before one
micro quantization.

Scale notes: every sweep runs over the DISTINCT-SCORE-VALUE histogram
(one partial agg over the scan), so the ordered windows see frames of
#distinct-values rows — bounded by the score's value range, never the
corpus row count.  ``lift_gains`` ranks through the two-level
(histogram prefix-sum + within-value doc rank) decomposition, so no
global row window ever materializes; the decile assignment is a
map-side computation from broadcast bucket boundaries.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

_LBL_LANG = "en"
_RY_TOP = 5
_FB_BETA2_Q = (1, 4, 16)  # 4*beta^2 for beta in {1/2, 1, 2}
_LG_BUCKETS = 10


def _hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-score histogram with per-value positive/negative counts.

    Release-tracked persist: every entry reads the histogram at least
    twice (sweep + totals), and the frame is ≤#distinct-score rows, so
    caching it keeps each entry at ONE scan of the corpus.
    """
    return _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .select(
            F.col("n_chars").alias("score"),
            (F.col("lang") == _LBL_LANG).cast("bigint").alias("pos"),
        )
        .groupBy("score")
        .agg(
            F.sum("pos").alias("np"),
            F.sum(1 - F.col("pos")).alias("nn"),
        )
    )


_HIST_SQL = f"""
hist AS (
  SELECT n_chars AS score,
         sum(CASE WHEN lang = '{_LBL_LANG}' THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN lang = '{_LBL_LANG}' THEN 0 ELSE 1 END) AS nn
  FROM documents GROUP BY 1)
"""

_CONF_SQL = """
conf AS (
  SELECT score AS thr,
         sum(np) OVER w AS tp, sum(nn) OVER w AS fp,
         (SELECT sum(np) FROM hist) AS p,
         (SELECT sum(nn) FROM hist) AS n
  FROM hist WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING))
"""


def _conf(hist: DataFrame) -> DataFrame:
    """Cumulative confusion counts: predict positive ⇔ score >= thr."""
    wc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    totals = hist.agg(
        F.sum("np").alias("p"), F.sum("nn").alias("n")
    )
    return (
        hist.select(
            F.col("score").alias("thr"),
            F.sum("np").over(wc).alias("tp"),
            F.sum("nn").over(wc).alias("fp"),
        )
        .crossJoin(F.broadcast(totals))
    )


# ---------------------------------------------------------------------------
# roc_youden
# ---------------------------------------------------------------------------


def q_roc_youden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_RY_TOP} ROC operating points by Youden's J = TPR − FPR
    (ties → lower threshold first): per distinct threshold,
    tpr = tp/P and fpr = fp/N half-up micro-quantized, J as their
    difference.

    Scale: one scan partial-agg to the value histogram; the cumulative
    window orders only that ≤#distinct frame.
    """
    scored = _conf(_hist(spark, sf_dir)).selectExpr(
        "thr",
        "tp",
        "fp",
        "p - tp AS fn",
        "n - fp AS tn",
        "CAST((2000000 * tp + p) DIV (2 * p) AS BIGINT) AS tpr_micro",
        "CAST((2000000 * fp + n) DIV (2 * n) AS BIGINT) AS fpr_micro",
    )
    return (
        scored.withColumn(
            "j_micro", F.col("tpr_micro") - F.col("fpr_micro")
        )
        .orderBy(F.col("j_micro").desc(), "thr")
        .limit(_RY_TOP)
    )


ORACLE_ROC_YOUDEN = f"""
WITH {_HIST_SQL},
{_CONF_SQL},
scored AS (
  SELECT thr, tp, fp, p - tp AS fn, n - fp AS tn,
         CAST(CAST(2000000 * tp + p AS HUGEINT)
              // CAST(2 * p AS HUGEINT) AS BIGINT) AS tpr_micro,
         CAST(CAST(2000000 * fp + n AS HUGEINT)
              // CAST(2 * n AS HUGEINT) AS BIGINT) AS fpr_micro
  FROM conf)
SELECT CAST(thr AS BIGINT) AS thr, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       CAST(tn AS BIGINT) AS tn, tpr_micro, fpr_micro,
       tpr_micro - fpr_micro AS j_micro
FROM scored ORDER BY j_micro DESC, thr LIMIT {_RY_TOP}
"""


# ---------------------------------------------------------------------------
# pr_auc
# ---------------------------------------------------------------------------


def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-precision-style PR-AUC: Σ_t ΔTP_t·prec_micro_t / P with
    precision pre-quantized half-up to micro per threshold — the step
    interpolation, exact integers after the quantization point.  Also
    emits the base rate P/(P+N) (the random-classifier PR-AUC floor).

    Scale: same histogram collapse as roc_youden; one lag over the
    ≤#distinct frame.
    """
    conf = _conf(_hist(spark, sf_dir))
    wl = Window.orderBy(F.col("thr").desc())
    steps = conf.select(
        "thr",
        "tp",
        "p",
        "n",
        (F.col("tp") - F.coalesce(F.lag("tp").over(wl), F.lit(0))).alias(
            "dtp"
        ),
        F.expr(
            "CAST((2000000 * tp + (tp + fp)) DIV (2 * (tp + fp))"
            " AS BIGINT)"
        ).alias("prec_micro"),
    )
    return steps.groupBy().agg(
        F.max("p").cast("long").alias("n_pos"),
        F.max("n").cast("long").alias("n_neg"),
        F.expr(
            "CAST((2 * sum(dtp * prec_micro) + max(p))"
            " DIV (2 * max(p)) AS BIGINT)"
        ).alias("pr_auc_micro"),
        F.expr(
            "CAST((2000000 * max(p) + (max(p) + max(n)))"
            " DIV (2 * (max(p) + max(n))) AS BIGINT)"
        ).alias("base_rate_micro"),
    )


ORACLE_PR_AUC = f"""
WITH {_HIST_SQL},
{_CONF_SQL},
steps AS (
  SELECT tp, p, n,
         tp - coalesce(lag(tp) OVER (ORDER BY thr DESC), 0) AS dtp,
         CAST(CAST(2000000 * tp + (tp + fp) AS HUGEINT)
              // CAST(2 * (tp + fp) AS HUGEINT) AS BIGINT) AS prec_micro
  FROM conf)
SELECT CAST(max(p) AS BIGINT) AS n_pos, CAST(max(n) AS BIGINT) AS n_neg,
       CAST(CAST(2 * sum(dtp * prec_micro) + max(p) AS HUGEINT)
            // CAST(2 * max(p) AS HUGEINT) AS BIGINT) AS pr_auc_micro,
       CAST(CAST(2000000 * max(p) + (max(p) + max(n)) AS HUGEINT)
            // CAST(2 * (max(p) + max(n)) AS HUGEINT) AS BIGINT)
         AS base_rate_micro
FROM steps
"""


# ---------------------------------------------------------------------------
# mcc_eval
# ---------------------------------------------------------------------------


def q_mcc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCC at the exact median score (lowest value whose ≥-cumulative
    count covers half the corpus, from the value histogram —
    predict positive ⇔ score ≥ median): numerator tp·tn − fp·fn and
    squared denominator (tp+fp)(tp+fn)(tn+fp)(tn+fn) exact DECIMAL;
    mcc_micro = halfup-round(1e6·num/sqrt(den2)) — the module's one
    libm call, on identical integers both engines.

    Scale: histogram collapse + a 1-row threshold broadcast; the
    confusion counts are one conditional partial agg.
    """
    hist = _hist(spark, sf_dir)
    wc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    tot = hist.agg((F.sum("np") + F.sum("nn")).alias("nt"))
    med = (
        hist.select(
            "score",
            (F.sum(F.col("np") + F.col("nn")).over(wc)).alias("cum"),
        )
        .crossJoin(F.broadcast(tot))
        .where(F.expr("2 * cum >= nt"))
        .orderBy("score")
        .limit(1)
        .select(F.col("score").alias("thr"))
    )
    cells = (
        hist.crossJoin(F.broadcast(med))
        .selectExpr(
            "thr",
            "CASE WHEN score >= thr THEN np ELSE 0 END AS tp",
            "CASE WHEN score >= thr THEN nn ELSE 0 END AS fp",
            "CASE WHEN score < thr THEN np ELSE 0 END AS fn",
            "CASE WHEN score < thr THEN nn ELSE 0 END AS tn",
        )
        .groupBy("thr")
        .agg(
            F.sum("tp").cast("long").alias("tp"),
            F.sum("fp").cast("long").alias("fp"),
            F.sum("fn").cast("long").alias("fn"),
            F.sum("tn").cast("long").alias("tn"),
        )
    )
    return cells.selectExpr(
        "thr",
        "tp",
        "fp",
        "fn",
        "tn",
        "CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn"
        " AS mcc_num",
        "CAST(floor(1e6 * (CAST(tp AS DOUBLE) * tn"
        " - CAST(fp AS DOUBLE) * fn)"
        " / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)"
        " * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn))"
        " + 0.5) AS BIGINT) AS mcc_micro",
    )


ORACLE_MCC_EVAL = f"""
WITH {_HIST_SQL},
tot AS (SELECT sum(np) + sum(nn) AS nt FROM hist),
med AS (
  SELECT score AS thr FROM (
    SELECT score,
           sum(np + nn) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
             AS cum
    FROM hist), tot
  WHERE 2 * cum >= nt ORDER BY score LIMIT 1),
cells AS (
  SELECT m.thr,
         CAST(sum(CASE WHEN score >= m.thr THEN np ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(sum(CASE WHEN score >= m.thr THEN nn ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(sum(CASE WHEN score < m.thr THEN np ELSE 0 END)
              AS BIGINT) AS fn,
         CAST(sum(CASE WHEN score < m.thr THEN nn ELSE 0 END)
              AS BIGINT) AS tn
  FROM hist, med m GROUP BY m.thr)
SELECT CAST(thr AS BIGINT) AS thr, tp, fp, fn, tn,
       CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn
         AS mcc_num,
       CAST(floor(1e6 * (CAST(tp AS DOUBLE) * tn
            - CAST(fp AS DOUBLE) * fn)
            / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
            * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn))
            + 0.5) AS BIGINT) AS mcc_micro
FROM cells
"""


# ---------------------------------------------------------------------------
# fbeta_sweep
# ---------------------------------------------------------------------------


def q_fbeta_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F_β grid at the score-quintile thresholds (the exact lowest
    score whose ascending cumulative count reaches k/5 of the corpus,
    k = 1..4): for 4β² ∈ {_FB_BETA2_Q}, Fβ =
    (4+4β²)tp / ((4+4β²)tp + 4β²·fn + 4·fp) — the 4-scaling clears
    β = ½ to integers; one half-up micro division per cell.

    Scale: histogram + broadcast thresholds; confusion per threshold
    is a conditional partial agg over the histogram.
    """
    hist = _hist(spark, sf_dir)
    wc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    tot = hist.agg((F.sum("np") + F.sum("nn")).alias("nt"))
    cum = hist.select(
        "score",
        F.sum(F.col("np") + F.col("nn")).over(wc).alias("cum"),
    ).crossJoin(F.broadcast(tot))
    quints = (
        cum.crossJoin(
            F.broadcast(
                spark.range(1, 5).select(F.col("id").alias("k"))
            )
        )
        .where(F.expr("5 * cum >= k * nt"))
        .groupBy("k")
        .agg(F.min("score").alias("thr"))
    )
    conf = (
        hist.crossJoin(F.broadcast(quints))
        .selectExpr(
            "k",
            "thr",
            "CASE WHEN score >= thr THEN np ELSE 0 END AS tp",
            "CASE WHEN score >= thr THEN nn ELSE 0 END AS fp",
            "CASE WHEN score < thr THEN np ELSE 0 END AS fn",
        )
        .groupBy("k", "thr")
        .agg(
            F.sum("tp").cast("long").alias("tp"),
            F.sum("fp").cast("long").alias("fp"),
            F.sum("fn").cast("long").alias("fn"),
        )
    )
    b2 = spark.createDataFrame(
        [(q,) for q in _FB_BETA2_Q], "b2q long"
    )
    return (
        conf.crossJoin(F.broadcast(b2))
        .selectExpr(
            "k",
            "thr",
            "b2q",
            "tp",
            "fp",
            "fn",
            "CAST((2000000 * (4 + b2q) * tp"
            " + nullif((4 + b2q) * tp + b2q * fn + 4 * fp, 0))"
            " DIV nullif(2 * ((4 + b2q) * tp + b2q * fn + 4 * fp), 0)"
            " AS BIGINT) AS fbeta_micro",
        )
    )


ORACLE_FBETA_SWEEP = f"""
WITH {_HIST_SQL},
tot AS (SELECT sum(np) + sum(nn) AS nt FROM hist),
cum AS (
  SELECT score,
         sum(np + nn) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist),
quints AS (
  SELECT k, min(score) AS thr
  FROM cum, tot, (SELECT unnest(generate_series(1, 4)) AS k)
  WHERE 5 * cum >= k * nt GROUP BY k),
conf AS (
  SELECT q.k, q.thr,
         CAST(sum(CASE WHEN score >= q.thr THEN np ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(sum(CASE WHEN score >= q.thr THEN nn ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(sum(CASE WHEN score < q.thr THEN np ELSE 0 END)
              AS BIGINT) AS fn
  FROM hist, quints q GROUP BY 1, 2)
SELECT CAST(k AS BIGINT) AS k, CAST(thr AS BIGINT) AS thr, b2q,
       tp, fp, fn,
       CAST(CAST(2000000 * (4 + b2q) * tp
                 + nullif((4 + b2q) * tp + b2q * fn + 4 * fp, 0)
                 AS HUGEINT)
            // nullif(CAST(2 * ((4 + b2q) * tp + b2q * fn + 4 * fp)
                           AS HUGEINT), 0) AS BIGINT) AS fbeta_micro
FROM conf, (SELECT unnest([{", ".join(str(q) for q in _FB_BETA2_Q)}])
            AS b2q)
"""


# ---------------------------------------------------------------------------
# lift_gains
# ---------------------------------------------------------------------------


def q_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift & cumulative gains of the score ranking: global
    rank by (score desc, doc_id) through the two-level decomposition
    (histogram prefix-sum broadcast + within-value rank), decile =
    ceil(10·rank/N); per decile the positive count, rate, lift vs the
    base rate, and cumulative gains (share of all positives reached).

    Scale: the only ordered window runs over the ≤#distinct histogram;
    per-row rank is a map-side add against broadcast offsets; the
    decile agg is 10-key partial.
    """
    docs = _q._persist_tracked(
        _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.col("n_chars").alias("score"),
            (F.col("lang") == _LBL_LANG).cast("bigint").alias("pos"),
        )
    )
    hist = docs.groupBy("score").agg(F.count("*").alias("c"))
    wh = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = hist.select(
        "score",
        F.coalesce(F.sum("c").over(wh), F.lit(0)).alias("off"),
    )
    tot = docs.agg(
        F.count("*").alias("nt"), F.sum("pos").alias("p")
    )
    ww = Window.partitionBy("score").orderBy("doc_id")
    ranked = (
        docs.join(F.broadcast(offs), "score")
        .withColumn("r", F.col("off") + F.row_number().over(ww))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "pos",
            "nt",
            "p",
            f"CAST(({_LG_BUCKETS} * r + nt - 1) DIV nt AS INT) AS decile",
        )
    )
    wd = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per = (
        ranked.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.max("nt").alias("nt"),
            F.max("p").alias("p"),
        )
    )
    return per.select(
        "decile",
        "n",
        "n_pos",
        F.expr(
            "CAST((2000000 * n_pos + n) DIV (2 * n) AS BIGINT)"
        ).alias("rate_micro"),
        F.expr(
            "CAST((2000000 * n_pos * nt + n * p) DIV (2 * n * p)"
            " AS BIGINT)"
        ).alias("lift_micro"),
        F.expr(
            "CAST((2000000 * sum(n_pos) OVER (ORDER BY decile"
            " ROWS UNBOUNDED PRECEDING) + p) DIV (2 * p) AS BIGINT)"
        ).alias("cum_gains_micro"),
    )


ORACLE_LIFT_GAINS = f"""
WITH docs AS (
  SELECT doc_id, n_chars AS score,
         CASE WHEN lang = '{_LBL_LANG}' THEN 1 ELSE 0 END AS pos
  FROM documents),
hist AS (SELECT score, count(*) AS c FROM docs GROUP BY score),
offs AS (
  SELECT score,
         coalesce(sum(c) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off
  FROM hist),
tot AS (SELECT count(*) AS nt, sum(pos) AS p FROM docs),
ranked AS (
  SELECT d.pos, t.nt, t.p,
         CAST(({_LG_BUCKETS} * (o.off + row_number()
               OVER (PARTITION BY d.score ORDER BY d.doc_id))
               + t.nt - 1) // t.nt AS INT) AS decile
  FROM docs d JOIN offs o USING (score), tot t),
per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         max(nt) AS nt, max(p) AS p
  FROM ranked GROUP BY decile)
SELECT decile, n, n_pos,
       CAST(CAST(2000000 * n_pos + n AS HUGEINT)
            // CAST(2 * n AS HUGEINT) AS BIGINT) AS rate_micro,
       CAST(CAST(2000000 * n_pos * nt + n * p AS HUGEINT)
            // CAST(2 * n * p AS HUGEINT) AS BIGINT) AS lift_micro,
       CAST(CAST(2000000 * sum(n_pos) OVER (ORDER BY decile
            ROWS UNBOUNDED PRECEDING) + p AS HUGEINT)
            // CAST(2 * p AS HUGEINT) AS BIGINT) AS cum_gains_micro
FROM per
"""


THRESHOLD_QUERIES = {
    "roc_youden": q_roc_youden,
    "pr_auc": q_pr_auc,
    "mcc_eval": q_mcc_eval,
    "fbeta_sweep": q_fbeta_sweep,
    "lift_gains": q_lift_gains,
}

THRESHOLD_ORACLES = {
    "roc_youden": ORACLE_ROC_YOUDEN,
    "pr_auc": ORACLE_PR_AUC,
    "mcc_eval": ORACLE_MCC_EVAL,
    "fbeta_sweep": ORACLE_FBETA_SWEEP,
    "lift_gains": ORACLE_LIFT_GAINS,
}

_q.QUERIES.update(THRESHOLD_QUERIES)
_q.ORACLES.update(THRESHOLD_ORACLES)
