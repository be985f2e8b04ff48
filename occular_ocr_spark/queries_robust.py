"""Robust-statistics & extreme-value catalog, round 4 (wave 42):
five operators spanning the distribution-free ANOVA, variance-
homogeneity, trend-in-proportions, extreme-value, and long-memory
surfaces —

* ``kruskal_wallis`` — the Kruskal–Wallis rank ANOVA of doc length
  across ALL sources (the k-group generalization of
  ``mannwhitney_u``): midranks via the exact value-histogram
  TWICE-RANK integer trick, per-source rank sums as exact BIGINTs,
  tie-corrected H, and the ε² effect size.  Completes the
  location-test family (``welch_ttest`` 2-group parametric,
  ``anova_f_source`` k-group parametric, ``mannwhitney_u`` 2-group
  rank).
* ``brown_forsythe`` — the Brown–Forsythe (median-centered Levene)
  variance-homogeneity test: per-source LOWER MEDIAN from the
  per-source value histogram, absolute deviations folded back ONTO
  the histogram (never per-row), one-way F on the deviations.  The
  "can I even pool these sources" companion to ``anova_f_source``.
* ``cochran_armitage`` — Cochran–Armitage trend-in-proportions test
  of en-share across ordered ``n_chars`` width buckets with integer
  scores: the scaled statistic N·Σsᵢeᵢ − E·Σsᵢnᵢ stays an exact
  BIGINT and z is one row-local expression on five integer sums.
  The ordered-alternative sharpening of ``chi_square_independence``.
* ``gumbel_maxima`` — extreme-value analysis of the event stream:
  weekly block maxima of the daily counts (epoch-anchored integer
  week index — no engine week-truncation semantics), method-of-
  moments Gumbel fit (β = s·√6/π, μ = m̄ − γβ), and the 4-block
  return level μ − β·ln(−ln(3/4)).  "How bad is a bad week" — the
  capacity-planning companion to ``weekday_seasonality``.
* ``hurst_rs`` — rescaled-range (R/S) Hurst exponent of the daily
  event-count series at block sizes 5 and 10: within each block the
  cumulative-deviation range is the EXACT integer s·p_t − t·S, per-
  block R/S is micro-quantized before the cross-block mean, and
  H = (ln R̄S₁₀ − ln R̄S₅)/ln 2.  H≈0.5 random walk, H>0.5 persistent
  — the long-memory companion to ``autocorr_daily`` / ``runs_test``.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_robust_wave.py.

Cross-engine float policy (the corr_matrix / zipf_fit doctrine):
every aggregate feeding libm is an exact BIGINT (twice-ranks, tie
cubes, histogram masses, block prefix deviations); per-GROUP terms
that must cross a second aggregation (Kruskal–Wallis h_j,
Brown–Forsythe num_j/den_j, per-block R/S) are micro-quantized to
integer units BEFORE that sum so accumulation order cannot matter;
final statistics are row-local IEEE expressions evaluated on
identical integers by both engines.  BIGINT headroom: N³ terms
(tie corrections) and N·Σsᵢeᵢ products cap the exact range at
~10⁶ rows per the mannwhitney_u note; at the 10¹²-row extreme swap
those sums to DECIMAL(38,0) (the ols_fit note).

Scale notes: ``kruskal_wallis`` / ``brown_forsythe`` windows run over
the VALUE HISTOGRAM (bounded by max doc length × #sources, never
corpus rows); ``cochran_armitage`` is two partial aggs onto a ≤6-row
bucket frame; ``gumbel_maxima`` / ``hurst_rs`` post-aggregation
frames are the #days daily series (the documented bounded-global-
window exception) with block windows of ≤10 rows.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the hypothesis-test family
(``mannwhitney_u``, ``welch_ttest``, ``anova_f_source``,
``chi_square_independence``) and the time-series family
(``autocorr_daily``, ``mann_kendall``, ``runs_test``, ``theil_sen``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# Cochran–Armitage length-bucket width and cap.
_CA_W = 100
_CA_K = 6

# Hurst R/S block sizes (the 30-day fixture gives 6 and 3 full blocks).
_RS_SMALL = 5
_RS_LARGE = 10


# ---------------------------------------------------------------------------
# kruskal_wallis — tie-corrected rank ANOVA of n_chars across sources
# ---------------------------------------------------------------------------


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across sources over doc length.

    Midranks come from the exact value histogram (twice-rank trick:
    2·midrank = 2c + t + 1 is always an integer), so each source's
    doubled rank sum r2_j is an exact BIGINT.  The per-source term
    h_j = 12·R_j²/(n_j·N·(N+1)) = 3·r2_j²/(n_j·N·(N+1)) is micro-
    quantized BEFORE the cross-source sum; H subtracts 3(N+1) and
    divides by the tie correction 1 − Σ(t³−t)/(N³−N).  ε² effect
    size = (H − k + 1)/(N − k).

    Scale: one (source, value) partial agg, one value-histogram
    cumulative window (bounded by max doc length), a k-row term
    frame, one 1-row reduce.
    """
    docs = _t(spark, sf_dir, "documents").select(
        F.coalesce("source", F.lit("")).alias("g"),
        F.col("n_chars").alias("v"),
    )
    svh = docs.groupBy("g", "v").agg(
        F.count("*").cast("bigint").alias("m")
    )
    vh = svh.groupBy("v").agg(F.sum("m").cast("bigint").alias("t"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    vr = vh.withColumn(
        "c", F.coalesce(F.sum("t").over(wc), F.lit(0)).cast("bigint")
    )
    per = (
        svh.join(vr, "v")
        .groupBy("g")
        .agg(
            F.sum(F.expr("m * (2 * c + t + 1)")).cast("bigint").alias("r2"),
            F.sum("m").cast("bigint").alias("n_g"),
        )
    )
    tot = vr.groupBy().agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.expr("t * t * t - t")).cast("bigint").alias("ties3"),
    )
    terms = per.crossJoin(F.broadcast(tot)).select(
        F.expr(
            """
            CAST(floor(3.0 * CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
              / n_g / CAST(n AS DOUBLE) / (n + 1) * 1e6 + 0.5) AS BIGINT)
            """
        ).alias("h_j"),
        "n",
        "ties3",
    )
    agg = terms.groupBy().agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("h_j").cast("bigint").alias("sum_h"),
        F.max("n").cast("bigint").alias("n"),
        F.max("ties3").cast("bigint").alias("ties3"),
    )
    return agg.select(
        "n_groups",
        "n",
        F.expr(
            """
            CASE WHEN n_groups < 2 OR n < 3
                   OR ties3 = n * n * n - n THEN 0.0 ELSE
              CAST(floor(
                (CAST(sum_h AS DOUBLE) / 1e6 - 3.0 * (n + 1))
                / (1.0 - CAST(ties3 AS DOUBLE)
                         / (CAST(n AS DOUBLE) * n * n - n)) * 1e6 + 0.5
              ) AS BIGINT) / 1e6
            END
            """
        ).alias("h"),
    ).select(
        "n_groups",
        "n",
        "h",
        F.expr(
            """
            CASE WHEN n <= n_groups THEN 0.0 ELSE
              CAST(floor((h - n_groups + 1) / (n - n_groups) * 1e6 + 0.5)
                AS BIGINT) / 1e6
            END
            """
        ).alias("epsilon_sq"),
    )


ORACLE_KRUSKAL_WALLIS = """
WITH svh AS (
  SELECT coalesce(source, '') AS g, n_chars AS v,
         CAST(count(*) AS BIGINT) AS m
  FROM documents GROUP BY 1, 2),
vh AS (SELECT v, CAST(sum(m) AS BIGINT) AS t FROM svh GROUP BY v),
vr AS (
  SELECT v, t,
         CAST(coalesce(sum(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS c
  FROM vh),
per AS (
  SELECT g, CAST(sum(m * (2 * c + t + 1)) AS BIGINT) AS r2,
         CAST(sum(m) AS BIGINT) AS n_g
  FROM svh JOIN vr USING (v) GROUP BY g),
tot AS (
  SELECT CAST(sum(t) AS BIGINT) AS n,
         CAST(sum(t * t * t - t) AS BIGINT) AS ties3
  FROM vr),
terms AS (
  SELECT CAST(floor(3.0 * CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
           / n_g / CAST(n AS DOUBLE) / (n + 1) * 1e6 + 0.5) AS BIGINT)
           AS h_j,
         n, ties3
  FROM per, tot),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(h_j) AS BIGINT) AS sum_h,
         CAST(max(n) AS BIGINT) AS n,
         CAST(max(ties3) AS BIGINT) AS ties3
  FROM terms),
mid AS (
  SELECT n_groups, n,
         CASE WHEN n_groups < 2 OR n < 3
                OR ties3 = n * n * n - n THEN 0.0 ELSE
           CAST(floor(
             (CAST(sum_h AS DOUBLE) / 1e6 - 3.0 * (n + 1))
             / (1.0 - CAST(ties3 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * n * n - n)) * 1e6 + 0.5
           ) AS BIGINT) / 1e6
         END AS h
  FROM agg)
SELECT n_groups, n, h,
       CASE WHEN n <= n_groups THEN 0.0 ELSE
         CAST(floor((h - n_groups + 1) / (n - n_groups) * 1e6 + 0.5)
           AS BIGINT) / 1e6
       END AS epsilon_sq
FROM mid
"""


# ---------------------------------------------------------------------------
# brown_forsythe — median-centered Levene variance-homogeneity test
# ---------------------------------------------------------------------------


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe F on |n_chars − source median| across sources.

    The per-source LOWER MEDIAN (rank (n_g+1) DIV 2 — an actual data
    value, so deviations stay exact integers) is picked from the
    per-source value histogram via one bounded cumulative window;
    deviations are folded onto that same histogram.  Per-source
    numerator n_g·(z̄_g − z̄)² and denominator Σz² − (Σz)²/n_g terms
    are micro-quantized before the cross-source sums; F is one
    row-local expression.

    Scale: one (source, value) partial agg, per-source cumulative
    windows over the bounded histogram, a k-row term frame, one
    1-row reduce.
    """
    svh = (
        _t(spark, sf_dir, "documents")
        .select(
            F.coalesce("source", F.lit("")).alias("g"),
            F.col("n_chars").alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count("*").cast("bigint").alias("m"))
    )
    wg = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.partitionBy("g")
    cum = svh.withColumn("cum", F.sum("m").over(wg).cast("bigint")).withColumn(
        "n_g", F.sum("m").over(wa).cast("bigint")
    )
    med = (
        cum.where(F.expr("cum >= (n_g + 1) DIV 2"))
        .groupBy("g")
        .agg(F.min("v").cast("bigint").alias("med"))
    )
    per = (
        svh.join(med, "g")
        .select(
            "g",
            "m",
            F.expr("abs(v - med)").cast("bigint").alias("z"),
        )
        .groupBy("g")
        .agg(
            F.sum("m").cast("bigint").alias("n_g"),
            F.sum(F.expr("m * z")).cast("bigint").alias("z1"),
            F.sum(F.expr("m * z * z")).cast("bigint").alias("z2"),
        )
    )
    tot = per.groupBy().agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("z1").cast("bigint").alias("zall"),
    )
    terms = per.crossJoin(F.broadcast(tot)).select(
        F.expr(
            """
            CAST(floor(
              (CAST(z1 AS DOUBLE) - CAST(n_g AS DOUBLE) * zall / n)
                * (CAST(z1 AS DOUBLE) - CAST(n_g AS DOUBLE) * zall / n)
                / n_g * 1e6 + 0.5) AS BIGINT)
            """
        ).alias("num_j"),
        F.expr(
            """
            CAST(floor(
              (CAST(z2 AS DOUBLE)
                 - CAST(z1 AS DOUBLE) * CAST(z1 AS DOUBLE) / n_g)
                * 1e6 + 0.5) AS BIGINT)
            """
        ).alias("den_j"),
        "n",
    )
    agg = terms.groupBy().agg(
        F.count("*").cast("bigint").alias("k_groups"),
        F.sum("num_j").cast("bigint").alias("num"),
        F.sum("den_j").cast("bigint").alias("den"),
        F.max("n").cast("bigint").alias("n"),
    )
    return agg.select(
        "n",
        "k_groups",
        F.expr(
            """
            CASE WHEN k_groups < 2 OR n <= k_groups OR den <= 0
              THEN 0.0 ELSE
              CAST(floor(
                CAST(n - k_groups AS DOUBLE) / (k_groups - 1)
                  * num / den * 1e6 + 0.5) AS BIGINT) / 1e6
            END
            """
        ).alias("f_stat"),
    )


ORACLE_BROWN_FORSYTHE = """
WITH svh AS (
  SELECT coalesce(source, '') AS g, n_chars AS v,
         CAST(count(*) AS BIGINT) AS m
  FROM documents GROUP BY 1, 2),
cum AS (
  SELECT g, v, m,
         CAST(sum(m) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum,
         CAST(sum(m) OVER (PARTITION BY g) AS BIGINT) AS n_g
  FROM svh),
med AS (
  SELECT g, CAST(min(v) AS BIGINT) AS med
  FROM cum WHERE cum >= (n_g + 1) // 2 GROUP BY g),
per AS (
  SELECT s.g, CAST(sum(m) AS BIGINT) AS n_g,
         CAST(sum(m * abs(v - med)) AS BIGINT) AS z1,
         CAST(sum(m * abs(v - med) * abs(v - med)) AS BIGINT) AS z2
  FROM svh s JOIN med USING (g) GROUP BY s.g),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(z1) AS BIGINT) AS zall
  FROM per),
terms AS (
  SELECT CAST(floor(
           (CAST(z1 AS DOUBLE) - CAST(n_g AS DOUBLE) * zall / n)
             * (CAST(z1 AS DOUBLE) - CAST(n_g AS DOUBLE) * zall / n)
             / n_g * 1e6 + 0.5) AS BIGINT) AS num_j,
         CAST(floor(
           (CAST(z2 AS DOUBLE)
              - CAST(z1 AS DOUBLE) * CAST(z1 AS DOUBLE) / n_g)
             * 1e6 + 0.5) AS BIGINT) AS den_j,
         n
  FROM per, tot),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_groups,
         CAST(sum(num_j) AS BIGINT) AS num,
         CAST(sum(den_j) AS BIGINT) AS den,
         CAST(max(n) AS BIGINT) AS n
  FROM terms)
SELECT n, k_groups,
       CASE WHEN k_groups < 2 OR n <= k_groups OR den <= 0
         THEN 0.0 ELSE
         CAST(floor(
           CAST(n - k_groups AS DOUBLE) / (k_groups - 1)
             * num / den * 1e6 + 0.5) AS BIGINT) / 1e6
       END AS f_stat
FROM agg
"""


# ---------------------------------------------------------------------------
# cochran_armitage — trend-in-proportions over ordered length buckets
# ---------------------------------------------------------------------------


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: is en-share monotone in length?

    Buckets are ``n_chars DIV _CA_W`` capped at ``_CA_K − 1`` with
    integer scores s = bucket index.  The scaled statistic
    t_scaled = N·Σs·e − E·Σs·n is an exact BIGINT and
    z = t_scaled·√N / √(E·(N−E)·(N·Σs²n − (Σsn)²)) is one row-local
    expression on five exact integer sums.

    Scale: one partial agg onto the ≤``_CA_K``-row bucket frame, one
    1-row reduce; no windows, no joins.
    """
    b = (
        _t(spark, sf_dir, "documents")
        .select(
            F.expr(f"least(n_chars DIV {_CA_W}, {_CA_K - 1})").alias("s"),
            (F.col("lang") == "en").cast("bigint").alias("is_en"),
        )
        .groupBy("s")
        .agg(
            F.count("*").cast("bigint").alias("n_i"),
            F.sum("is_en").cast("bigint").alias("e_i"),
        )
    )
    agg = b.groupBy().agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("e_i").cast("bigint").alias("e"),
        F.sum(F.expr("s * e_i")).cast("bigint").alias("sse"),
        F.sum(F.expr("s * n_i")).cast("bigint").alias("ssn"),
        F.sum(F.expr("s * s * n_i")).cast("bigint").alias("ss2n"),
    )
    return agg.select(
        "n",
        F.col("e").alias("n_en"),
        "n_buckets",
        F.expr("n * sse - e * ssn").cast("bigint").alias("t_scaled"),
        F.expr(
            """
            CASE WHEN e = 0 OR e = n OR n * ss2n - ssn * ssn <= 0
              THEN 0.0 ELSE
              CAST(floor(
                CAST(n * sse - e * ssn AS DOUBLE)
                  * sqrt(CAST(n AS DOUBLE))
                / sqrt(CAST(e AS DOUBLE) * (n - e)
                       * (CAST(n AS DOUBLE) * ss2n
                          - CAST(ssn AS DOUBLE) * ssn)) * 1e6 + 0.5
              ) AS BIGINT) / 1e6
            END
            """
        ).alias("z"),
    )


ORACLE_COCHRAN_ARMITAGE = f"""
WITH b AS (
  SELECT least(n_chars // {_CA_W}, {_CA_K - 1}) AS s,
         CAST(count(*) AS BIGINT) AS n_i,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS e_i
  FROM documents GROUP BY 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(n_i) AS BIGINT) AS n,
         CAST(sum(e_i) AS BIGINT) AS e,
         CAST(sum(s * e_i) AS BIGINT) AS sse,
         CAST(sum(s * n_i) AS BIGINT) AS ssn,
         CAST(sum(s * s * n_i) AS BIGINT) AS ss2n
  FROM b)
SELECT n, e AS n_en, n_buckets,
       CAST(n * sse - e * ssn AS BIGINT) AS t_scaled,
       CASE WHEN e = 0 OR e = n OR n * ss2n - ssn * ssn <= 0
         THEN 0.0 ELSE
         CAST(floor(
           CAST(n * sse - e * ssn AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
           / sqrt(CAST(e AS DOUBLE) * (n - e)
                  * (CAST(n AS DOUBLE) * ss2n
                     - CAST(ssn AS DOUBLE) * ssn)) * 1e6 + 0.5
         ) AS BIGINT) / 1e6
       END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# gumbel_maxima — weekly block maxima + method-of-moments Gumbel fit
# ---------------------------------------------------------------------------


def q_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel fit of weekly block maxima of the daily event counts.

    Week index is the epoch-anchored integer
    datediff(d, 1970-01-05) DIV 7 (a Monday anchor; pure integer
    arithmetic, so no engine week-truncation semantics).  Method of
    moments on the W weekly maxima: β = s·√6/π, μ = m̄ − γ·β
    (γ = 0.5772156649015329), 4-block return level
    μ − β·ln(−ln(3/4)).  All moments are exact BIGINTs; β/μ/level
    are row-local IEEE on one row.

    Scale: daily partial agg, weekly max partial agg, one 1-row
    reduce — the series frames are #days and #weeks.
    """
    weekly = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("y"))
        .groupBy(
            F.expr("datediff(d, DATE'1970-01-05') DIV 7").alias("wk")
        )
        .agg(F.max("y").cast("bigint").alias("mx"))
    )
    agg = weekly.groupBy().agg(
        F.count("*").cast("bigint").alias("n_weeks"),
        F.sum("mx").cast("bigint").alias("s1"),
        F.sum(F.expr("mx * mx")).cast("bigint").alias("s2"),
        F.max("mx").cast("bigint").alias("max_weekly"),
    )
    mid = agg.select(
        "n_weeks",
        "max_weekly",
        F.expr(
            """
            CASE WHEN n_weeks < 2 THEN 0.0 ELSE
              sqrt(CAST(n_weeks * s2 - s1 * s1 AS DOUBLE)
                   / (CAST(n_weeks AS DOUBLE) * (n_weeks - 1)))
                * sqrt(6.0) / pi()
            END
            """
        ).alias("b_raw"),
        F.expr("CAST(s1 AS DOUBLE) / n_weeks").alias("m_raw"),
    )
    return mid.select(
        "n_weeks",
        "max_weekly",
        F.expr(
            "CAST(floor((m_raw - 0.5772156649015329 * b_raw) * 1e6 + 0.5)"
            " AS BIGINT) / 1e6"
        ).alias("mu"),
        F.expr(
            "CAST(floor(b_raw * 1e6 + 0.5) AS BIGINT) / 1e6"
        ).alias("beta"),
        F.expr(
            """
            CAST(floor((m_raw - 0.5772156649015329 * b_raw
              - b_raw * ln(-ln(0.75))) * 1e6 + 0.5) AS BIGINT) / 1e6
            """
        ).alias("return_level_4"),
    )


ORACLE_GUMBEL_MAXIMA = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
weekly AS (
  SELECT date_diff('day', DATE '1970-01-05', d) // 7 AS wk,
         CAST(max(y) AS BIGINT) AS mx
  FROM daily GROUP BY 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_weeks,
         CAST(sum(mx) AS BIGINT) AS s1,
         CAST(sum(mx * mx) AS BIGINT) AS s2,
         CAST(max(mx) AS BIGINT) AS max_weekly
  FROM weekly),
mid AS (
  SELECT n_weeks, max_weekly,
         CASE WHEN n_weeks < 2 THEN 0.0 ELSE
           sqrt(CAST(n_weeks * s2 - s1 * s1 AS DOUBLE)
                / (CAST(n_weeks AS DOUBLE) * (n_weeks - 1)))
             * sqrt(6.0) / pi()
         END AS b_raw,
         CAST(s1 AS DOUBLE) / n_weeks AS m_raw
  FROM agg)
SELECT n_weeks, max_weekly,
       CAST(floor((m_raw - 0.5772156649015329 * b_raw) * 1e6 + 0.5)
         AS BIGINT) / 1e6 AS mu,
       CAST(floor(b_raw * 1e6 + 0.5) AS BIGINT) / 1e6 AS beta,
       CAST(floor((m_raw - 0.5772156649015329 * b_raw
         - b_raw * ln(-ln(0.75))) * 1e6 + 0.5) AS BIGINT) / 1e6
         AS return_level_4
FROM mid
"""


# ---------------------------------------------------------------------------
# hurst_rs — rescaled-range Hurst exponent of the daily series
# ---------------------------------------------------------------------------


def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R/S Hurst exponent at block sizes ``_RS_SMALL``/``_RS_LARGE``.

    Within a block of size s the cumulative deviation at position t
    is Z_t = Σ(y_u − m̄); s·Z_t = s·p_t − t·S is an EXACT BIGINT
    (p_t block prefix sum, S block total), so the range R·s =
    max − min is exact and R/S = (max − min)/√(s·ΣY² − S²).
    Per-block R/S is micro-quantized before the per-size mean
    (round-half-up integer division); H = (ln R̄S_L − ln R̄S_S)/ln 2
    on the two rounded means.  Partial tail blocks and zero-variance
    blocks are dropped.

    Scale: the corpus pass is the daily partial agg; the day-index
    row_number is the documented bounded-global-window exception
    (#days rows); block windows hold ≤``_RS_LARGE`` rows.
    """
    daily = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    wi = Window.orderBy("d")
    idx = daily.withColumn(
        "i", (F.row_number().over(wi) - 1).cast("bigint")
    )
    sized = idx.select(
        F.explode(
            F.array(F.lit(_RS_SMALL), F.lit(_RS_LARGE))
        ).alias("sz"),
        "i",
        "y",
    ).select(
        "sz",
        F.expr("i DIV sz").alias("blk"),
        F.expr("i % sz + 1").alias("t"),
        "y",
    )
    wp = (
        Window.partitionBy("sz", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wb = Window.partitionBy("sz", "blk")
    dev = (
        sized.withColumn("p", F.sum("y").over(wp).cast("bigint"))
        .withColumn("stot", F.sum("y").over(wb).cast("bigint"))
        .withColumn("s2tot", F.sum(F.expr("y * y")).over(wb).cast("bigint"))
        .withColumn("cnt", F.count("*").over(wb).cast("bigint"))
        .withColumn("z", F.expr("sz * p - t * stot").cast("bigint"))
    )
    blocks = (
        dev.groupBy("sz", "blk")
        .agg(
            F.max("z").cast("bigint").alias("zmax"),
            F.min("z").cast("bigint").alias("zmin"),
            F.max("stot").cast("bigint").alias("stot"),
            F.max("s2tot").cast("bigint").alias("s2tot"),
            F.max("cnt").cast("bigint").alias("cnt"),
        )
        .where(F.expr("cnt = sz AND sz * s2tot - stot * stot > 0"))
        .select(
            "sz",
            F.expr(
                """
                CAST(floor(CAST(zmax - zmin AS DOUBLE)
                  / sqrt(CAST(sz * s2tot - stot * stot AS DOUBLE))
                  * 1e6 + 0.5) AS BIGINT)
                """
            ).alias("rs"),
        )
    )
    per = blocks.groupBy("sz").agg(
        F.count("*").cast("bigint").alias("nb"),
        F.sum("rs").cast("bigint").alias("rs_sum"),
    )
    one = per.groupBy().agg(
        F.max(F.expr(f"CASE WHEN sz = {_RS_SMALL} THEN nb END"))
        .cast("bigint")
        .alias("nb_small"),
        F.max(F.expr(f"CASE WHEN sz = {_RS_LARGE} THEN nb END"))
        .cast("bigint")
        .alias("nb_large"),
        F.max(
            F.expr(
                f"CASE WHEN sz = {_RS_SMALL} THEN"
                " (2 * rs_sum + nb) DIV (2 * nb) END"
            )
        )
        .cast("bigint")
        .alias("rs_small_u"),
        F.max(
            F.expr(
                f"CASE WHEN sz = {_RS_LARGE} THEN"
                " (2 * rs_sum + nb) DIV (2 * nb) END"
            )
        )
        .cast("bigint")
        .alias("rs_large_u"),
    )
    return one.select(
        F.coalesce("nb_small", F.lit(0)).alias("n_blocks_small"),
        F.coalesce("nb_large", F.lit(0)).alias("n_blocks_large"),
        F.expr("coalesce(rs_small_u, 0) / 1e6").alias("rs_small"),
        F.expr("coalesce(rs_large_u, 0) / 1e6").alias("rs_large"),
        F.expr(
            """
            CASE WHEN coalesce(rs_small_u, 0) <= 0
                   OR coalesce(rs_large_u, 0) <= 0 THEN 0.0 ELSE
              CAST(floor(
                (ln(CAST(rs_large_u AS DOUBLE) / 1e6)
                   - ln(CAST(rs_small_u AS DOUBLE) / 1e6))
                / ln(2.0) * 1e6 + 0.5) AS BIGINT) / 1e6
            END
            """
        ).alias("hurst"),
    )


ORACLE_HURST_RS = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
idx AS (
  SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i, y
  FROM daily),
sized AS (
  SELECT sz, i // sz AS blk, i % sz + 1 AS t, y
  FROM idx CROSS JOIN (VALUES ({_RS_SMALL}), ({_RS_LARGE})) sizes(sz)),
dev AS (
  SELECT sz, blk, t, y,
         CAST(sum(y) OVER (PARTITION BY sz, blk ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS p,
         CAST(sum(y) OVER (PARTITION BY sz, blk) AS BIGINT) AS stot,
         CAST(sum(y * y) OVER (PARTITION BY sz, blk) AS BIGINT) AS s2tot,
         CAST(count(*) OVER (PARTITION BY sz, blk) AS BIGINT) AS cnt
  FROM sized),
blocks AS (
  SELECT sz,
         CAST(floor(CAST(max(sz * p - t * stot) - min(sz * p - t * stot)
             AS DOUBLE)
           / sqrt(CAST(max(sz * s2tot - stot * stot) AS DOUBLE))
           * 1e6 + 0.5) AS BIGINT) AS rs
  FROM dev
  GROUP BY sz, blk
  HAVING max(cnt) = sz AND max(sz * s2tot - stot * stot) > 0),
per AS (
  SELECT sz, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(rs) AS BIGINT) AS rs_sum
  FROM blocks GROUP BY sz),
one AS (
  SELECT CAST(max(CASE WHEN sz = {_RS_SMALL} THEN nb END) AS BIGINT)
           AS nb_small,
         CAST(max(CASE WHEN sz = {_RS_LARGE} THEN nb END) AS BIGINT)
           AS nb_large,
         CAST(max(CASE WHEN sz = {_RS_SMALL} THEN
             (2 * rs_sum + nb) // (2 * nb) END) AS BIGINT) AS rs_small_u,
         CAST(max(CASE WHEN sz = {_RS_LARGE} THEN
             (2 * rs_sum + nb) // (2 * nb) END) AS BIGINT) AS rs_large_u
  FROM per)
SELECT coalesce(nb_small, 0) AS n_blocks_small,
       coalesce(nb_large, 0) AS n_blocks_large,
       coalesce(rs_small_u, 0) / 1e6 AS rs_small,
       coalesce(rs_large_u, 0) / 1e6 AS rs_large,
       CASE WHEN coalesce(rs_small_u, 0) <= 0
              OR coalesce(rs_large_u, 0) <= 0 THEN 0.0 ELSE
         CAST(floor(
           (ln(CAST(rs_large_u AS DOUBLE) / 1e6)
              - ln(CAST(rs_small_u AS DOUBLE) / 1e6))
           / ln(2.0) * 1e6 + 0.5) AS BIGINT) / 1e6
       END AS hurst
FROM one
"""


ROBUST_QUERIES = {
    "kruskal_wallis": q_kruskal_wallis,
    "brown_forsythe": q_brown_forsythe,
    "cochran_armitage": q_cochran_armitage,
    "gumbel_maxima": q_gumbel_maxima,
    "hurst_rs": q_hurst_rs,
}

ROBUST_ORACLES = {
    "kruskal_wallis": ORACLE_KRUSKAL_WALLIS,
    "brown_forsythe": ORACLE_BROWN_FORSYTHE,
    "cochran_armitage": ORACLE_COCHRAN_ARMITAGE,
    "gumbel_maxima": ORACLE_GUMBEL_MAXIMA,
    "hurst_rs": ORACLE_HURST_RS,
}

_q.QUERIES.update(ROBUST_QUERIES)
_q.ORACLES.update(ROBUST_ORACLES)
