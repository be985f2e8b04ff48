"""Distribution-distance & robust-estimation catalog, round 4
(wave 47): five operators spanning the optimal-transport, empirical-
Bayes, trie-structure, robust-location, and goodness-of-fit
surfaces —

* ``wasserstein_1d`` — the exact 1-D earth-mover (W₁) distance
  between the en and non-en ``n_chars`` distributions:
  W₁ = ∫|F_A − F_B| dx collapses on the value histogram to
  Σ |cumA·n_B − cumB·n_A|·Δv / (n_A·n_B) — PURE BIGINT arithmetic
  until one final division.  Sees magnitude of separation where
  ``ks_statistic`` sees only the max gap and ``psi_drift`` needs
  bins.
* ``eb_shrinkage`` — empirical-Bayes (Beta method-of-moments)
  shrinkage of per-source en-rates: the prior (α, β) comes from the
  across-source rate moments (micro-quantized per source before the
  k-row sums), and each source's posterior mean (e+α)/(n+α+β) pulls
  small strata toward the grand rate.  The James-Stein companion to
  ``wilson_intervals``.
* ``prefix_tree_stats`` — vocabulary trie profile at depths
  1..``_PT_D``: distinct prefixes, covered types, exact-end counts,
  and per-depth fan-out ratio (a bounded lag window over the depth
  frame).  The tokenizer-design companion to ``bpe_merges`` /
  ``vocab_encode`` — branching collapse says where merges stop
  paying.
* ``trimmed_stats`` — 10%-trimmed and winsorized means of
  ``n_chars`` computed EXACTLY from the value histogram: per-value
  kept-mass is an integer interval overlap with the rank window
  [⌊0.1n⌋+1, n−⌊0.1n⌋], so both robust means are exact rationals.
  The robust-location companion to ``daily_anomaly_mad`` (spread)
  and ``theil_sen`` (slope).
* ``cvm_expfit`` — the Cramér–von Mises W² statistic of the per-user
  inter-arrival deltas against their fitted exponential: the
  tie-safe per-value decomposition uses Σ(2i−1) = m(2c+m) and
  Σ(2i−1)² = g(c+m)−g(c) with g(k) = k(4k²−1)/3 — exact integers —
  and per-value terms are micro-quantized before the sum.  The
  quadratic-norm companion to ``interarrival_expfit``'s sup-norm KS.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_distshape_wave.py.

Cross-engine float policy (the corr_matrix / zipf_fit doctrine):
``wasserstein_1d`` and ``trimmed_stats`` are integer-exact end to
end; ``eb_shrinkage`` rates and ``cvm_expfit`` terms are micro-
quantized BEFORE their cross-row sums; remaining statistics are
row-local IEEE on exact integers.  BIGINT headroom: cum·n products
and g(k) ~ (4/3)k³ cap exact arithmetic near ~10⁶ observations (the
mannwhitney_u note; DECIMAL(38,0) past that).

Scale notes: every cumulative here runs over a bounded VALUE
HISTOGRAM (n_chars values / µs-delta histogram bucketed by the
``interarrival_expfit`` two-level scheme) or a ≤``_PT_D``-row depth
frame; ``eb_shrinkage`` is one per-source agg + a 1-row prior
broadcast back.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# prefix-tree max depth
_PT_D = 8

# trimmed-stats trim fraction numerator (10%)
_TS_PCT = 10

# cvm two-level bucket width (10 s of microseconds)
_CVM_BUCKET = 10_000_000


# ---------------------------------------------------------------------------
# wasserstein_1d — exact W1 between en and non-en length distributions
# ---------------------------------------------------------------------------


def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein distance, en vs non-en doc length.

    On the merged value histogram, W₁·n_A·n_B =
    Σ_v |cumA(v)·n_B − cumB(v)·n_A| · (next(v) − v) — every term an
    exact BIGINT; the single division at the end is micro-rounded.

    Scale: one value-histogram partial agg, one bounded cumulative +
    lead window over it, one 1-row reduce.
    """
    hist = (
        _t(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum((F.col("lang") == "en").cast("bigint"))
            .cast("bigint")
            .alias("ca"),
            F.sum((F.col("lang") != "en").cast("bigint"))
            .cast("bigint")
            .alias("cb"),
        )
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("v")
    cum = (
        hist.withColumn("cuma", F.sum("ca").over(wc).cast("bigint"))
        .withColumn("cumb", F.sum("cb").over(wc).cast("bigint"))
        .withColumn("na", F.sum("ca").over(Window.partitionBy()).cast("bigint"))
        .withColumn("nb", F.sum("cb").over(Window.partitionBy()).cast("bigint"))
        .withColumn("gap", (F.lead("v").over(wl) - F.col("v")).cast("bigint"))
    )
    agg = cum.where(F.col("gap").isNotNull()).groupBy().agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.sum(F.expr("abs(cuma * nb - cumb * na) * gap"))
        .cast("bigint")
        .alias("w1_scaled"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "w1_scaled",
        F.expr(
            """
            CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0 ELSE
              CAST(floor(CAST(w1_scaled AS DOUBLE)
                / (CAST(n_a AS DOUBLE) * n_b) * 1e6 + 0.5) AS BIGINT)
                / 1e6
            END
            """
        ).alias("w1"),
    )


ORACLE_WASSERSTEIN_1D = """
WITH hist AS (
  SELECT n_chars AS v,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
           AS cb
  FROM documents GROUP BY 1),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cumb,
         CAST(sum(ca) OVER () AS BIGINT) AS na,
         CAST(sum(cb) OVER () AS BIGINT) AS nb,
         CAST(lead(v) OVER (ORDER BY v) - v AS BIGINT) AS gap
  FROM hist),
agg AS (
  SELECT CAST(max(na) AS BIGINT) AS n_a,
         CAST(max(nb) AS BIGINT) AS n_b,
         CAST(sum(abs(cuma * nb - cumb * na) * gap) AS BIGINT)
           AS w1_scaled
  FROM cum WHERE gap IS NOT NULL)
SELECT n_a, n_b, w1_scaled,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0 ELSE
         CAST(floor(CAST(w1_scaled AS DOUBLE)
           / (CAST(n_a AS DOUBLE) * n_b) * 1e6 + 0.5) AS BIGINT) / 1e6
       END AS w1
FROM agg
"""


# ---------------------------------------------------------------------------
# eb_shrinkage — Beta-MoM empirical-Bayes shrinkage of en rates
# ---------------------------------------------------------------------------


def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source en-rate shrinkage under a Beta MoM prior.

    Rates micro-quantize per source before the k-row moment sums;
    prior mass M = m(1−m)/v − 1 (α = m·M) comes from the
    across-source sample variance; shrunk = (e + α)/(n + M).  A
    degenerate prior (v ≤ 0 or M ≤ 0) falls back to zero shrinkage
    (shrunk = raw), documented.

    Scale: one per-source agg (k rows), one 1-row prior broadcast
    back onto the k rows.
    """
    per = (
        _t(spark, sf_dir, "documents")
        .groupBy(F.coalesce("source", F.lit("")).alias("source"))
        .agg(
            F.count("*").cast("bigint").alias("n_s"),
            F.sum((F.col("lang") == "en").cast("bigint"))
            .cast("bigint")
            .alias("e_s"),
        )
        .withColumn(
            "rq",
            F.expr(
                "CAST(floor(CAST(e_s AS DOUBLE) / n_s * 1e6 + 0.5)"
                " AS BIGINT)"
            ),
        )
    )
    prior = per.groupBy().agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("rq").cast("bigint").alias("s1"),
        F.sum(F.expr("rq * rq")).cast("bigint").alias("s2"),
    )
    mraw = (
        "(CAST(s1 AS DOUBLE) / k / 1e6)"
        " * (1.0 - CAST(s1 AS DOUBLE) / k / 1e6)"
        " / (CAST(k * s2 - s1 * s1 AS DOUBLE)"
        " / (CAST(k AS DOUBLE) * (k - 1)) / 1e12) - 1.0"
    )
    return (
        per.crossJoin(F.broadcast(prior))
        .select(
            "source",
            "n_s",
            "e_s",
            "rq",
            F.expr(
                f"""
                CASE WHEN k < 2 OR k * s2 - s1 * s1 <= 0
                    OR {mraw} <= 0 THEN 0
                ELSE CAST(floor(({mraw}) * 1e6 + 0.5) AS BIGINT)
                END
                """
            ).alias("mq"),
            F.expr(
                f"""
                CASE WHEN k < 2 OR k * s2 - s1 * s1 <= 0
                    OR {mraw} <= 0 THEN 0
                ELSE CAST(floor((CAST(s1 AS DOUBLE) / k / 1e6)
                  * (CAST(floor(({mraw}) * 1e6 + 0.5) AS BIGINT) / 1e6)
                  * 1e6 + 0.5) AS BIGINT)
                END
                """
            ).alias("aq"),
        )
        .select(
            "source",
            "n_s",
            "e_s",
            F.expr("rq / 1e6").alias("rate"),
            F.expr("mq / 1e6").alias("prior_mass"),
            F.expr(
                """
                CASE WHEN mq = 0 THEN rq / 1e6 ELSE
                  CAST(floor(CAST(e_s * 1000000 + aq AS DOUBLE)
                    / (n_s * 1000000 + mq) * 1e6 + 0.5) AS BIGINT) / 1e6
                END
                """
            ).alias("shrunk_rate"),
        )
        .orderBy("source")
    )


def _eb_oracle() -> str:
    mraw = (
        "(CAST(s1 AS DOUBLE) / k / 1e6)"
        " * (1.0 - CAST(s1 AS DOUBLE) / k / 1e6)"
        " / (CAST(k * s2 - s1 * s1 AS DOUBLE)"
        " / (CAST(k AS DOUBLE) * (k - 1)) / 1e12) - 1.0"
    )
    return f"""
WITH per AS (
  SELECT coalesce(source, '') AS source,
         CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS e_s,
         CAST(floor(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) * 1e6 + 0.5) AS BIGINT) AS rq
  FROM documents GROUP BY 1),
prior AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(rq) AS BIGINT) AS s1,
         CAST(sum(rq * rq) AS BIGINT) AS s2
  FROM per),
mid AS (
  SELECT source, n_s, e_s, rq,
         CASE WHEN k < 2 OR k * s2 - s1 * s1 <= 0
             OR {mraw} <= 0 THEN 0
         ELSE CAST(floor(({mraw}) * 1e6 + 0.5) AS BIGINT)
         END AS mq,
         CASE WHEN k < 2 OR k * s2 - s1 * s1 <= 0
             OR {mraw} <= 0 THEN 0
         ELSE CAST(floor((CAST(s1 AS DOUBLE) / k / 1e6)
           * (CAST(floor(({mraw}) * 1e6 + 0.5) AS BIGINT) / 1e6)
           * 1e6 + 0.5) AS BIGINT)
         END AS aq
  FROM per, prior)
SELECT source, n_s, e_s,
       rq / 1e6 AS rate,
       mq / 1e6 AS prior_mass,
       CASE WHEN mq = 0 THEN rq / 1e6 ELSE
         CAST(floor(CAST(e_s * 1000000 + aq AS DOUBLE)
           / (n_s * 1000000 + mq) * 1e6 + 0.5) AS BIGINT) / 1e6
       END AS shrunk_rate
FROM mid ORDER BY source
"""


ORACLE_EB_SHRINKAGE = _eb_oracle()


# ---------------------------------------------------------------------------
# prefix_tree_stats — vocabulary trie branching profile
# ---------------------------------------------------------------------------


def q_prefix_tree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trie profile of the token type vocabulary at depths
    1..``_PT_D``: distinct prefixes, covered types (len ≥ d), exact
    ends (len = d), and the fan-out ratio vs depth d−1 (a lag over
    the ≤``_PT_D``-row depth frame).

    Scale: one type-table pass, a ``_PT_D``× explode, per-depth
    partial aggs, one bounded lag window.
    """
    types = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr(
                    "filter(split(coalesce(text, ''), ' '), x -> x <> '')"
                )
            ).alias("tok")
        )
        .distinct()
    )
    per = (
        types.select(
            F.explode(F.expr(f"sequence(1, {_PT_D})")).alias("depth"),
            "tok",
        )
        .where(F.expr("length(tok) >= depth"))
        .select(
            "depth",
            F.expr("substring(tok, 1, depth)").alias("pfx"),
            F.expr("CASE WHEN length(tok) = depth THEN 1 ELSE 0 END")
            .cast("bigint")
            .alias("ends"),
        )
        .groupBy("depth")
        .agg(
            F.countDistinct("pfx").cast("bigint").alias("n_prefixes"),
            F.count("*").cast("bigint").alias("n_types_covered"),
            F.sum("ends").cast("bigint").alias("n_exact_ends"),
        )
    )
    wl = Window.orderBy("depth")
    return (
        per.withColumn(
            "prev", F.lag("n_prefixes").over(wl).cast("bigint")
        )
        .select(
            "depth",
            "n_prefixes",
            "n_types_covered",
            "n_exact_ends",
            F.expr(
                """
                CASE WHEN prev IS NULL OR prev = 0 THEN 0.0 ELSE
                  CAST(floor(CAST(n_prefixes AS DOUBLE) / prev * 1e6
                    + 0.5) AS BIGINT) / 1e6
                END
                """
            ).alias("fanout"),
        )
        .orderBy("depth")
    )


ORACLE_PREFIX_TREE_STATS = f"""
WITH types AS (
  SELECT DISTINCT unnest(list_filter(
    string_split(coalesce(text, ''), ' '), x -> x <> '')) AS tok
  FROM documents),
per AS (
  SELECT depth,
         CAST(count(DISTINCT substring(tok, 1, depth)) AS BIGINT)
           AS n_prefixes,
         CAST(count(*) AS BIGINT) AS n_types_covered,
         CAST(sum(CASE WHEN length(tok) = depth THEN 1 ELSE 0 END)
           AS BIGINT) AS n_exact_ends
  FROM types
  CROSS JOIN (SELECT unnest(range(1, {_PT_D + 1})) AS depth)
  WHERE length(tok) >= depth
  GROUP BY depth)
SELECT depth, n_prefixes, n_types_covered, n_exact_ends,
       CASE WHEN lag(n_prefixes) OVER (ORDER BY depth) IS NULL
              OR lag(n_prefixes) OVER (ORDER BY depth) = 0 THEN 0.0
       ELSE CAST(floor(CAST(n_prefixes AS DOUBLE)
         / lag(n_prefixes) OVER (ORDER BY depth) * 1e6 + 0.5)
         AS BIGINT) / 1e6
       END AS fanout
FROM per ORDER BY depth
"""


# ---------------------------------------------------------------------------
# trimmed_stats — exact trimmed and winsorized means from the histogram
# ---------------------------------------------------------------------------


def q_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed and winsorized means of n_chars.

    With k = ⌊n/10⌋ the kept rank window is [k+1, n−k]; each
    histogram value keeps max(0, min(cum, hi) − max(cum−m+1, lo) + 1)
    of its mass — integer interval overlap — so the trimmed sum is
    exact.  Winsorizing adds k·v_lo + k·v_hi with the boundary order
    statistics.  All BIGINT until the final micro divisions.

    Scale: one value-histogram partial agg + one bounded cumulative
    window + a 1-row reduce.
    """
    hist = (
        _t(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("bigint").alias("m"))
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("m").over(wc).cast("bigint")).withColumn(
        "n", F.sum("m").over(Window.partitionBy()).cast("bigint")
    )
    agg = cum.groupBy().agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.expr("m * v")).cast("bigint").alias("s_all"),
        F.sum(
            F.expr(
                f"""
                greatest(0, least(cum, n - n DIV {_TS_PCT})
                  - greatest(cum - m + 1, n DIV {_TS_PCT} + 1) + 1) * v
                """
            )
        )
        .cast("bigint")
        .alias("s_trim"),
        F.min(
            F.expr(f"CASE WHEN cum >= n DIV {_TS_PCT} + 1 THEN v END")
        )
        .cast("bigint")
        .alias("v_lo"),
        F.min(
            F.expr(f"CASE WHEN cum >= n - n DIV {_TS_PCT} THEN v END")
        )
        .cast("bigint")
        .alias("v_hi"),
    )
    return agg.select(
        "n",
        F.expr(f"n DIV {_TS_PCT}").cast("bigint").alias("k_trim"),
        "v_lo",
        "v_hi",
        F.expr(
            "CAST(floor(CAST(s_all AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT)"
            " / 1e6"
        ).alias("mean"),
        F.expr(
            f"""
            CASE WHEN n - 2 * (n DIV {_TS_PCT}) <= 0 THEN 0.0 ELSE
              CAST(floor(CAST(s_trim AS DOUBLE)
                / (n - 2 * (n DIV {_TS_PCT})) * 1e6 + 0.5) AS BIGINT)
                / 1e6
            END
            """
        ).alias("trimmed_mean"),
        F.expr(
            f"""
            CAST(floor(CAST(s_trim + (n DIV {_TS_PCT}) * v_lo
              + (n DIV {_TS_PCT}) * v_hi AS DOUBLE) / n * 1e6 + 0.5)
              AS BIGINT) / 1e6
            """
        ).alias("winsorized_mean"),
    )


ORACLE_TRIMMED_STATS = f"""
WITH hist AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS m
  FROM documents GROUP BY 1),
cum AS (
  SELECT v, m,
         CAST(sum(m) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum,
         CAST(sum(m) OVER () AS BIGINT) AS n
  FROM hist),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         CAST(sum(m * v) AS BIGINT) AS s_all,
         CAST(sum(greatest(0, least(cum, n - n // {_TS_PCT})
             - greatest(cum - m + 1, n // {_TS_PCT} + 1) + 1) * v)
           AS BIGINT) AS s_trim,
         CAST(min(CASE WHEN cum >= n // {_TS_PCT} + 1 THEN v END)
           AS BIGINT) AS v_lo,
         CAST(min(CASE WHEN cum >= n - n // {_TS_PCT} THEN v END)
           AS BIGINT) AS v_hi
  FROM cum)
SELECT n, CAST(n // {_TS_PCT} AS BIGINT) AS k_trim, v_lo, v_hi,
       CAST(floor(CAST(s_all AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT)
         / 1e6 AS mean,
       CASE WHEN n - 2 * (n // {_TS_PCT}) <= 0 THEN 0.0 ELSE
         CAST(floor(CAST(s_trim AS DOUBLE)
           / (n - 2 * (n // {_TS_PCT})) * 1e6 + 0.5) AS BIGINT) / 1e6
       END AS trimmed_mean,
       CAST(floor(CAST(s_trim + (n // {_TS_PCT}) * v_lo
         + (n // {_TS_PCT}) * v_hi AS DOUBLE) / n * 1e6 + 0.5)
         AS BIGINT) / 1e6 AS winsorized_mean
FROM agg
"""


# ---------------------------------------------------------------------------
# cvm_expfit — Cramér–von Mises W² of inter-arrival deltas vs exp fit
# ---------------------------------------------------------------------------


def q_cvm_expfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W² = Σ(F(x_(i)) − (2i−1)/(2n))² + 1/(12n) against the fitted
    exponential, tie-safe: a value with m ties after c smaller obs
    contributes m·F² − F·m(2c+m)/n + (g(c+m)−g(c))/(4n²) with
    g(k) = k(4k²−1)/3 — all integer inputs; per-value terms are
    micro-quantized before the sum.  Cumulatives use the
    ``interarrival_expfit`` two-level bucket scheme.

    Scale: one user-partitioned lead window, a delta-histogram
    partial agg, the bounded #buckets offset window + bucket-
    partitioned within-window, one 1-row reduce.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).cast("bigint").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    hist = (
        ev.withColumn("dt", F.lead("us").over(w) - F.col("us"))
        .where(F.col("dt") > 0)
        .groupBy("dt")
        .agg(F.count("*").cast("bigint").alias("m"))
        .withColumn("bucket", F.expr(f"dt DIV {_CVM_BUCKET}"))
    )
    wb = Window.partitionBy().orderBy("bucket")
    bucket_tot = hist.groupBy("bucket").agg(
        F.sum("m").cast("bigint").alias("tm"),
        F.sum(F.expr("dt * m")).cast("bigint").alias("tsx"),
    )
    offs = bucket_tot.select(
        "bucket",
        F.coalesce(
            F.sum("tm").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("off"),
        F.sum("tm").over(Window.partitionBy()).cast("bigint").alias("n"),
        F.sum("tsx").over(Window.partitionBy()).cast("bigint").alias("sx"),
    )
    wv = (
        Window.partitionBy("bucket")
        .orderBy("dt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_v = hist.join(F.broadcast(offs), "bucket").select(
        "dt",
        "m",
        "n",
        "sx",
        (F.col("off") + F.sum("m").over(wv) - F.col("m"))
        .cast("bigint")
        .alias("c"),
    )
    term = per_v.select(
        "n",
        "sx",
        F.expr(
            """
            CAST(floor((
              m * (1.0 - exp(-(CAST(n AS DOUBLE) / sx) * dt))
                  * (1.0 - exp(-(CAST(n AS DOUBLE) / sx) * dt))
              - (1.0 - exp(-(CAST(n AS DOUBLE) / sx) * dt))
                  * CAST(m * (2 * c + m) AS DOUBLE) / n
              + CAST((c + m) * (4 * (c + m) * (c + m) - 1) / 3
                     - c * (4 * c * c - 1) / 3 AS DOUBLE)
                / (4.0 * n * n)
            ) * 1e9 + 0.5) AS BIGINT)
            """
        ).alias("t_u"),
    )
    agg = term.groupBy().agg(
        F.max("n").cast("bigint").alias("n_intervals"),
        F.max("sx").cast("bigint").alias("sx"),
        F.sum("t_u").cast("bigint").alias("t_sum"),
    )
    return agg.select(
        "n_intervals",
        F.expr(
            """
            CAST(floor(CAST(n_intervals AS DOUBLE) / sx * 1e6 * 1e6 + 0.5)
              AS BIGINT) / 1e6
            """
        ).alias("lambda_per_sec"),
        F.expr(
            """
            CAST(floor((CAST(t_sum AS DOUBLE) / 1e9
              + 1.0 / (12.0 * n_intervals)) * 1e6 + 0.5) AS BIGINT) / 1e6
            """
        ).alias("w2"),
    )


ORACLE_CVM_EXPFIT = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
dts AS (
  SELECT lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
           - us AS dt
  FROM ev),
hist AS (
  SELECT dt, CAST(count(*) AS BIGINT) AS m
  FROM dts WHERE dt > 0 GROUP BY dt),
tot AS (
  SELECT CAST(sum(m) AS BIGINT) AS n, CAST(sum(dt * m) AS BIGINT) AS sx
  FROM hist),
cums AS (
  SELECT dt, m, n, sx,
         CAST(sum(m) OVER (ORDER BY dt
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - m AS BIGINT) AS c
  FROM hist, tot),
term AS (
  SELECT n, sx,
         CAST(floor((
           m * (1.0 - exp(-(CAST(n AS DOUBLE) / sx) * dt))
               * (1.0 - exp(-(CAST(n AS DOUBLE) / sx) * dt))
           - (1.0 - exp(-(CAST(n AS DOUBLE) / sx) * dt))
               * CAST(m * (2 * c + m) AS DOUBLE) / n
           + CAST((c + m) * (4 * (c + m) * (c + m) - 1) // 3
                  - c * (4 * c * c - 1) // 3 AS DOUBLE)
             / (4.0 * n * n)
         ) * 1e9 + 0.5) AS BIGINT) AS t_u
  FROM cums),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_intervals,
         CAST(max(sx) AS BIGINT) AS sx,
         CAST(sum(t_u) AS BIGINT) AS t_sum
  FROM term)
SELECT n_intervals,
       CAST(floor(CAST(n_intervals AS DOUBLE) / sx * 1e6 * 1e6 + 0.5)
         AS BIGINT) / 1e6 AS lambda_per_sec,
       CAST(floor((CAST(t_sum AS DOUBLE) / 1e9
         + 1.0 / (12.0 * n_intervals)) * 1e6 + 0.5) AS BIGINT) / 1e6
         AS w2
FROM agg
"""


DISTSHAPE_QUERIES = {
    "wasserstein_1d": q_wasserstein_1d,
    "eb_shrinkage": q_eb_shrinkage,
    "prefix_tree_stats": q_prefix_tree_stats,
    "trimmed_stats": q_trimmed_stats,
    "cvm_expfit": q_cvm_expfit,
}

DISTSHAPE_ORACLES = {
    "wasserstein_1d": ORACLE_WASSERSTEIN_1D,
    "eb_shrinkage": ORACLE_EB_SHRINKAGE,
    "prefix_tree_stats": ORACLE_PREFIX_TREE_STATS,
    "trimmed_stats": ORACLE_TRIMMED_STATS,
    "cvm_expfit": ORACLE_CVM_EXPFIT,
}

_q.QUERIES.update(DISTSHAPE_QUERIES)
_q.ORACLES.update(DISTSHAPE_ORACLES)
