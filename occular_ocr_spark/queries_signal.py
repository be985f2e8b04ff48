"""Signal-engineering & divergence catalog, round 4 (wave 40): five
operators spanning the feature-engineering, corpus-divergence, and
robust-statistics surfaces —

* ``feature_hashing`` — the hashing trick (Weinberger et al. 2009)
  over the whitespace token vocabulary: every token is bucketed by
  ``md5`` (first 8 hex digits → BIGINT, mod ``_FH_BUCKETS``) and the
  per-bucket load is reported — token mass, type count (collisions =
  types − 1), and the share of the bucket's dominant token.  This is
  the audit panel you run before committing to a hashed feature space
  for a linear model at corpus scale.
* ``js_divergence`` — pairwise Jensen–Shannon divergence between the
  per-source unigram distributions, computed over each source's
  top-``_JS_TOP`` token head (renormalized within the head so the
  frame is constant-size at any SF).  Disjoint-head pairs correctly
  report ln 2.  The symmetric, bounded companion to the directional
  ``fighting_words`` / ``mutual_information`` panels.
* ``theil_sen`` — Theil–Sen robust trend of the daily event-count
  series: the (lower) median of all pairwise slopes, plus the
  matching median-residual intercept.  The robust twin of the OLS
  trend in ``ols_fit`` — a single wild day cannot move it.
* ``woe_iv`` — weight-of-evidence / information-value panel of
  equal-width ``n_chars`` buckets predicting ``lang = 'en'`` (add-one
  smoothed, dense K-bucket grid): the classic credit-scoring
  discretization audit, here answering "how much does raw length
  alone tell you about language" before anyone trains on length.
* ``pca_2d`` — closed-form 2-D PCA of (n_chars, token_count): exact
  integer moment sums → covariance matrix → principal eigenvalue via
  the 2×2 quadratic formula, eigenvector slope, and variance
  explained.  One row out; the dimensionality-reduction companion to
  ``corr_matrix``.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_signal_wave.py.

Cross-engine float policy (the ln-parity doctrine,
queries_experiment.py): every libm input in this wave is derived from
exact BIGINT sums and micro-quantized (with a floor at 1 micro before
``ln`` so the argument can never hit 0) BEFORE the transcendental
call, so both engines evaluate ln/sqrt on bit-identical doubles; sums
of per-row contributions are quantized to integer micro-units BEFORE
aggregation so accumulation order cannot matter.  ``feature_hashing``
and ``theil_sen`` are transcendental-free (pure integer / one exact
double division).  BIGINT headroom: the largest products here are
(count × count) or (count × 10^6) — fine through ~10^9 rows; at the
10^12 extreme swap the moment sums to DECIMAL(38,0) (same note as
``ols_fit`` / ``corr_matrix``).

Scale notes: every entry is one corpus pass into a partial agg;
post-processing frames are constant-bounded — K=64 hash buckets,
#sources² source pairs (a dimension-sized cross, never corpus-sized),
#days² day pairs for Theil–Sen (the documented global-window
exception: the frame is the DAILY series, not the event table), K=10
WOE buckets, one PCA moment row.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the divergence family
(``psi_drift``, ``fighting_words``, ``mutual_information``), the
robust-stats family (``daily_anomaly_mad``, ``mann_kendall``), the
discretization family (``score_deciles``, ``calibration_curve``), and
the moments family (``corr_matrix``, ``ols_fit``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# Hashing-trick bucket count.
_FH_BUCKETS = 64
# Per-source token head size for js_divergence.
_JS_TOP = 500
# WOE equal-width length-bucket count.
_WOE_K = 10

_LN2_MICRO = 693147  # floor(ln(2)·1e6 + 0.5)


# ---------------------------------------------------------------------------
# feature_hashing — hashing-trick bucket-load audit
# ---------------------------------------------------------------------------


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bucket audit: every whitespace token is hashed
    with md5 (first 8 hex digits parsed as a BIGINT — bit-identical in
    Spark's ``conv`` and DuckDB's hex cast, pinned by
    tests/test_signal_wave.py) into ``_FH_BUCKETS`` buckets; per
    bucket we report token mass, type count (collisions = n_types−1),
    and the dominant token's share of the bucket.  The pre-flight
    audit for a hashed bag-of-words feature space: a bucket whose
    dominant share is low is pure collision noise.

    Scale: tokenize → (tok) partial agg → constant-K bucket agg; no
    window, no join.  The share ratio is exact integer round-half-up
    micro (the token_entropy idiom) — no libm anywhere.
    """
    tf = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("y"))
    )
    b = tf.withColumn(
        "bucket",
        F.expr(
            "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) "
            f"% {_FH_BUCKETS}"
        ),
    )
    agg = b.groupBy("bucket").agg(
        F.sum("y").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.max("y").cast("bigint").alias("ymax"),
    )
    return agg.select(
        "bucket",
        "n_tokens",
        "n_types",
        (
            F.expr("(2000000 * ymax + n_tokens) DIV (2 * n_tokens)")
            / 1000000.0
        ).alias("top_share"),
    )


ORACLE_FEATURE_HASHING = f"""
WITH tf AS (
  SELECT tok, count(*) AS y
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY tok),
b AS (
  SELECT CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {_FH_BUCKETS}
           AS bucket,
         y
  FROM tf),
agg AS (
  SELECT bucket, CAST(sum(y) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(max(y) AS BIGINT) AS ymax
  FROM b GROUP BY bucket)
SELECT bucket, n_tokens, n_types,
       ((2000000 * ymax + n_tokens) // (2 * n_tokens)) / 1000000.0
         AS top_share
FROM agg
"""


# ---------------------------------------------------------------------------
# js_divergence — pairwise source-head Jensen–Shannon divergence
# ---------------------------------------------------------------------------


def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence for every source pair, over each
    source's top-``_JS_TOP`` token head renormalized within the head.

    Decomposition that needs only the INNER join on shared tokens:
    JS(p,q) = ½·ln2·(2 − sh_p − sh_q)
            + ½·Σ_shared [ p·ln(2p/(p+q)) + q·ln(2q/(p+q)) ]
    where sh_p is the p-mass of the shared support — tokens exclusive
    to one head contribute exactly ½·p·ln2 each, and that telescopes
    to the first term.  With p = y1/N1, q = y2/N2 the log ratios are
    rationals of exact BIGINTs: 2p/(p+q) = 2·y1·N2 / (y1·N2 + y2·N1).

    Determinism: each ratio is micro-quantized (floored at 1 micro —
    ln never sees 0) before ``ln`` so both engines call libm on
    identical doubles; each row's weighted contribution is quantized
    to half-micro integers BEFORE the per-pair sum, so accumulation
    order is irrelevant.  Disjoint-head pairs fall out of the dense
    source×source grid with JS = ln 2 exactly.

    Scale: the head is a per-source top-K window (constant K), the
    pair join is tok-partitioned over ≤ K·|S| rows, and the only
    cross join is the |S|² source-dimension grid — bounded by the
    source dimension, never the corpus.
    """
    tf = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("y"))
    )
    w = Window.partitionBy("source").orderBy(F.col("y").desc(), "tok")
    head = (
        tf.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _JS_TOP)
        .drop("r")
    )
    tot = head.groupBy("source").agg(F.sum("y").cast("bigint").alias("nh"))
    h = head.join(tot, "source").select(
        F.col("source").alias("s"),
        "tok",
        F.col("y").cast("bigint").alias("y"),
        "nh",
    )
    pair = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.s") < F.col("b.s")),
        )
        .select(
            F.col("a.s").alias("s1"),
            F.col("b.s").alias("s2"),
            F.col("a.y").alias("y1"),
            F.col("b.y").alias("y2"),
            F.col("a.nh").alias("n1"),
            F.col("b.nh").alias("n2"),
        )
        .withColumn(
            "qc",
            F.expr(
                """
                CAST(floor(
                  (CAST(y1 AS DOUBLE) / n1
                     * ln(greatest(CAST(floor(
                         2e6 * y1 * n2 / (y1 * n2 + y2 * n1) + 0.5
                       ) AS BIGINT), 1) / 1e6)
                   + CAST(y2 AS DOUBLE) / n2
                     * ln(greatest(CAST(floor(
                         2e6 * y2 * n1 / (y1 * n2 + y2 * n1) + 0.5
                       ) AS BIGINT), 1) / 1e6)
                  ) * 500000 + 0.5) AS BIGINT)
                """
            ),
        )
    )
    shared = pair.groupBy("s1", "s2").agg(
        F.sum("y1").cast("bigint").alias("sh1"),
        F.sum("y2").cast("bigint").alias("sh2"),
        F.count("*").cast("bigint").alias("n_shared"),
        F.sum("qc").cast("bigint").alias("qsum"),
    )
    grid = (
        tot.select(F.col("source").alias("s1"), F.col("nh").alias("n1_head"))
        .crossJoin(
            tot.select(
                F.col("source").alias("s2"), F.col("nh").alias("n2_head")
            )
        )
        .where(F.col("s1") < F.col("s2"))
    )
    out = (
        grid.join(shared, ["s1", "s2"], "left")
        .na.fill({"sh1": 0, "sh2": 0, "n_shared": 0, "qsum": 0})
        .withColumn(
            "js",
            F.expr(
                f"""
                (qsum + CAST(floor(
                   {_LN2_MICRO} * 0.5e-6 * 1e6 *
                     (2.0 - CAST(sh1 AS DOUBLE) / n1_head
                          - CAST(sh2 AS DOUBLE) / n2_head) + 0.5
                 ) AS BIGINT)) / 1e6
                """
            ),
        )
    )
    return out.select("s1", "s2", "n1_head", "n2_head", "n_shared", "js")


ORACLE_JS_DIVERGENCE = f"""
WITH tf AS (
  SELECT source, tok, count(*) AS y
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY source, tok),
head AS (
  SELECT source, tok, y FROM (
    SELECT source, tok, y,
           row_number() OVER (PARTITION BY source
                              ORDER BY y DESC, tok) AS r
    FROM tf)
  WHERE r <= {_JS_TOP}),
tot AS (
  SELECT source, CAST(sum(y) AS BIGINT) AS nh FROM head GROUP BY source),
h AS (
  SELECT head.source AS s, tok, CAST(y AS BIGINT) AS y, nh
  FROM head JOIN tot ON head.source = tot.source),
pair AS (
  SELECT a.s AS s1, b.s AS s2, a.y AS y1, b.y AS y2,
         a.nh AS n1, b.nh AS n2,
         CAST(floor(
           (CAST(a.y AS DOUBLE) / a.nh
              * ln(greatest(CAST(floor(
                  2e6 * a.y * b.nh / (a.y * b.nh + b.y * a.nh) + 0.5
                ) AS BIGINT), 1) / 1e6)
            + CAST(b.y AS DOUBLE) / b.nh
              * ln(greatest(CAST(floor(
                  2e6 * b.y * a.nh / (a.y * b.nh + b.y * a.nh) + 0.5
                ) AS BIGINT), 1) / 1e6)
           ) * 500000 + 0.5) AS BIGINT) AS qc
  FROM h a JOIN h b ON a.tok = b.tok AND a.s < b.s),
shared AS (
  SELECT s1, s2, CAST(sum(y1) AS BIGINT) AS sh1,
         CAST(sum(y2) AS BIGINT) AS sh2,
         CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(qc) AS BIGINT) AS qsum
  FROM pair GROUP BY s1, s2),
grid AS (
  SELECT a.source AS s1, a.nh AS n1_head, b.source AS s2, b.nh AS n2_head
  FROM tot a, tot b WHERE a.source < b.source)
SELECT g.s1, g.s2, g.n1_head, g.n2_head,
       coalesce(sh.n_shared, 0) AS n_shared,
       (coalesce(sh.qsum, 0) + CAST(floor(
          {_LN2_MICRO} * 0.5e-6 * 1e6 *
            (2.0 - CAST(coalesce(sh.sh1, 0) AS DOUBLE) / g.n1_head
                 - CAST(coalesce(sh.sh2, 0) AS DOUBLE) / g.n2_head) + 0.5
        ) AS BIGINT)) / 1e6 AS js
FROM grid g LEFT JOIN shared sh ON g.s1 = sh.s1 AND g.s2 = sh.s2
"""


# ---------------------------------------------------------------------------
# theil_sen — robust median-of-slopes trend of the daily series
# ---------------------------------------------------------------------------


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the daily event-count series: the
    LOWER median (row (n+1)÷2 under a total order — no interpolation,
    so the statistic is an exact value both engines agree on) of all
    #days·(#days−1)/2 pairwise slopes, and the matching intercept as
    the lower median of y_i − slope·x_i (x = days since the first
    day).  One wild day moves OLS; it cannot move this.

    Determinism: slopes are exact-rational dy/dx evaluated as one
    IEEE double division of BIGINTs, micro-quantized; the median rows
    are selected by row_number under (value, day) total orders —
    transcendental-free end to end.

    Scale: the corpus pass is one daily partial agg; the pair frame
    and both median windows are #days²-sized — the documented
    bounded-global-window exception (the DAILY series, never the
    event table; 10 years ≈ 6.7M pairs, still one task's worth).
    """
    daily = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    pairs = (
        daily.alias("a")
        .join(daily.alias("b"), F.col("a.d") < F.col("b.d"))
        .select(
            F.expr(
                "CAST(floor(1e6 * CAST(b.y - a.y AS DOUBLE)"
                " / datediff(b.d, a.d) + 0.5) AS BIGINT)"
            ).alias("slope_micro"),
            F.col("a.d").alias("d1"),
            F.col("b.d").alias("d2"),
        )
    )
    wp = Window.orderBy("slope_micro", "d1", "d2")
    med = (
        pairs.withColumn("rn", F.row_number().over(wp))
        .withColumn(
            "np", F.count("*").over(Window.partitionBy(F.lit(1)))
        )
        .where(F.expr("rn = (np + 1) DIV 2"))
        .select("slope_micro", F.col("np").cast("bigint").alias("n_pairs"))
    )
    base = daily.crossJoin(
        daily.groupBy().agg(F.min("d").alias("d0"))
    ).crossJoin(med)
    resid = base.select(
        "slope_micro",
        "n_pairs",
        F.expr(
            "CAST(floor(1e6 * (y - slope_micro / 1e6"
            " * datediff(d, d0)) + 0.5) AS BIGINT)"
        ).alias("resid_micro"),
        "d",
    )
    wr = Window.orderBy("resid_micro", "d")
    out = (
        resid.withColumn("rn", F.row_number().over(wr))
        .withColumn("nd", F.count("*").over(Window.partitionBy(F.lit(1))))
        .where(F.expr("rn = (nd + 1) DIV 2"))
        .select(
            F.col("nd").cast("bigint").alias("n_days"),
            "n_pairs",
            (F.col("slope_micro") / 1e6).alias("slope"),
            (F.col("resid_micro") / 1e6).alias("intercept"),
        )
    )
    return out


ORACLE_THEIL_SEN = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
pairs AS (
  SELECT CAST(floor(1e6 * CAST(b.y - a.y AS DOUBLE)
                    / date_diff('day', a.d, b.d) + 0.5) AS BIGINT)
           AS slope_micro,
         a.d AS d1, b.d AS d2
  FROM daily a JOIN daily b ON a.d < b.d),
med AS (
  SELECT slope_micro, CAST(np AS BIGINT) AS n_pairs FROM (
    SELECT slope_micro,
           row_number() OVER (ORDER BY slope_micro, d1, d2) AS rn,
           count(*) OVER () AS np
    FROM pairs)
  WHERE rn = (np + 1) // 2),
resid AS (
  SELECT med.slope_micro, med.n_pairs,
         CAST(floor(1e6 * (daily.y - med.slope_micro / 1e6
                * date_diff('day', d0.d0, daily.d)) + 0.5) AS BIGINT)
           AS resid_micro,
         daily.d
  FROM daily, (SELECT min(d) AS d0 FROM daily) d0, med)
SELECT CAST(nd AS BIGINT) AS n_days, n_pairs,
       slope_micro / 1e6 AS slope,
       resid_micro / 1e6 AS intercept
FROM (
  SELECT slope_micro, n_pairs, resid_micro,
         row_number() OVER (ORDER BY resid_micro, d) AS rn,
         count(*) OVER () AS nd
  FROM resid)
WHERE rn = (nd + 1) // 2
"""


# ---------------------------------------------------------------------------
# woe_iv — weight-of-evidence / information value of length buckets
# ---------------------------------------------------------------------------


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence panel: ``n_chars`` is cut into ``_WOE_K``
    equal-width buckets (pure-integer bucket formula
    ((x−min)·K) ÷ (max−min+1) — both engines floor-divide
    non-negative ints identically); per bucket, good = ``lang='en'``
    count, bad = the rest, both add-one smoothed against a DENSE
    K-bucket grid (empty buckets carry the smoothing mass only).
    WOE_k = ln(g'_k·B' / (b'_k·G')), IV = Σ (g'_k/G' − b'_k/B')·WOE_k
    — the standard pre-training audit of how much a raw feature leaks
    the label.

    Determinism: the WOE ratio is a rational of exact BIGINTs,
    micro-quantized (floored at 1 micro) before ``ln``; the IV
    contribution reuses the QUANTIZED woe so both engines multiply
    identical doubles, and is itself micro-quantized before the
    K-row total window.

    Scale: one corpus pass for min/max (1-row broadcast), one for the
    bucket counts; the grid/total frames are K = 10 rows.
    """
    docs = _t(spark, sf_dir, "documents")
    mm = docs.groupBy().agg(
        F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")
    )
    cnt = (
        docs.crossJoin(mm)
        .select(
            F.expr(
                f"CAST((n_chars - mn) * {_WOE_K}"
                " DIV (mx - mn + 1) AS BIGINT)"
            ).alias("bucket"),
            (F.col("lang") == "en").cast("bigint").alias("g"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("g").cast("bigint").alias("n_good"),
            F.sum(F.lit(1) - F.col("g")).cast("bigint").alias("n_bad"),
        )
    )
    grid = spark.range(_WOE_K).select(F.col("id").cast("bigint").alias("bucket"))
    dense = (
        grid.join(cnt, "bucket", "left")
        .na.fill({"n_good": 0, "n_bad": 0})
        .crossJoin(
            cnt.groupBy().agg(
                F.sum("n_good").cast("bigint").alias("gt"),
                F.sum("n_bad").cast("bigint").alias("bt"),
            )
        )
    )
    scored = dense.select(
        "bucket",
        "n_good",
        "n_bad",
        F.expr(
            f"""
            CAST(floor(ln(greatest(CAST(floor(
              1e6 * CAST((n_good + 1) * (bt + {_WOE_K}) AS DOUBLE)
                  / ((n_bad + 1) * (gt + {_WOE_K})) + 0.5
            ) AS BIGINT), 1) / 1e6) * 1e6 + 0.5) AS BIGINT)
            """
        ).alias("woe_micro"),
        F.col("gt"),
        F.col("bt"),
    ).withColumn(
        "ivp_micro",
        F.expr(
            f"""
            CAST(floor(
              (CAST(n_good + 1 AS DOUBLE) / (gt + {_WOE_K})
               - CAST(n_bad + 1 AS DOUBLE) / (bt + {_WOE_K}))
              * (woe_micro / 1e6) * 1e6 + 0.5) AS BIGINT)
            """
        ),
    )
    wt = Window.partitionBy(F.lit(1))
    return scored.select(
        "bucket",
        "n_good",
        "n_bad",
        (F.col("woe_micro") / 1e6).alias("woe"),
        (F.col("ivp_micro") / 1e6).alias("iv_part"),
        (F.sum("ivp_micro").over(wt) / 1e6).alias("iv"),
    ).orderBy("bucket")


ORACLE_WOE_IV = f"""
WITH mm AS (
  SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents),
cnt AS (
  SELECT CAST((n_chars - mn) * {_WOE_K} // (mx - mn + 1) AS BIGINT)
           AS bucket,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_good,
         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
           AS n_bad
  FROM documents, mm GROUP BY 1),
tot AS (
  SELECT CAST(sum(n_good) AS BIGINT) AS gt,
         CAST(sum(n_bad) AS BIGINT) AS bt FROM cnt),
dense AS (
  SELECT g.bucket, coalesce(cnt.n_good, 0) AS n_good,
         coalesce(cnt.n_bad, 0) AS n_bad, tot.gt, tot.bt
  FROM (SELECT unnest(range({_WOE_K})) AS bucket) g
  LEFT JOIN cnt ON g.bucket = cnt.bucket, tot),
scored AS (
  SELECT bucket, n_good, n_bad,
         CAST(floor(ln(greatest(CAST(floor(
           1e6 * CAST((n_good + 1) * (bt + {_WOE_K}) AS DOUBLE)
               / ((n_bad + 1) * (gt + {_WOE_K})) + 0.5
         ) AS BIGINT), 1) / 1e6) * 1e6 + 0.5) AS BIGINT) AS woe_micro,
         gt, bt
  FROM dense),
iv AS (
  SELECT bucket, n_good, n_bad, woe_micro,
         CAST(floor(
           (CAST(n_good + 1 AS DOUBLE) / (gt + {_WOE_K})
            - CAST(n_bad + 1 AS DOUBLE) / (bt + {_WOE_K}))
           * (woe_micro / 1e6) * 1e6 + 0.5) AS BIGINT) AS ivp_micro
  FROM scored)
SELECT bucket, n_good, n_bad,
       woe_micro / 1e6 AS woe,
       ivp_micro / 1e6 AS iv_part,
       sum(ivp_micro) OVER () / 1e6 AS iv
FROM iv ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# pca_2d — closed-form 2×2 PCA of (n_chars, token_count)
# ---------------------------------------------------------------------------


def q_pca_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form principal-component analysis of the 2-D feature
    (x = n_chars, y = whitespace token count): one partial-agg pass
    collects the six exact integer moments (n, Σx, Σy, Σx², Σy²,
    Σxy); the covariance entries (population, 1/n) are derived as
    integer-numerator rationals n·Σx² − (Σx)² over n², each
    micro-quantized; then the 2×2 eigensystem is solved in closed
    form on that ONE row — λ₁ = (cxx+cyy)/2 + √(((cxx−cyy)/2)² +
    cxy²), variance explained λ₁/(cxx+cyy), eigenvector slope
    (λ₁−cxx)/cxy.  The answer to "is document length basically
    one-dimensional" before anyone spends a real PCA on it.

    Determinism: sqrt's argument is built from the three
    micro-quantized covariance doubles, so both engines call libm on
    identical inputs; every output is micro-rounded.  BIGINT
    headroom: n·Σx² stays under 2⁶³ through ~10⁹ docs of 10⁴ chars
    (the ols_fit note: DECIMAL(38,0) beyond that).

    Scale: one scan → one row; zero joins, zero windows.
    """
    m = (
        _t(spark, sf_dir, "documents")
        .select(
            F.col("n_chars").cast("bigint").alias("x"),
            F.expr(
                "CAST(size(filter(split(coalesce(text, ''), ' '),"
                " t -> t <> '')) AS BIGINT)"
            ).alias("y"),
        )
        .groupBy()
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
    )
    cov = m.select(
        "n",
        F.expr(
            "CAST(floor(1e6 * sx / n + 0.5) AS BIGINT) / 1e6"
        ).alias("mean_x"),
        F.expr(
            "CAST(floor(1e6 * sy / n + 0.5) AS BIGINT) / 1e6"
        ).alias("mean_y"),
        F.expr(
            "CAST(floor(1e6 * CAST(n * sxx - sx * sx AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT)"
        ).alias("cxx_micro"),
        F.expr(
            "CAST(floor(1e6 * CAST(n * syy - sy * sy AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT)"
        ).alias("cyy_micro"),
        F.expr(
            "CAST(floor(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT)"
        ).alias("cxy_micro"),
    )
    out = cov.select(
        "n",
        "mean_x",
        "mean_y",
        (F.col("cxx_micro") / 1e6).alias("var_x"),
        (F.col("cyy_micro") / 1e6).alias("var_y"),
        (F.col("cxy_micro") / 1e6).alias("cov_xy"),
        F.expr(
            """
            CAST(floor(((cxx_micro + cyy_micro) / 2e6
              + sqrt(power((cxx_micro - cyy_micro) / 2e6, 2)
                     + power(cxy_micro / 1e6, 2))) * 1e6 + 0.5)
              AS BIGINT) / 1e6
            """
        ).alias("lambda1"),
        F.expr(
            """
            CAST(floor(((cxx_micro + cyy_micro) / 2e6
              + sqrt(power((cxx_micro - cyy_micro) / 2e6, 2)
                     + power(cxy_micro / 1e6, 2)))
              / ((cxx_micro + cyy_micro) / 1e6) * 1e6 + 0.5)
              AS BIGINT) / 1e6
            """
        ).alias("var_explained"),
        F.expr(
            """
            CAST(floor((((cxx_micro + cyy_micro) / 2e6
              + sqrt(power((cxx_micro - cyy_micro) / 2e6, 2)
                     + power(cxy_micro / 1e6, 2)))
              - cxx_micro / 1e6) / (cxy_micro / 1e6) * 1e6 + 0.5)
              AS BIGINT) / 1e6
            """
        ).alias("ev_slope"),
    )
    return out


ORACLE_PCA_2D = """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM (SELECT CAST(n_chars AS BIGINT) AS x,
               CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                                    t -> t <> '')) AS BIGINT) AS y
        FROM documents)),
cov AS (
  SELECT n,
         CAST(floor(1e6 * sx / n + 0.5) AS BIGINT) / 1e6 AS mean_x,
         CAST(floor(1e6 * sy / n + 0.5) AS BIGINT) / 1e6 AS mean_y,
         CAST(floor(1e6 * CAST(n * sxx - sx * sx AS DOUBLE)
              / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT) AS cxx_micro,
         CAST(floor(1e6 * CAST(n * syy - sy * sy AS DOUBLE)
              / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT) AS cyy_micro,
         CAST(floor(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
              / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT) AS cxy_micro
  FROM m)
SELECT n, mean_x, mean_y,
       cxx_micro / 1e6 AS var_x, cyy_micro / 1e6 AS var_y,
       cxy_micro / 1e6 AS cov_xy,
       CAST(floor(((cxx_micro + cyy_micro) / 2e6
         + sqrt(power((cxx_micro - cyy_micro) / 2e6, 2)
                + power(cxy_micro / 1e6, 2))) * 1e6 + 0.5)
         AS BIGINT) / 1e6 AS lambda1,
       CAST(floor(((cxx_micro + cyy_micro) / 2e6
         + sqrt(power((cxx_micro - cyy_micro) / 2e6, 2)
                + power(cxy_micro / 1e6, 2)))
         / ((cxx_micro + cyy_micro) / 1e6) * 1e6 + 0.5)
         AS BIGINT) / 1e6 AS var_explained,
       CAST(floor((((cxx_micro + cyy_micro) / 2e6
         + sqrt(power((cxx_micro - cyy_micro) / 2e6, 2)
                + power(cxy_micro / 1e6, 2)))
         - cxx_micro / 1e6) / (cxy_micro / 1e6) * 1e6 + 0.5)
         AS BIGINT) / 1e6 AS ev_slope
FROM cov
"""


SIGNAL_QUERIES = {
    "feature_hashing": q_feature_hashing,
    "js_divergence": q_js_divergence,
    "theil_sen": q_theil_sen,
    "woe_iv": q_woe_iv,
    "pca_2d": q_pca_2d,
}

SIGNAL_ORACLES = {
    "feature_hashing": ORACLE_FEATURE_HASHING,
    "js_divergence": ORACLE_JS_DIVERGENCE,
    "theil_sen": ORACLE_THEIL_SEN,
    "woe_iv": ORACLE_WOE_IV,
    "pca_2d": ORACLE_PCA_2D,
}

_q.QUERIES.update(SIGNAL_QUERIES)
_q.ORACLES.update(SIGNAL_ORACLES)
