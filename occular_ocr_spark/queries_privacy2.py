"""Release-audit catalog, round 4 (wave 52): five operators on the
privacy, richness, and design-based-estimation surfaces a dataset
release review reads —

* ``yule_k`` — per-source lexical-richness panel from the token
  frequency spectrum: Yule's K = 10⁴·(Σm²·Vₘ − N)/N², Sichel's
  S = V₂/V, and Honoré's R = 100·ln N/(1 − V₁/V) (0.0 when V₁ = V,
  documented).  K's core is exact BIGINT sums; S and R are row-local
  on exact integers.  The repeat-rate companion to ``chao1_richness``
  (unseen mass) and ``heaps_law`` (growth curve).
* ``cochran_q`` — Cochran's Q over the users × event-type binary
  incidence design (did user i ever fire type j): the tie-free
  identity Q = (k−1)(k·ΣCⱼ² − N²)/(k·ΣRᵢ − ΣRᵢ²) makes the whole
  statistic one exact-integer division.  The k-treatment
  generalization of ``mcnemar_test`` (k = 2).
* ``entropy_ldiversity`` — the entropy refinement of
  ``k_anonymity``'s distinct-l: per QI group (lang, length bucket),
  Shannon entropy of the sensitive ``source`` distribution
  (per-value terms micro-quantized before the group sum), effective
  l = exp(H), and the l ≥ 2 gate.  A group can pass distinct-l with
  a 99:1 skew; entropy-l catches it.
* ``t_closeness`` — per-source t-closeness of the ``lang``
  distribution vs the corpus: ordered-EMD over the lexicographic
  lang order, Σ|cum(cᵢ·N − Cᵢ·n_g)| exact BIGINT over the dense
  source × lang grid, one final division by N·n_g·(k−1).  Closes the
  k-anonymity / l-diversity / t-closeness governance triple.
* ``horvitz_thompson`` — design-based corpus estimation: a
  deterministic Lehmer-hash Poisson sample with per-source inclusion
  probability π ∈ {1/5, 1/2} (even/odd source-name length), the
  Horvitz–Thompson token-total estimator Σ tokens/π (exact BIGINT —
  1/π is an integer weight by construction), and the per-source
  relative error vs the true total.  The estimation companion to
  ``sample_stratified`` (which samples; this one certifies the
  estimator the sample supports).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_privacy2_wave.py.

Cross-engine float policy: frequency-spectrum moments, Q's
numerator/denominator, EMD cumulants, and HT estimates are exact
BIGINTs; entropy terms micro-quantize (floor(x·1e6+0.5)) before the
per-group sum; ln/exp finals are row-local on exact or quantized
inputs.

Scale notes: every operator reduces the corpus scan to a bounded
frame in one partial-agg pass — (source, tok) then (source, m)
spectra; per-user incidence flags (one user_id shuffle); QI-group
counts; the dense source × lang grid (≤ |sources|·|langs| rows, with
the cum window partitioned per source).  The Poisson sample never
materializes — the HT estimator folds the inclusion test into the
same map-side projection.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# QI bucketing (mirrors k_anonymity's grid)
_EL_BUCKET_W = 100
_EL_BUCKET_CAP = 6
_EL_L = 2.0

# Lehmer-hash constants for the deterministic Poisson design
_HT_A = 48271
_HT_M = 2147483647

_TOKN = "size(filter(split(coalesce(text, ''), ' '), x -> x <> ''))"
_TOKN_DUCK = (
    "len(list_filter(string_split(coalesce(text, ''), ' '), x -> x <> ''))"
)


# ---------------------------------------------------------------------------
# yule_k — lexical richness panel per source
# ---------------------------------------------------------------------------


def q_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K, Sichel's S, Honoré's R per source from the exact
    token frequency spectrum.

    Scale: (source, tok) partial agg → (source, m) spectrum → one
    ≤ |sources|-row reduce; tokens never leave their partition
    un-aggregated twice.
    """
    toks = _t(spark, sf_dir, "documents").select(
        F.coalesce("source", F.lit("")).alias("g"),
        F.explode(
            F.expr("filter(split(coalesce(text, ''), ' '), x -> x <> '')")
        ).alias("tok"),
    )
    freq = toks.groupBy("g", "tok").agg(
        F.count("*").cast("bigint").alias("m")
    )
    spec = freq.groupBy("g", "m").agg(
        F.count("*").cast("bigint").alias("vm")
    )
    agg = spec.groupBy("g").agg(
        F.sum(F.expr("m * vm")).cast("bigint").alias("n_tok"),
        F.sum("vm").cast("bigint").alias("v"),
        F.sum(F.expr("CASE WHEN m = 1 THEN vm ELSE 0 END"))
        .cast("bigint")
        .alias("v1"),
        F.sum(F.expr("CASE WHEN m = 2 THEN vm ELSE 0 END"))
        .cast("bigint")
        .alias("v2"),
        F.sum(F.expr("m * m * vm")).cast("bigint").alias("m2v"),
    )
    return agg.select(
        F.col("g").alias("source"),
        F.col("n_tok"),
        F.col("v").alias("vocab"),
        F.expr(
            """
            CASE WHEN n_tok = 0 THEN 0.0 ELSE
              CAST(floor(1e4 * (m2v - n_tok)
                / (CAST(n_tok AS DOUBLE) * n_tok) * 1e6 + 0.5)
                AS BIGINT) / 1e6 END
            """
        ).alias("yule_k"),
        F.expr(
            """
            CASE WHEN v = 0 THEN 0.0 ELSE
              CAST(floor(CAST(v2 AS DOUBLE) / v * 1e6 + 0.5) AS BIGINT)
                / 1e6 END
            """
        ).alias("sichel_s"),
        F.expr(
            """
            CASE WHEN n_tok = 0 OR v1 = v THEN 0.0 ELSE
              CAST(floor(100.0 * ln(n_tok)
                / (1.0 - CAST(v1 AS DOUBLE) / v) * 1e6 + 0.5) AS BIGINT)
                / 1e6 END
            """
        ).alias("honore_r"),
    ).orderBy("source")


ORACLE_YULE_K = """
WITH toks AS (
  SELECT coalesce(source, '') AS g,
         unnest(list_filter(string_split(coalesce(text, ''), ' '),
                            x -> x <> '')) AS tok
  FROM documents),
freq AS (
  SELECT g, tok, CAST(count(*) AS BIGINT) AS m FROM toks GROUP BY 1, 2),
spec AS (
  SELECT g, m, CAST(count(*) AS BIGINT) AS vm FROM freq GROUP BY 1, 2),
agg AS (
  SELECT g,
         CAST(sum(m * vm) AS BIGINT) AS n_tok,
         CAST(sum(vm) AS BIGINT) AS v,
         CAST(sum(CASE WHEN m = 1 THEN vm ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN m = 2 THEN vm ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(m * m * vm) AS BIGINT) AS m2v
  FROM spec GROUP BY g)
SELECT g AS source, n_tok, v AS vocab,
       CASE WHEN n_tok = 0 THEN 0.0 ELSE
         CAST(floor(1e4 * (m2v - n_tok)
           / (CAST(n_tok AS DOUBLE) * n_tok) * 1e6 + 0.5) AS BIGINT)
           / 1e6 END AS yule_k,
       CASE WHEN v = 0 THEN 0.0 ELSE
         CAST(floor(CAST(v2 AS DOUBLE) / v * 1e6 + 0.5) AS BIGINT)
           / 1e6 END AS sichel_s,
       CASE WHEN n_tok = 0 OR v1 = v THEN 0.0 ELSE
         CAST(floor(100.0 * ln(n_tok)
           / (1.0 - CAST(v1 AS DOUBLE) / v) * 1e6 + 0.5) AS BIGINT)
           / 1e6 END AS honore_r
FROM agg ORDER BY source
"""


# ---------------------------------------------------------------------------
# cochran_q — blocked binary incidence test
# ---------------------------------------------------------------------------


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over users × event types (binary: did the user
    ever fire the type).  k is the global distinct-type count; users
    missing a type score 0 there, so row sums Rᵢ come free from the
    per-user distinct-type count and no dense grid is materialized.

    Scale: one (user, type) distinct partial agg; Rᵢ from a user_id
    shuffle, Cⱼ from an event_type shuffle (both bounded outputs);
    one 1-row reduce.
    """
    ut = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    ut = _q._persist_tracked(ut)
    k_df = ut.groupBy().agg(
        F.countDistinct("event_type").cast("bigint").alias("k")
    )
    r = ut.groupBy("user_id").agg(F.count("*").cast("bigint").alias("ri"))
    r_agg = r.groupBy().agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("ri").cast("bigint").alias("sr"),
        F.sum(F.expr("ri * ri")).cast("bigint").alias("sr2"),
    )
    c = ut.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("cj")
    )
    c_agg = c.groupBy().agg(
        F.sum(F.expr("cj * cj")).cast("bigint").alias("sc2"),
        F.sum("cj").cast("bigint").alias("n_total"),
    )
    return (
        r_agg.crossJoin(F.broadcast(c_agg))
        .crossJoin(F.broadcast(k_df))
        .select(
            "n_users",
            "k",
            (F.col("k") - 1).cast("bigint").alias("df"),
            F.expr(
                """
                CASE WHEN k * sr - sr2 <= 0 THEN 0.0 ELSE
                  CAST(floor(
                    (k - 1.0) * (k * sc2 - n_total * n_total)
                    / (k * sr - sr2) * 1e6 + 0.5) AS BIGINT) / 1e6 END
                """
            ).alias("q_stat"),
        )
    )


ORACLE_COCHRAN_Q = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM ut),
r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ri
      FROM ut GROUP BY user_id),
ra AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(ri) AS BIGINT) AS sr,
              CAST(sum(ri * ri) AS BIGINT) AS sr2 FROM r),
c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cj
      FROM ut GROUP BY event_type),
ca AS (SELECT CAST(sum(cj * cj) AS BIGINT) AS sc2,
              CAST(sum(cj) AS BIGINT) AS n_total FROM c)
SELECT n_users, k, CAST(k - 1 AS BIGINT) AS df,
       CASE WHEN k * sr - sr2 <= 0 THEN 0.0 ELSE
         CAST(floor(
           (k - 1.0) * (k * sc2 - n_total * n_total)
           / (k * sr - sr2) * 1e6 + 0.5) AS BIGINT) / 1e6 END AS q_stat
FROM ra, ca, kk
"""


# ---------------------------------------------------------------------------
# entropy_ldiversity — entropy-l per QI group
# ---------------------------------------------------------------------------


def q_entropy_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy l-diversity of ``source`` within each (lang, length
    bucket) QI group: H = −Σ(c/n)ln(c/n) with per-value terms
    micro-quantized before the group sum; effective l = exp(H).

    Scale: one (QI, source) partial agg, one QI-group partial agg —
    both bounded key spaces; no per-group buffers.
    """
    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.expr(
            f"least(CAST(n_chars AS BIGINT) DIV {_EL_BUCKET_W},"
            f" {_EL_BUCKET_CAP})"
        ).alias("len_bucket"),
        "source",
    )
    cnt = d.groupBy("lang", "len_bucket", "source").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wn = Window.partitionBy("lang", "len_bucket")
    terms = cnt.withColumn(
        "n", F.sum("c").over(wn).cast("bigint")
    ).select(
        "lang",
        "len_bucket",
        "n",
        F.expr(
            """
            CAST(floor(
              -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
              * 1e6 + 0.5) AS BIGINT)
            """
        ).alias("t_h"),
    )
    agg = terms.groupBy("lang", "len_bucket").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("t_h").cast("bigint").alias("sum_h"),
    )
    return agg.select(
        "lang",
        "len_bucket",
        "n",
        (F.col("sum_h").cast("double") / F.lit(1e6)).alias("h_entropy"),
        F.expr(
            "CAST(floor(exp(sum_h / 1e6) * 1e6 + 0.5) AS BIGINT) / 1e6"
        ).alias("eff_l"),
        F.expr(
            f"CAST(floor(exp(sum_h / 1e6) * 1e6 + 0.5) AS BIGINT) / 1e6"
            f" >= {_EL_L}"
        ).alias("l_ok"),
    ).orderBy("lang", "len_bucket")


ORACLE_ENTROPY_LDIVERSITY = f"""
WITH d AS (
  SELECT lang,
         least(CAST(n_chars AS BIGINT) // {_EL_BUCKET_W},
               {_EL_BUCKET_CAP}) AS len_bucket,
         source
  FROM documents),
cnt AS (
  SELECT lang, len_bucket, source, CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY 1, 2, 3),
terms AS (
  SELECT lang, len_bucket,
         CAST(sum(c) OVER (PARTITION BY lang, len_bucket) AS BIGINT)
           AS n,
         c
  FROM cnt),
q AS (
  SELECT lang, len_bucket, n,
         CAST(floor(
           -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
           * 1e6 + 0.5) AS BIGINT) AS t_h
  FROM terms),
agg AS (
  SELECT lang, len_bucket, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(t_h) AS BIGINT) AS sum_h
  FROM q GROUP BY 1, 2)
SELECT lang, len_bucket, n,
       CAST(sum_h AS DOUBLE) / 1e6 AS h_entropy,
       CAST(floor(exp(sum_h / 1e6) * 1e6 + 0.5) AS BIGINT) / 1e6
         AS eff_l,
       CAST(floor(exp(sum_h / 1e6) * 1e6 + 0.5) AS BIGINT) / 1e6
         >= {_EL_L} AS l_ok
FROM agg ORDER BY lang, len_bucket
"""


# ---------------------------------------------------------------------------
# t_closeness — ordered-EMD of lang distribution per source
# ---------------------------------------------------------------------------


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness of each source's ``lang`` distribution vs the
    corpus: ordered EMD over the lexicographic lang order,
    t = Σᵢ|cum(cᵢ·N − Cᵢ·n_g)| / (N·n_g·(k−1)) — the cumulant is an
    exact BIGINT on the dense source × lang grid (zero counts
    included), the final division is one row-local quantized double.

    Scale: (source, lang) partial agg; the dense grid is
    |sources|·|langs| rows (bounded); the cum window partitions per
    source over the ≤ |langs| frame.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.coalesce("source", F.lit("")).alias("g"),
        F.coalesce("lang", F.lit("")).alias("lang"),
    )
    cnt = d.groupBy("g", "lang").agg(
        F.count("*").cast("bigint").alias("c")
    )
    cnt = _q._persist_tracked(cnt)
    glob = cnt.groupBy("lang").agg(F.sum("c").cast("bigint").alias("cg"))
    srcs = cnt.groupBy("g").agg(F.sum("c").cast("bigint").alias("n_g"))
    tot = cnt.groupBy().agg(
        F.sum("c").cast("bigint").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("k"),
    )
    grid = (
        srcs.crossJoin(F.broadcast(glob))
        .join(cnt, ["g", "lang"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            "lang",
            "n_g",
            "n",
            "k",
            (
                F.coalesce(F.col("c"), F.lit(0)) * F.col("n")
                - F.col("cg") * F.col("n_g")
            ).alias("dev"),
        )
    )
    wcum = (
        Window.partitionBy("g")
        .orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.withColumn("cumdev", F.sum("dev").over(wcum))
    agg = cum.groupBy("g").agg(
        F.max("n_g").cast("bigint").alias("n_g"),
        F.sum(F.abs(F.col("cumdev"))).cast("bigint").alias("semd"),
        F.max("n").cast("bigint").alias("n"),
        F.max("k").cast("bigint").alias("k"),
    )
    return agg.select(
        F.col("g").alias("source"),
        "n_g",
        F.expr(
            """
            CASE WHEN k < 2 OR n_g = 0 THEN 0.0 ELSE
              CAST(floor(
                CAST(semd AS DOUBLE) / n / n_g / (k - 1) * 1e6 + 0.5
              ) AS BIGINT) / 1e6 END
            """
        ).alias("t_close"),
    ).orderBy("source")


ORACLE_T_CLOSENESS = """
WITH d AS (
  SELECT coalesce(source, '') AS g, coalesce(lang, '') AS lang
  FROM documents),
cnt AS (
  SELECT g, lang, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
lcnt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cg FROM cnt GROUP BY 1),
srcs AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM cnt GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(count(DISTINCT lang) AS BIGINT) AS k FROM cnt),
grid AS (
  SELECT s.g, gl.lang, s.n_g, t.n, t.k,
         coalesce(c.c, 0) * t.n - gl.cg * s.n_g AS dev
  FROM srcs s CROSS JOIN lcnt gl
  LEFT JOIN cnt c ON c.g = s.g AND c.lang = gl.lang
  CROSS JOIN tot t),
cum AS (
  SELECT g, n_g, n, k,
         sum(dev) OVER (PARTITION BY g ORDER BY lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumdev
  FROM grid),
agg AS (
  SELECT g, CAST(max(n_g) AS BIGINT) AS n_g,
         CAST(sum(abs(cumdev)) AS BIGINT) AS semd,
         CAST(max(n) AS BIGINT) AS n, CAST(max(k) AS BIGINT) AS k
  FROM cum GROUP BY g)
SELECT g AS source, n_g,
       CASE WHEN k < 2 OR n_g = 0 THEN 0.0 ELSE
         CAST(floor(
           CAST(semd AS DOUBLE) / n / n_g / (k - 1) * 1e6 + 0.5
         ) AS BIGINT) / 1e6 END AS t_close
FROM agg ORDER BY source
"""


# ---------------------------------------------------------------------------
# horvitz_thompson — design-based token-total estimation
# ---------------------------------------------------------------------------


def q_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz–Thompson token-total estimate per source under a
    deterministic Lehmer-hash Poisson design: u = (doc_id·48271) mod
    (2³¹−1); π = 1/5 (u mod 10 < 2) for even-length source names,
    π = 1/2 (u mod 10 < 5) for odd — so the HT weight 1/π is the
    exact integer 5 or 2 and the estimator stays BIGINT-exact.

    Scale: inclusion test + weight fold into the map-side projection
    (the sample never materializes); one per-source partial agg.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.coalesce("source", F.lit("")).alias("g"),
        F.expr(_TOKN).cast("bigint").alias("tok"),
        F.expr(
            f"(CAST(doc_id AS BIGINT) * {_HT_A}) % {_HT_M}"
        ).alias("u"),
    )
    flagged = d.select(
        "g",
        "tok",
        F.expr(
            """
            CASE WHEN length(g) % 2 = 0
                 THEN CASE WHEN u % 10 < 2 THEN 5 ELSE 0 END
                 ELSE CASE WHEN u % 10 < 5 THEN 2 ELSE 0 END
            END
            """
        ).cast("bigint").alias("w"),
    )
    agg = flagged.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.expr("CASE WHEN w > 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_sampled"),
        F.max(F.expr("CASE WHEN length(g) % 2 = 0 THEN 5 ELSE 2 END"))
        .cast("bigint")
        .alias("ht_weight"),
        F.sum(F.expr("w * tok")).cast("bigint").alias("est_tokens"),
        F.sum("tok").cast("bigint").alias("true_tokens"),
    )
    return agg.select(
        F.col("g").alias("source"),
        "n_docs",
        "n_sampled",
        "ht_weight",
        "est_tokens",
        "true_tokens",
        F.expr(
            """
            CASE WHEN true_tokens = 0 THEN 0.0 ELSE
              CAST(floor(
                (est_tokens - true_tokens)
                / CAST(true_tokens AS DOUBLE) * 1e6 + 0.5
              ) AS BIGINT) / 1e6 END
            """
        ).alias("rel_err"),
    ).orderBy("source")


ORACLE_HORVITZ_THOMPSON = f"""
WITH d AS (
  SELECT coalesce(source, '') AS g,
         CAST({_TOKN_DUCK} AS BIGINT) AS tok,
         (CAST(doc_id AS BIGINT) * {_HT_A}) % {_HT_M} AS u
  FROM documents),
flagged AS (
  SELECT g, tok,
         CAST(CASE WHEN length(g) % 2 = 0
              THEN CASE WHEN u % 10 < 2 THEN 5 ELSE 0 END
              ELSE CASE WHEN u % 10 < 5 THEN 2 ELSE 0 END
         END AS BIGINT) AS w
  FROM d),
agg AS (
  SELECT g,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled,
         CAST(max(CASE WHEN length(g) % 2 = 0 THEN 5 ELSE 2 END)
           AS BIGINT) AS ht_weight,
         CAST(sum(w * tok) AS BIGINT) AS est_tokens,
         CAST(sum(tok) AS BIGINT) AS true_tokens
  FROM flagged GROUP BY g)
SELECT g AS source, n_docs, n_sampled, ht_weight, est_tokens,
       true_tokens,
       CASE WHEN true_tokens = 0 THEN 0.0 ELSE
         CAST(floor(
           (est_tokens - true_tokens)
           / CAST(true_tokens AS DOUBLE) * 1e6 + 0.5
         ) AS BIGINT) / 1e6 END AS rel_err
FROM agg ORDER BY source
"""


PRIVACY2_QUERIES = {
    "yule_k": q_yule_k,
    "cochran_q": q_cochran_q,
    "entropy_ldiversity": q_entropy_ldiversity,
    "t_closeness": q_t_closeness,
    "horvitz_thompson": q_horvitz_thompson,
}

PRIVACY2_ORACLES = {
    "yule_k": ORACLE_YULE_K,
    "cochran_q": ORACLE_COCHRAN_Q,
    "entropy_ldiversity": ORACLE_ENTROPY_LDIVERSITY,
    "t_closeness": ORACLE_T_CLOSENESS,
    "horvitz_thompson": ORACLE_HORVITZ_THOMPSON,
}

_q.QUERIES.update(PRIVACY2_QUERIES)
_q.ORACLES.update(PRIVACY2_ORACLES)
