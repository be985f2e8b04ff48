"""A/B-experimentation & ranking-eval catalog, round 4 (wave 55):
five operators around the decisions an experimentation platform makes
over the event stream and the retrieval stack —

* ``diff_in_diff`` — the 2×2 difference-in-differences readout:
  users hashed into treated/control, the event range split at its
  midpoint into pre/post, per-(variant, period) mean per-user spend
  in micro-units, and DiD = (T_post − T_pre) − (C_post − C_pre)
  computed on the four quantized cell means (exact integer
  arithmetic).  The causal companion to ``cuped_adjustment``
  (which de-noises one period; this one nets out the level shift).
* ``srm_check`` — sample-ratio-mismatch guardrail: users hashed
  into ``_SRM_K`` buckets, χ² goodness-of-fit against the uniform
  split from exact integer deviations (χ² = Σ(K·o−n)²/(K·n)), and
  the detect flag vs the α=0.001 critical value every SRM monitor
  alarms on.  The assignment-integrity companion to
  ``two_prop_power``.
* ``cohens_d`` — standardized effect size between the two hash
  variants on per-user total spend: pooled-SD Cohen's d plus the
  small-sample Hedges' g = J·d with J = 1 − 3/(4·df − 1), all from
  one conditional moment scan.  The magnitude companion to
  ``welch_ttest`` (which asks "is it real?"; this one asks "is it
  big?").
* ``sprt_conversion`` — Wald's sequential probability ratio test on
  the daily purchase share of the view+purchase stream: cumulative
  LLR_t = C_t·ln(p₁/p₀) + (N_t−C_t)·ln((1−p₁)/(1−p₀)) against the
  ±ln((1−β)/α) boundaries (α=β=0.05), one row per day with the
  running decision.  The early-stopping companion to
  ``sequential_msprt``-style monitors the catalog lacked.
* ``avg_precision_eval`` — MAP harness for the pure-tf lexical
  ranker: for each of the ``_AP_Q`` highest-df query terms, rank by
  raw tf (the no-idf, no-length-norm baseline), grade the top
  ``_AP_K`` against the shared relevance rule (tf ≥ 2 AND
  lang = 'en'), AP@K = Σ rel_r·P@r / min(n_rel, K) with every P@r
  kept exact by scaling through L = lcm(1..K).  The
  average-precision companion to ``ndcg_eval`` (graded-rank) and
  ``mrr_at_k`` (first-hit) — and a baseline the BM25 numbers can be
  read against.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_abtest_wave.py.

Cross-engine float policy: ``diff_in_diff`` and ``srm_check`` are
exact-integer end-to-end (cell means / χ² half-up-quantized via
integer DIV on DECIMAL(38,0) sums); ``sprt_conversion`` inlines the
four log-constants as Python-pre-rounded nano-unit BIGINTs (the
_RBO_W doctrine — no libm ln engine-side), so every LLR is an exact
integer sum; ``avg_precision_eval`` scales each precision P@r by
L = lcm(1..K) so the AP numerator is an exact integer before one
half-up micro division; ``cohens_d`` follows the welch doctrine —
exact DECIMAL moments, one identical IEEE expression tree on exact
doubles, round-half-up-to-6 surfaces.

Scale notes: the three user-level ops are one events shuffle to
per-user partial aggs plus a ≤K-row (or 1-row) reduce — the driver
sees a handful of numbers at any corpus size; ``sprt_conversion``
collapses to the ≤#days frame before its only window;
``avg_precision_eval`` reuses the single-tokenize-pass postings
lineage and its ranking window partitions per term (≤ _AP_Q frames,
never global).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

_DID_SALT = "did"
_SRM_SALT = "srm"
_CD_SALT = "cd"
_SRM_K = 4
# chi2(df=3) critical value at alpha = 0.001 (the SRM alarm level),
# micro-units, pre-rounded: 16.266236
_SRM_CRIT_MICRO = 16_266_236

# Wald SPRT constants for H0: p = 0.4 vs H1: p = 0.5, alpha = beta =
# 0.05, nano-units, pre-rounded in Python (no libm ln engine-side):
_SPRT_LA = int(round(math.log(0.5 / 0.4) * 1e9))  # 223143551
_SPRT_LB = int(round(math.log(0.5 / 0.6) * 1e9))  # -182321557
_SPRT_UPPER = int(round(math.log(19.0) * 1e9))  # ln((1-b)/a) = 2944438979
_SPRT_LOWER = -_SPRT_UPPER  # ln(b/(1-a))

_AP_Q = 12
_AP_K = 20
_AP_REL_TF = 2  # relevance rule shared with ndcg_eval / hard_negatives
_AP_REL_LANG = "en"
_AP_L = math.lcm(*range(1, _AP_K + 1))  # 232792560: every P@r exact
_AP_WR = {r: _AP_L // r for r in range(1, _AP_K + 1)}
_AP_GAIN_CASE = (
    "CASE WHEN rel = 0 THEN 0 "
    + " ".join(f"WHEN rnk = {r} THEN crel * {w}" for r, w in _AP_WR.items())
    + " END"
)


def _h16(dialect: str, salt: str) -> str:
    """Portable first-16-bit md5 hash of user_id with a per-op salt —
    the same pure-string-decode construction every sampling entry in
    the catalog uses (no engine hash function is shared between Spark
    and DuckDB)."""
    pos = "instr" if dialect == "spark" else "strpos"
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    m = f"md5(CAST(user_id AS {cast}) || ':{salt}')"
    return (
        f"(((({pos}('0123456789abcdef', substr({m}, 1, 1)) - 1) * 16"
        f" + ({pos}('0123456789abcdef', substr({m}, 2, 1)) - 1)) * 16"
        f" + ({pos}('0123456789abcdef', substr({m}, 3, 1)) - 1)) * 16"
        f" + ({pos}('0123456789abcdef', substr({m}, 4, 1)) - 1))"
    )


def _ev_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("v_micro"),
    )


# ---------------------------------------------------------------------------
# diff_in_diff
# ---------------------------------------------------------------------------


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 difference-in-differences on per-user spend.

    Variant = hash16(user_id, ':did') mod 2 (1 = treated); period
    split at the midpoint of the event time range (the CUPED rule);
    a user contributes to a (variant, period) cell iff they have ≥1
    event in that period; each cell mean is the half-up integer
    division of the exact micro sum; DiD subtracts the four QUANTIZED
    means, so the headline number is exact integer arithmetic.

    Scale: one events shuffle to (user, period), a 4-group partial
    agg, and a 1-row conditional pivot — driver sees nine integers.
    """
    ev = _ev_micro(spark, sf_dir)
    span = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t0"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t1"),
    )
    per_cell = (
        ev.crossJoin(F.broadcast(span))
        .withColumn(
            "is_pre",
            F.unix_micros(F.col("ts").cast("timestamp")) * 2
            <= F.col("t0") + F.col("t1"),
        )
        .groupBy("user_id", "is_pre")
        .agg(F.sum("v_micro").alias("u_sum"))
        .withColumn("variant", F.expr(_h16("spark", _DID_SALT)) % 2)
        .groupBy("variant", "is_pre")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(F.col("u_sum").cast("decimal(38,0)")).alias("cell_sum"),
        )
        .select(
            "variant",
            "is_pre",
            "n_users",
            F.expr("CAST((2 * cell_sum + n_users) DIV (2 * n_users) AS BIGINT)")
            .alias("cell_mean_micro"),
        )
    )
    pivot = per_cell.groupBy().agg(
        *[
            F.max(
                F.when(
                    (F.col("variant") == v) & (F.col("is_pre") == pre),
                    F.col(c),
                )
            )
            .cast("long")
            .alias(f"{name}_{c.split('_')[0] if c == 'n_users' else 'mean'}")
            for v, pre, name in [
                (1, True, "t_pre"),
                (1, False, "t_post"),
                (0, True, "c_pre"),
                (0, False, "c_post"),
            ]
            for c in ("n_users", "cell_mean_micro")
        ]
    )
    return pivot.selectExpr(
        "t_pre_n AS n_t_pre",
        "t_post_n AS n_t_post",
        "c_pre_n AS n_c_pre",
        "c_post_n AS n_c_post",
        "t_pre_mean AS t_pre_mean_micro",
        "t_post_mean AS t_post_mean_micro",
        "c_pre_mean AS c_pre_mean_micro",
        "c_post_mean AS c_post_mean_micro",
        "(t_post_mean - t_pre_mean) - (c_post_mean - c_pre_mean)"
        " AS did_micro",
    )


ORACLE_DIFF_IN_DIFF = f"""
WITH ev AS (
  SELECT user_id, ts,
         CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS v_micro
  FROM events),
span AS (SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM ev),
cells AS (
  SELECT user_id, epoch_us(ts) * 2 <= s.t0 + s.t1 AS is_pre,
         sum(v_micro) AS u_sum
  FROM ev, span s GROUP BY 1, 2),
agg AS (
  SELECT ({_h16("duck", _DID_SALT)}) % 2 AS variant, is_pre,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CAST(u_sum AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS cell_sum
  FROM cells GROUP BY 1, 2),
cellm AS (
  SELECT variant, is_pre, n_users,
         CAST(CAST(2 * cell_sum + n_users AS HUGEINT)
              // CAST(2 * n_users AS HUGEINT) AS BIGINT)
           AS cell_mean_micro
  FROM agg),
p AS (
  SELECT
    CAST(max(CASE WHEN variant = 1 AND is_pre THEN n_users END) AS BIGINT) AS n_t_pre,
    CAST(max(CASE WHEN variant = 1 AND NOT is_pre THEN n_users END) AS BIGINT) AS n_t_post,
    CAST(max(CASE WHEN variant = 0 AND is_pre THEN n_users END) AS BIGINT) AS n_c_pre,
    CAST(max(CASE WHEN variant = 0 AND NOT is_pre THEN n_users END) AS BIGINT) AS n_c_post,
    CAST(max(CASE WHEN variant = 1 AND is_pre THEN cell_mean_micro END) AS BIGINT) AS t_pre_mean_micro,
    CAST(max(CASE WHEN variant = 1 AND NOT is_pre THEN cell_mean_micro END) AS BIGINT) AS t_post_mean_micro,
    CAST(max(CASE WHEN variant = 0 AND is_pre THEN cell_mean_micro END) AS BIGINT) AS c_pre_mean_micro,
    CAST(max(CASE WHEN variant = 0 AND NOT is_pre THEN cell_mean_micro END) AS BIGINT) AS c_post_mean_micro
  FROM cellm)
SELECT *,
       (t_post_mean_micro - t_pre_mean_micro)
       - (c_post_mean_micro - c_pre_mean_micro) AS did_micro
FROM p
"""


# ---------------------------------------------------------------------------
# srm_check
# ---------------------------------------------------------------------------


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch χ² over {_SRM_K} hash buckets.

    Distinct users only (assignment is per-user, not per-event);
    χ² = Σ(K·o_k − n)² / (K·n) kept exact in DECIMAL(38,0) until one
    half-up micro division; srm_detected compares the quantized χ²
    against the pre-rounded α=0.001 critical value — both sides
    integers, so the flag can never flap across engines.

    Scale: one distinct-user shuffle + a 1-row conditional agg.
    """
    users = (
        _ev_micro(spark, sf_dir)
        .select("user_id")
        .distinct()
        .withColumn("variant", F.expr(_h16("spark", _SRM_SALT)) % _SRM_K)
    )
    counts = users.groupBy().agg(
        F.count("*").cast("long").alias("n_total"),
        *[
            F.sum(F.when(F.col("variant") == k, 1).otherwise(0))
            .cast("long")
            .alias(f"n_v{k}")
            for k in range(_SRM_K)
        ],
    )
    dev = " + ".join(
        f"(CAST({_SRM_K} AS DECIMAL(38,0)) * n_v{k} - n_total)"
        f" * (CAST({_SRM_K} AS DECIMAL(38,0)) * n_v{k} - n_total)"
        for k in range(_SRM_K)
    )
    return counts.selectExpr(
        "n_total",
        *[f"n_v{k}" for k in range(_SRM_K)],
        f"CAST((2000000 * ({dev}) + {_SRM_K} * n_total)"
        f" DIV (2 * {_SRM_K} * n_total) AS BIGINT) AS chi2_micro",
    ).selectExpr(
        "*",
        f"chi2_micro > {_SRM_CRIT_MICRO} AS srm_detected",
    )


_SRM_DEV_DUCK = " + ".join(
    f"(CAST({_SRM_K} AS DECIMAL(38,0)) * n_v{k} - n_total)"
    f" * (CAST({_SRM_K} AS DECIMAL(38,0)) * n_v{k} - n_total)"
    for k in range(_SRM_K)
)

ORACLE_SRM_CHECK = f"""
WITH u AS (
  SELECT user_id, ({_h16("duck", _SRM_SALT)}) % {_SRM_K} AS variant
  FROM (SELECT DISTINCT user_id FROM events)),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         {", ".join(f"CAST(sum(CASE WHEN variant = {k} THEN 1 ELSE 0 END) AS BIGINT) AS n_v{k}" for k in range(_SRM_K))}
  FROM u)
SELECT n_total, {", ".join(f"n_v{k}" for k in range(_SRM_K))},
       CAST(CAST(2000000 * ({_SRM_DEV_DUCK}) + {_SRM_K} * n_total AS HUGEINT)
            // CAST(2 * {_SRM_K} * n_total AS HUGEINT) AS BIGINT)
         AS chi2_micro,
       CAST(CAST(2000000 * ({_SRM_DEV_DUCK}) + {_SRM_K} * n_total AS HUGEINT)
            // CAST(2 * {_SRM_K} * n_total AS HUGEINT) AS BIGINT)
         > {_SRM_CRIT_MICRO} AS srm_detected
FROM c
"""


# ---------------------------------------------------------------------------
# cohens_d
# ---------------------------------------------------------------------------


def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g between the two hash variants on
    per-user total spend (micro-units).

    Pooled SD from exact DECIMAL moment sums:
    s_p² = ((n₀−1)s₀² + (n₁−1)s₁²)/(n₀+n₁−2); J = 1 − 3/(4·df − 1).
    Both engines evaluate the identical IEEE tree on exact-integer
    doubles (welch doctrine); surfaces round half-up to 6.

    Scale: one per-user shuffle + a 1-row conditional moment agg.
    """
    per_user = (
        _ev_micro(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.sum("v_micro").alias("u_sum"))
        .withColumn("variant", F.expr(_h16("spark", _CD_SALT)) % 2)
    )
    x = F.col("u_sum").cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    is_t = F.col("variant") == 1
    m = per_user.agg(
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(is_t, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(~is_t, x).otherwise(zero)).alias("s_c"),
        F.sum(F.when(is_t, x).otherwise(zero)).alias("s_t"),
        F.sum(F.when(~is_t, x * x).otherwise(zero)).alias("ss_c"),
        F.sum(F.when(is_t, x * x).otherwise(zero)).alias("ss_t"),
    )
    mid = m.selectExpr(
        "n_c",
        "n_t",
        "CAST(s_c AS DOUBLE) / n_c AS mean_c",
        "CAST(s_t AS DOUBLE) / n_t AS mean_t",
        "(CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / n_c)"
        " AS css_c",
        "(CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / n_t)"
        " AS css_t",
    )
    return mid.selectExpr(
        "n_c",
        "n_t",
        "round(mean_c / 1e6, 6) AS mean_c_unit",
        "round(mean_t / 1e6, 6) AS mean_t_unit",
        "round((mean_t - mean_c)"
        " / sqrt((css_c + css_t) / nullif(n_c + n_t - 2, 0)), 6) AS d",
        "round((1.0 - 3.0 / (4.0 * (n_c + n_t - 2) - 1))"
        " * (mean_t - mean_c)"
        " / sqrt((css_c + css_t) / nullif(n_c + n_t - 2, 0)), 6) AS g",
    )


ORACLE_COHENS_D = f"""
WITH pu AS (
  SELECT user_id,
         sum(CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT))
           AS u_sum,
         ({_h16("duck", _CD_SALT)}) % 2 AS variant
  FROM events GROUP BY user_id),
m AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         sum(CASE WHEN variant = 0 THEN CAST(u_sum AS DECIMAL(38,0)) ELSE 0 END) AS s_c,
         sum(CASE WHEN variant = 1 THEN CAST(u_sum AS DECIMAL(38,0)) ELSE 0 END) AS s_t,
         sum(CASE WHEN variant = 0
                  THEN CAST(u_sum AS DECIMAL(38,0)) * CAST(u_sum AS DECIMAL(38,0))
                  ELSE 0 END) AS ss_c,
         sum(CASE WHEN variant = 1
                  THEN CAST(u_sum AS DECIMAL(38,0)) * CAST(u_sum AS DECIMAL(38,0))
                  ELSE 0 END) AS ss_t
  FROM pu),
mid AS (
  SELECT n_c, n_t,
         CAST(s_c AS DOUBLE) / n_c AS mean_c,
         CAST(s_t AS DOUBLE) / n_t AS mean_t,
         (CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / n_c)
           AS css_c,
         (CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / n_t)
           AS css_t
  FROM m)
SELECT n_c, n_t,
       round(mean_c / 1e6, 6) AS mean_c_unit,
       round(mean_t / 1e6, 6) AS mean_t_unit,
       round((mean_t - mean_c)
             / sqrt((css_c + css_t) / nullif(n_c + n_t - 2, 0)), 6) AS d,
       round((1.0 - 3.0 / (4.0 * (n_c + n_t - 2) - 1))
             * (mean_t - mean_c)
             / sqrt((css_c + css_t) / nullif(n_c + n_t - 2, 0)), 6) AS g
FROM mid
"""


# ---------------------------------------------------------------------------
# sprt_conversion
# ---------------------------------------------------------------------------


def q_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT on the daily purchase share of the view+purchase
    stream: H0 p=0.4 vs H1 p=0.5, α=β=0.05.

    LLR_t = C_t·{_SPRT_LA} + (N_t−C_t)·({_SPRT_LB}) in nano-units
    (constants pre-rounded in Python); decision crosses the
    ±{_SPRT_UPPER} boundaries.  One row per day with the cumulative
    trial/conversion counts, the exact-integer LLR, and the running
    decision — the full monitoring trace, not just the verdict.

    Scale: the event scan collapses to the ≤#days frame first; the
    only window orders that frame (a few hundred rows at any SF).
    """
    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            F.col("ts").cast("date").alias("day"),
            (F.col("event_type") == "purchase").cast("long").alias("conv"),
        )
        .groupBy("day")
        .agg(
            F.count("*").alias("n_day"),
            F.sum("conv").alias("c_day"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("n_day").over(w).cast("long").alias("n_cum"),
        F.sum("c_day").over(w).cast("long").alias("c_cum"),
    )
    return cum.selectExpr(
        "day",
        "n_cum",
        "c_cum",
        f"c_cum * CAST({_SPRT_LA} AS BIGINT)"
        f" + (n_cum - c_cum) * CAST({_SPRT_LB} AS BIGINT) AS llr_nano",
    ).selectExpr(
        "*",
        f"CASE WHEN llr_nano >= {_SPRT_UPPER} THEN 'accept_h1'"
        f" WHEN llr_nano <= {_SPRT_LOWER} THEN 'accept_h0'"
        " ELSE 'continue' END AS decision",
    )


ORACLE_SPRT_CONVERSION = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_day,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_day
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
cum AS (
  SELECT day,
         CAST(sum(n_day) OVER (ORDER BY day) AS BIGINT) AS n_cum,
         CAST(sum(c_day) OVER (ORDER BY day) AS BIGINT) AS c_cum
  FROM daily)
SELECT day, n_cum, c_cum,
       c_cum * CAST({_SPRT_LA} AS BIGINT)
       + (n_cum - c_cum) * CAST({_SPRT_LB} AS BIGINT) AS llr_nano,
       CASE WHEN c_cum * CAST({_SPRT_LA} AS BIGINT)
                 + (n_cum - c_cum) * CAST({_SPRT_LB} AS BIGINT)
                 >= {_SPRT_UPPER} THEN 'accept_h1'
            WHEN c_cum * CAST({_SPRT_LA} AS BIGINT)
                 + (n_cum - c_cum) * CAST({_SPRT_LB} AS BIGINT)
                 <= {_SPRT_LOWER} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
"""


# ---------------------------------------------------------------------------
# avg_precision_eval
# ---------------------------------------------------------------------------


def q_avg_precision_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP harness for the pure-tf ranker: for each of the {_AP_Q}
    highest-df terms, rank documents by raw tf (desc, doc_id asc) and
    grade the top {_AP_K} with AP@K against rel ⇔ tf ≥ {_AP_REL_TF}
    AND lang = '{_AP_REL_LANG}' (the judgment rule shared with
    ``ndcg_eval``).

    Every P@r = cumrel_r/r is kept exact by scaling through
    L = lcm(1..{_AP_K}) = {_AP_L}: gain_r = rel_r·cumrel_r·(L/r) is an
    integer, AP = Σgain / (L·min(n_rel, K)) is one half-up micro
    division on DECIMAL sums.  n_rel = 0 terms yield NULL ap_micro
    via nullif on both engines.

    Scale: one tokenize pass builds the postings (release-tracked
    cache shared across the df / label / ranking reads); scoring
    touches only the ≤ _AP_Q broadcast query terms' postings; the
    ranking window partitions per term.
    """
    postings = _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfc = postings.groupBy("tok").agg(F.count("*").alias("df"))
    qterms = dfc.orderBy(F.col("df").desc(), "tok").limit(_AP_Q)
    lang_tbl = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = (
        postings.join(F.broadcast(qterms), "tok")
        .join(lang_tbl, "doc_id")
        .select(
            "tok",
            "doc_id",
            "tf",
            (
                (F.col("tf") >= _AP_REL_TF)
                & (F.col("lang") == _AP_REL_LANG)
            )
            .cast("bigint")
            .alias("rel"),
        )
    )
    w = Window.partitionBy("tok").orderBy(F.col("tf").desc(), "doc_id")
    wc = (
        Window.partitionBy("tok")
        .orderBy(F.col("tf").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .withColumn("crel", F.sum("rel").over(wc))
        .where(F.col("rnk") <= _AP_K)
        .groupBy("tok")
        .agg(
            F.coalesce(
                F.sum(F.expr(_AP_GAIN_CASE).cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("gain"),
            F.sum("rel").cast("long").alias("n_ret_rel"),
        )
    )
    nrel = scored.groupBy("tok").agg(F.sum("rel").alias("n_rel"))
    graded = topk.join(nrel, "tok", "left").withColumn(
        "n_rel", F.coalesce("n_rel", F.lit(0)).cast("long")
    )
    return graded.selectExpr(
        "tok",
        "n_rel",
        "n_ret_rel",
        f"CAST((2000000 * gain"
        f" + nullif(CAST({_AP_L} AS DECIMAL(38,0)) * least(n_rel, {_AP_K}), 0))"
        f" DIV nullif(2 * CAST({_AP_L} AS DECIMAL(38,0))"
        f" * least(n_rel, {_AP_K}), 0) AS BIGINT) AS ap_micro",
    )


ORACLE_AVG_PRECISION_EVAL = f"""
WITH postings AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok),
dfs AS (SELECT tok, count(*) AS df FROM postings GROUP BY tok),
q AS (SELECT tok FROM dfs ORDER BY df DESC, tok LIMIT {_AP_Q}),
scored AS (
  SELECT p.tok, p.doc_id, p.tf,
         CASE WHEN p.tf >= {_AP_REL_TF} AND d.lang = '{_AP_REL_LANG}'
              THEN 1 ELSE 0 END AS rel
  FROM postings p JOIN q USING (tok)
  JOIN documents d ON p.doc_id = d.doc_id),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY tok ORDER BY tf DESC, doc_id) AS rnk,
         sum(rel) OVER (PARTITION BY tok ORDER BY tf DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS crel
  FROM scored),
topk AS (
  SELECT tok,
         CAST(coalesce(sum(CAST({_AP_GAIN_CASE} AS DECIMAL(38,0))), 0)
              AS DECIMAL(38,0)) AS gain,
         CAST(sum(rel) AS BIGINT) AS n_ret_rel
  FROM ranked WHERE rnk <= {_AP_K} GROUP BY tok),
nrel AS (SELECT tok, CAST(sum(rel) AS BIGINT) AS n_rel FROM scored GROUP BY tok)
SELECT t.tok,
       coalesce(n.n_rel, 0) AS n_rel,
       t.n_ret_rel,
       CAST(CAST(2000000 * t.gain
                 + nullif(CAST({_AP_L} AS HUGEINT)
                          * least(coalesce(n.n_rel, 0), {_AP_K}), 0)
                 AS HUGEINT)
            // nullif(2 * CAST({_AP_L} AS HUGEINT)
                      * least(coalesce(n.n_rel, 0), {_AP_K}), 0)
            AS BIGINT) AS ap_micro
FROM topk t LEFT JOIN nrel n ON t.tok = n.tok
"""


ABTEST_QUERIES = {
    "diff_in_diff": q_diff_in_diff,
    "srm_check": q_srm_check,
    "cohens_d": q_cohens_d,
    "sprt_conversion": q_sprt_conversion,
    "avg_precision_eval": q_avg_precision_eval,
}

ABTEST_ORACLES = {
    "diff_in_diff": ORACLE_DIFF_IN_DIFF,
    "srm_check": ORACLE_SRM_CHECK,
    "cohens_d": ORACLE_COHENS_D,
    "sprt_conversion": ORACLE_SPRT_CONVERSION,
    "avg_precision_eval": ORACLE_AVG_PRECISION_EVAL,
}

_q.QUERIES.update(ABTEST_QUERIES)
_q.ORACLES.update(ABTEST_ORACLES)
