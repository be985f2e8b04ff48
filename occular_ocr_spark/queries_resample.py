"""Resampling-inference catalog, round 4 (wave 66): five operators
that replay the permutation/jackknife toolbox a data platform uses to
attach significance to corpus metrics WITHOUT distributional
assumptions — all randomness replaced by the portable salted-md5
hash, so every replicate is deterministic and identical on both
engines.

* ``signflip_paired_test`` — paired sign-flip test of per-user
  click-minus-view counts: K={_SF_K} deterministic ±1 flip vectors,
  T_k = Σ s_ik·d_i, two-sided p = #{{|T_k| ≥ |T_obs|}}/K in half-up
  micro.
* ``randomization_label_test`` — two-group (lang='{_LANG_A}' vs
  rest) mean-difference randomization test: K={_RL_K} hash
  relabelings preserving the group share in expectation (the
  binomial-relabel variant, documented), each replicate's diff an
  exact pair of half-up micro means.
* ``jackknife_groups`` — delete-one-lang grouped jackknife of the
  corpus mean length: per-group pseudo-values g·θ̂ - (g-1)·θ̂₋ⱼ in
  exact micro, plus the jackknife variance in micro².
* ``energy_distance`` — Székely's E-statistic 2·E|X-Y| - E|X-X'| -
  E|Y-Y'| between '{_LANG_A}' and the rest, every pair sum exact via
  the sorted-rank identity (within groups) and the value-histogram
  prefix trick (cross term) — no pair materialization anywhere.
* ``ansari_bradley`` — the Ansari-Bradley scale test (tie-broken
  variant, documented): both-ends scores min(rk, n+1-rk) on the
  (value, doc_id) total order, group-A score sum vs its exact
  finite-population null mean.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_resample_wave.py.

Cross-engine float policy: exact integers end-to-end; the only
divisions are half-up micro steps, mirrored verbatim in the oracle.

Scale notes: the K-replicate frames are K× one aggregated row per
(replicate, side) — partial aggs, never K copies of the corpus
beyond the map side; energy/AB use rank windows over value
histograms (≤ #distinct values; the two-level rank idiom documented
at group_quantiles_dist scales the window itself).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_SF_K = 64
_RL_K = 64
_LANG_A = "en"


def _h_spark(expr: str) -> str:
    return (
        f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    )


def _h_sql(expr: str) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# signflip_paired_test
# ---------------------------------------------------------------------------


def q_signflip_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic paired sign-flip test on per-user
    (clicks - views); flips from md5('f:k:user') parity.

    Scale: the user frame is #users rows; the K replicates crossJoin
    THAT bounded frame (not the raw events), then partial-agg per k.
    """
    d = _q._persist_tracked(
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN event_type = 'click' THEN 1"
                    " WHEN event_type = 'view' THEN -1 ELSE 0 END"
                )
            ).cast("long").alias("d")
        )
    )
    obs = d.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("d").cast("long").alias("t_obs"),
    )
    ks = spark.range(0, _SF_K).selectExpr("CAST(id AS INT) AS k")
    flips = (
        ks.crossJoin(d)
        .selectExpr(
            "k",
            "CASE WHEN "
            + _h_spark("concat('f:', CAST(k AS STRING), ':',"
                       " CAST(user_id AS STRING))")
            + " % 2 = 0 THEN d ELSE -d END AS sd",
        )
        .groupBy("k")
        .agg(F.sum("sd").cast("long").alias("t_k"))
    )
    return (
        flips.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_users").cast("long").alias("n_users"),
            F.max("t_obs").cast("long").alias("t_obs"),
            F.count("*").cast("long").alias("k_flips"),
            F.sum(
                F.expr("CASE WHEN abs(t_k) >= abs(t_obs) THEN 1 ELSE 0 END")
            ).cast("long").alias("n_extreme"),
        )
        .selectExpr(
            "n_users",
            "t_obs",
            "k_flips",
            "n_extreme",
            "CAST((2000000 * n_extreme + k_flips) DIV (2 * k_flips)"
            " AS BIGINT) AS p_micro",
        )
    )


ORACLE_SIGNFLIP_PAIRED_TEST = f"""
WITH d AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1
                       WHEN event_type = 'view' THEN -1 ELSE 0 END)
              AS BIGINT) AS d
  FROM events GROUP BY user_id),
obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(d) AS BIGINT) AS t_obs FROM d),
ks AS (SELECT unnest(generate_series(0, {_SF_K - 1})) AS k),
flips AS (
  SELECT k.k,
         CAST(sum(CASE WHEN {_h_sql(
             "'f:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.user_id AS VARCHAR)"
         )} % 2 = 0 THEN d.d ELSE -d.d END) AS BIGINT) AS t_k
  FROM ks k CROSS JOIN d GROUP BY k.k)
SELECT o.n_users, o.t_obs,
       CAST(count(*) AS BIGINT) AS k_flips,
       CAST(sum(CASE WHEN abs(f.t_k) >= abs(o.t_obs) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme,
       CAST((2000000 * sum(CASE WHEN abs(f.t_k) >= abs(o.t_obs)
                 THEN 1 ELSE 0 END) + count(*))
            // (2 * count(*)) AS BIGINT) AS p_micro
FROM flips f CROSS JOIN obs o
GROUP BY o.n_users, o.t_obs
"""


# ---------------------------------------------------------------------------
# randomization_label_test
# ---------------------------------------------------------------------------


def q_randomization_label_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binomial-relabel randomization test of mean n_chars between
    lang='{_LANG_A}' and the rest: replicate k assigns doc→A iff
    md5('r:k:doc') % 1e6 < the observed A-share (micro); each diff
    is an exact pair of half-up micro means.

    Scale: one share agg, then K partial aggs over the doc frame —
    map-side only; the replicate frame is K rows.
    """
    docs = _q._persist_tracked(
        _t(spark, sf_dir, "documents").selectExpr(
            "doc_id",
            "n_chars AS x",
            f"CASE WHEN lang = '{_LANG_A}' THEN 1 ELSE 0 END AS g",
        )
    )
    obs = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("g").cast("long").alias("n_a"),
        F.sum(F.expr("g * x")).cast("long").alias("sx_a"),
        F.sum("x").cast("long").alias("sx"),
    ).selectExpr(
        "n_docs",
        "n_a",
        "CAST((2000000 * n_a + n_docs) DIV (2 * n_docs) AS BIGINT)"
        " AS share_a_micro",
        "CAST((2000000 * sx_a + n_a) DIV (2 * n_a) AS BIGINT)"
        " - CAST((2000000 * (sx - sx_a) + (n_docs - n_a))"
        " DIV (2 * (n_docs - n_a)) AS BIGINT) AS diff_obs_micro",
    )
    ks = spark.range(0, _RL_K).selectExpr("CAST(id AS INT) AS k")
    reps = (
        ks.crossJoin(docs)
        .crossJoin(F.broadcast(obs.selectExpr("share_a_micro")))
        .selectExpr(
            "k",
            "x",
            "CASE WHEN "
            + _h_spark("concat('r:', CAST(k AS STRING), ':',"
                       " CAST(doc_id AS STRING))")
            + " % 1000000 < share_a_micro THEN 1 ELSE 0 END AS ga",
        )
        .groupBy("k")
        .agg(
            F.sum("ga").cast("long").alias("na_k"),
            F.sum(F.expr("ga * x")).cast("long").alias("sa_k"),
            F.count("*").cast("long").alias("n_k"),
            F.sum("x").cast("long").alias("s_k"),
        )
        .where("na_k > 0 AND na_k < n_k")
        .selectExpr(
            "k",
            "CAST((2000000 * sa_k + na_k) DIV (2 * na_k) AS BIGINT)"
            " - CAST((2000000 * (s_k - sa_k) + (n_k - na_k))"
            " DIV (2 * (n_k - na_k)) AS BIGINT) AS diff_k",
        )
    )
    return (
        reps.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_docs").cast("long").alias("n_docs"),
            F.max("n_a").cast("long").alias("n_a"),
            F.max("diff_obs_micro").cast("long").alias("diff_obs_micro"),
            F.count("*").cast("long").alias("k_reps"),
            F.sum(
                F.expr(
                    "CASE WHEN abs(diff_k) >= abs(diff_obs_micro)"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("long").alias("n_extreme"),
        )
        .selectExpr(
            "n_docs",
            "n_a",
            "diff_obs_micro",
            "k_reps",
            "n_extreme",
            "CAST((2000000 * n_extreme + k_reps) DIV (2 * k_reps)"
            " AS BIGINT) AS p_micro",
        )
    )


ORACLE_RANDOMIZATION_LABEL_TEST = f"""
WITH docs AS (
  SELECT doc_id, n_chars AS x,
         CASE WHEN lang = '{_LANG_A}' THEN 1 ELSE 0 END AS g
  FROM documents),
obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(g) AS BIGINT) AS n_a,
         CAST((2000000 * sum(g) + count(*)) // (2 * count(*)) AS BIGINT)
           AS share_a_micro,
         CAST((2000000 * sum(g * x) + sum(g)) // (2 * sum(g)) AS BIGINT)
           - CAST((2000000 * (sum(x) - sum(g * x))
                   + (count(*) - sum(g)))
                  // (2 * (count(*) - sum(g))) AS BIGINT)
           AS diff_obs_micro
  FROM docs),
ks AS (SELECT unnest(generate_series(0, {_RL_K - 1})) AS k),
reps AS (
  SELECT k.k,
         CAST((2000000 * sum(CASE WHEN {_h_sql(
             "'r:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
         )} % 1000000 < o.share_a_micro THEN d.x ELSE 0 END)
               + sum(CASE WHEN {_h_sql(
             "'r:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
         )} % 1000000 < o.share_a_micro THEN 1 ELSE 0 END))
              // (2 * sum(CASE WHEN {_h_sql(
             "'r:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
         )} % 1000000 < o.share_a_micro THEN 1 ELSE 0 END)) AS BIGINT)
         - CAST((2000000 * sum(CASE WHEN {_h_sql(
             "'r:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
         )} % 1000000 < o.share_a_micro THEN 0 ELSE d.x END)
               + sum(CASE WHEN {_h_sql(
             "'r:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
         )} % 1000000 < o.share_a_micro THEN 0 ELSE 1 END))
              // (2 * sum(CASE WHEN {_h_sql(
             "'r:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
         )} % 1000000 < o.share_a_micro THEN 0 ELSE 1 END)) AS BIGINT)
           AS diff_k,
         CAST(sum(CASE WHEN {_h_sql(
             "'r:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
         )} % 1000000 < o.share_a_micro THEN 1 ELSE 0 END) AS BIGINT)
           AS na_k,
         CAST(count(*) AS BIGINT) AS n_k
  FROM ks k CROSS JOIN docs d CROSS JOIN obs o
  GROUP BY k.k)
SELECT o.n_docs, o.n_a, o.diff_obs_micro,
       CAST(count(*) AS BIGINT) AS k_reps,
       CAST(sum(CASE WHEN abs(r.diff_k) >= abs(o.diff_obs_micro)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST((2000000 * sum(CASE WHEN abs(r.diff_k) >=
                 abs(o.diff_obs_micro) THEN 1 ELSE 0 END) + count(*))
            // (2 * count(*)) AS BIGINT) AS p_micro
FROM reps r CROSS JOIN obs o
WHERE r.na_k > 0 AND r.na_k < r.n_k
GROUP BY o.n_docs, o.n_a, o.diff_obs_micro
"""


# ---------------------------------------------------------------------------
# jackknife_groups
# ---------------------------------------------------------------------------


def q_jackknife_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-lang jackknife of mean n_chars: pseudo-values
    g·θ̂ - (g-1)·θ̂₋ⱼ in exact micro; jackknife variance in micro²
    via Σ(p_j - p̄)² / (g(g-1)).

    Scale: one per-lang partial agg (g rows) carries everything —
    leave-one-out sums are total-minus-group arithmetic.
    """
    per = _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_j"),
            F.sum("n_chars").cast("long").alias("s_j"),
        )
    )
    tot = per.agg(
        F.count("*").cast("long").alias("g"),
        F.sum("n_j").cast("long").alias("n"),
        F.sum("s_j").cast("long").alias("s"),
    ).selectExpr(
        "g",
        "n",
        "s",
        "CAST((2000000 * s + n) DIV (2 * n) AS BIGINT) AS theta_micro",
    )
    pseudo = (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "lang",
            "n_j",
            "g",
            "theta_micro",
            "CAST((2000000 * (s - s_j) + (n - n_j)) DIV (2 * (n - n_j))"
            " AS BIGINT) AS theta_minus_micro",
        )
        .selectExpr(
            "lang",
            "n_j AS n_excluded",
            "g",
            "theta_micro",
            "theta_minus_micro",
            "g * theta_micro - (g - 1) * theta_minus_micro AS pseudo_micro",
        )
    )
    pseudo = _q._persist_tracked(pseudo)
    jk = pseudo.agg(
        F.sum("pseudo_micro").cast("long").alias("sp"),
        F.max("g").cast("long").alias("g2"),
    ).selectExpr(
        "CAST((2 * sp + g2) DIV (2 * g2) AS BIGINT) AS pbar", "g2"
    )
    varrow = (
        pseudo.crossJoin(F.broadcast(jk))
        .agg(
            F.max("pbar").cast("long").alias("pseudo_mean_micro"),
            F.expr(
                "CAST((2 * sum((pseudo_micro - pbar)"
                " * (pseudo_micro - pbar)) + max(g2) * (max(g2) - 1))"
                " DIV (2 * max(g2) * (max(g2) - 1)) AS BIGINT)"
            ).alias("jack_var_micro2"),
        )
    )
    return pseudo.crossJoin(F.broadcast(varrow)).selectExpr(
        "lang",
        "n_excluded",
        "theta_micro",
        "theta_minus_micro",
        "pseudo_micro",
        "pseudo_mean_micro",
        "jack_var_micro2",
    )


ORACLE_JACKKNIFE_GROUPS = """
WITH per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_j,
         CAST(sum(n_chars) AS BIGINT) AS s_j
  FROM documents GROUP BY lang),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS g,
         CAST(sum(n_j) AS BIGINT) AS n,
         CAST(sum(s_j) AS BIGINT) AS s,
         CAST((2000000 * sum(s_j) + sum(n_j)) // (2 * sum(n_j)) AS BIGINT)
           AS theta_micro
  FROM per),
pseudo AS (
  SELECT p.lang, p.n_j AS n_excluded, t.g, t.theta_micro,
         CAST((2000000 * (t.s - p.s_j) + (t.n - p.n_j))
              // (2 * (t.n - p.n_j)) AS BIGINT) AS theta_minus_micro
  FROM per p CROSS JOIN tot t),
pseudo2 AS (
  SELECT lang, n_excluded, g, theta_micro, theta_minus_micro,
         g * theta_micro - (g - 1) * theta_minus_micro AS pseudo_micro
  FROM pseudo),
jk AS (
  SELECT CAST((2 * sum(pseudo_micro) + max(g)) // (2 * max(g)) AS BIGINT)
           AS pbar,
         max(g) AS g2
  FROM pseudo2),
var AS (
  SELECT CAST((2 * sum((p.pseudo_micro - j.pbar)
               * (p.pseudo_micro - j.pbar)) + max(j.g2) * (max(j.g2) - 1))
              // (2 * max(j.g2) * (max(j.g2) - 1)) AS BIGINT)
           AS jack_var_micro2
  FROM pseudo2 p CROSS JOIN jk j)
SELECT p.lang, p.n_excluded, p.theta_micro, p.theta_minus_micro,
       p.pseudo_micro, j.pbar AS pseudo_mean_micro, v.jack_var_micro2
FROM pseudo2 p CROSS JOIN jk j CROSS JOIN var v
"""


# ---------------------------------------------------------------------------
# energy_distance
# ---------------------------------------------------------------------------


def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Székely energy distance between '{_LANG_A}' and the rest on
    n_chars: within-group pair sums via the sorted-rank identity,
    the cross sum via value-histogram prefix counts/sums of the
    OTHER group — O(n log n), zero pair frames.

    E_micro = 2·⌈1e6·S_AB/(nm)⌋ - ⌈1e6·2·S_AA/n²⌋ - ⌈1e6·2·S_BB/m²⌋
    (composition of half-ups, mirrored verbatim in the oracle).
    """
    docs = _q._persist_tracked(
        _t(spark, sf_dir, "documents").selectExpr(
            "doc_id",
            "n_chars AS x",
            f"CASE WHEN lang = '{_LANG_A}' THEN 1 ELSE 0 END AS g",
        )
    )
    within = (
        docs.selectExpr(
            "g",
            "x",
            "row_number() OVER (PARTITION BY g ORDER BY x, doc_id) AS rk",
            "count(*) OVER (PARTITION BY g) AS n",
        )
        .groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(F.expr("(2 * rk - n - 1) * x")).cast("long").alias("s_in"),
        )
    )
    # cross term: histogram by (value), prefix counts/sums of group B
    # below each A value and vice versa — one combined value ordering
    hist = docs.groupBy("x").agg(
        F.sum("g").cast("long").alias("ca"),
        F.sum(F.expr("1 - g")).cast("long").alias("cb"),
        F.sum(F.expr("g * x")).cast("long").alias("sa"),
        F.sum(F.expr("(1 - g) * x")).cast("long").alias("sb"),
    )
    pref = hist.selectExpr(
        "x",
        "ca",
        "cb",
        "coalesce(sum(cb) OVER (ORDER BY x"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS cb_less",
        "coalesce(sum(sb) OVER (ORDER BY x"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS sb_less",
    )
    totb = docs.where("g = 0").agg(
        F.count("*").cast("long").alias("mb"),
        F.sum("x").cast("long").alias("sxb"),
    )
    cross = (
        pref.crossJoin(F.broadcast(totb))
        .selectExpr(
            # for each A-value v (ca copies): sum_b |v-b| =
            #   cb_less*v - sb_less + (sxb - sb_less - (mb - cb_less)*v)
            #   + within-value ties contribute 0
            # equal-valued B entries sit in the >= suffix with
            # (b - v) = 0 contribution: (sxb - sb_less) includes
            # them at value v while (mb - cb_less)*v subtracts the
            # same v each — net zero, as |v - b| requires.
            "ca * (cb_less * x - sb_less"
            " + (sxb - sb_less) - (mb - cb_less) * x) AS contrib",
        )
        .agg(F.sum("contrib").cast("long").alias("s_ab"))
    )
    wa = within.where("g = 1").selectExpr(
        "n AS n_a", "s_in AS s_aa"
    )
    wb = within.where("g = 0").selectExpr(
        "n AS n_b", "s_in AS s_bb"
    )
    return (
        wa.crossJoin(wb)
        .crossJoin(cross)
        .selectExpr(
            "n_a",
            "n_b",
            "s_ab",
            "s_aa",
            "s_bb",
            "2 * CAST((2000000 * s_ab + n_a * n_b)"
            " DIV (2 * n_a * n_b) AS BIGINT)"
            " - CAST((2 * 2000000 * s_aa + n_a * n_a)"
            " DIV (2 * n_a * n_a) AS BIGINT)"
            " - CAST((2 * 2000000 * s_bb + n_b * n_b)"
            " DIV (2 * n_b * n_b) AS BIGINT) AS energy_micro",
        )
    )


ORACLE_ENERGY_DISTANCE = f"""
WITH docs AS (
  SELECT doc_id, n_chars AS x,
         CASE WHEN lang = '{_LANG_A}' THEN 1 ELSE 0 END AS g
  FROM documents),
within AS (
  SELECT g, CAST(max(n) AS BIGINT) AS n,
         CAST(sum((2 * rk - n - 1) * x) AS BIGINT) AS s_in
  FROM (
    SELECT g, x,
           row_number() OVER (PARTITION BY g ORDER BY x, doc_id) AS rk,
           count(*) OVER (PARTITION BY g) AS n
    FROM docs) GROUP BY g),
hist AS (
  SELECT x, CAST(sum(g) AS BIGINT) AS ca,
         CAST(sum(1 - g) AS BIGINT) AS cb,
         CAST(sum((1 - g) * x) AS BIGINT) AS sb
  FROM docs GROUP BY x),
pref AS (
  SELECT x, ca, cb,
         coalesce(sum(cb) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb_less,
         coalesce(sum(sb) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sb_less
  FROM hist),
totb AS (
  SELECT CAST(count(*) AS BIGINT) AS mb, CAST(sum(x) AS BIGINT) AS sxb
  FROM docs WHERE g = 0),
cross_t AS (
  SELECT CAST(sum(p.ca * (p.cb_less * p.x - p.sb_less
               + (t.sxb - p.sb_less) - (t.mb - p.cb_less) * p.x))
              AS BIGINT) AS s_ab
  FROM pref p CROSS JOIN totb t),
wa AS (SELECT n AS n_a, s_in AS s_aa FROM within WHERE g = 1),
wb AS (SELECT n AS n_b, s_in AS s_bb FROM within WHERE g = 0)
SELECT wa.n_a, wb.n_b, c.s_ab, wa.s_aa, wb.s_bb,
       2 * CAST((2000000 * c.s_ab + wa.n_a * wb.n_b)
                // (2 * wa.n_a * wb.n_b) AS BIGINT)
       - CAST((2 * 2000000 * wa.s_aa + wa.n_a * wa.n_a)
              // (2 * wa.n_a * wa.n_a) AS BIGINT)
       - CAST((2 * 2000000 * wb.s_bb + wb.n_b * wb.n_b)
              // (2 * wb.n_b * wb.n_b) AS BIGINT) AS energy_micro
FROM wa CROSS JOIN wb CROSS JOIN cross_t c
"""


# ---------------------------------------------------------------------------
# ansari_bradley
# ---------------------------------------------------------------------------


def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley scale statistic (tie-broken variant: ranks on
    the (n_chars, doc_id) total order, documented): both-ends scores
    min(rk, n+1-rk); AB = Σ scores over lang='{_LANG_A}', with the
    exact finite-population null mean n_a·Σscore/n in half-up micro.

    Scale: one global rank window (two-level-rank idiom at 10^12
    rows), then partial aggs.
    """
    scored = _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "doc_id",
            f"CASE WHEN lang = '{_LANG_A}' THEN 1 ELSE 0 END AS g",
            "row_number() OVER (ORDER BY n_chars, doc_id) AS rk",
            "count(*) OVER () AS n",
        )
        .selectExpr("g", "least(rk, n + 1 - rk) AS score", "n")
    )
    return scored.agg(
        F.sum("g").cast("long").alias("n_a"),
        F.sum(F.expr("1 - g")).cast("long").alias("n_b"),
        F.sum(F.expr("g * score")).cast("long").alias("ab_stat"),
        F.sum("score").cast("long").alias("score_total"),
        F.max("n").cast("long").alias("n"),
    ).selectExpr(
        "n_a",
        "n_b",
        "ab_stat",
        "score_total",
        "CAST((2000000 * n_a * score_total + n) DIV (2 * n) AS BIGINT)"
        " AS null_mean_micro",
        "1000000 * ab_stat"
        " - CAST((2000000 * n_a * score_total + n) DIV (2 * n) AS BIGINT)"
        " AS centered_micro",
    )


ORACLE_ANSARI_BRADLEY = f"""
WITH scored AS (
  SELECT CASE WHEN lang = '{_LANG_A}' THEN 1 ELSE 0 END AS g,
         least(rk, n + 1 - rk) AS score, n
  FROM (
    SELECT lang,
           row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
           count(*) OVER () AS n
    FROM documents))
SELECT CAST(sum(g) AS BIGINT) AS n_a,
       CAST(sum(1 - g) AS BIGINT) AS n_b,
       CAST(sum(g * score) AS BIGINT) AS ab_stat,
       CAST(sum(score) AS BIGINT) AS score_total,
       CAST((2000000 * sum(g) * sum(score) + max(n))
            // (2 * max(n)) AS BIGINT) AS null_mean_micro,
       1000000 * CAST(sum(g * score) AS BIGINT)
       - CAST((2000000 * sum(g) * sum(score) + max(n))
              // (2 * max(n)) AS BIGINT) AS centered_micro
FROM scored
"""


RESAMPLE_QUERIES = {
    "signflip_paired_test": q_signflip_paired_test,
    "randomization_label_test": q_randomization_label_test,
    "jackknife_groups": q_jackknife_groups,
    "energy_distance": q_energy_distance,
    "ansari_bradley": q_ansari_bradley,
}

RESAMPLE_ORACLES = {
    "signflip_paired_test": ORACLE_SIGNFLIP_PAIRED_TEST,
    "randomization_label_test": ORACLE_RANDOMIZATION_LABEL_TEST,
    "jackknife_groups": ORACLE_JACKKNIFE_GROUPS,
    "energy_distance": ORACLE_ENERGY_DISTANCE,
    "ansari_bradley": ORACLE_ANSARI_BRADLEY,
}

_q.QUERIES.update(RESAMPLE_QUERIES)
_q.ORACLES.update(RESAMPLE_ORACLES)
