"""Experimentation, classification & stylometry catalog, round 4
(wave 36): five operators spanning the supervised-model, stylometry,
A/B-experimentation, product-funnel, and smoothing surfaces —

* ``naive_bayes_eval`` — multinomial Naive Bayes language classifier:
  train class-conditional token log-probs (Laplace-smoothed) on the
  corpus and emit the resubstitution confusion matrix.  The missing
  supervised-classifier shape: training IS one groupBy, scoring is
  one vocabulary join plus an argmax, and the
  ln((c+1)/(tok_l+V)) = ln(c+1) − ln(tok_l+V) decomposition makes
  unseen (token, class) pairs contribute exactly zero to the join —
  so the scorer is a LEFT-join-free inner join plus a per-class
  offset, never a dense vocabulary×class expansion.
* ``burrows_delta`` — Burrows' Delta authorship distance between
  sources over the top-30 corpus tokens: per-source relative
  frequencies, cross-source z-scores, pairwise mean |Δz|.  The
  classic stylometry measure (Burrows 2002).
* ``cuped_adjustment`` — CUPED variance-reduced A/B readout: split
  the event range into pre/post halves, hash users into two
  variants, θ = cov(pre, post)/var(pre) from exact decimal moments,
  and the adjusted post-period means (Deng et al., WSDM 2013).
* ``window_funnel`` — ClickHouse-style windowFunnel(view → click →
  purchase, 3 days): per user the deepest funnel prefix whose greedy
  next-step chain completes within the window of the FIRST step.
  The greedy "next B after this row" is a per-user min over an
  integer-microsecond RANGE frame (strictly-later, tie-safe), so no
  per-event pair join ever forms.
* ``good_turing_counts`` — the Good–Turing frequency-of-frequencies
  table with the adjusted count r* = (r+1)·N_{r+1}/N_r — the
  smoothing statistic every n-gram LM pipeline tabulates (and the
  Chao1/unseen-mass input).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_experiment_wave.py.

Cross-engine float policy: ``naive_bayes_eval`` quantizes ln(c+1) and
ln(tok_l+V) to micro-unit BIGINTs at the vocabulary level, so every
per-document score is an exact integer sum (argmax compares integers;
ties break to the lexicographically smallest class);
``burrows_delta`` quantizes relative frequencies to micro-units, the
cross-source mean/std to micro via exact integer moments, and z to
milli before the pairwise |Δz|; ``cuped_adjustment`` computes θ in
double from exact DECIMAL moment sums and quantizes each user's
adjusted value to micro BEFORE the per-variant sum (welch doctrine);
``window_funnel`` and ``good_turing_counts`` are exact-integer
end-to-end (good_turing's r* gets one final micro division).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the classifier-eval family
(``langid_confusion``, ``cohens_kappa``), the stats family
(``welch_ttest``, ``ols_fit``), the funnel family (``event_funnel``,
``funnel_latency``), and the LM-smoothing family
(``kn_bigram_logprob``, ``unigram_logprob``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# Burrows' Delta vocabulary size (the "most frequent words" panel).
_BD_TOP = 30
# windowFunnel steps and window (days).
_WF_STEPS = ("view", "click", "purchase")
_WF_WINDOW_D = 3
# CUPED variant count (hash split).
_CUPED_VARIANTS = 2


# ---------------------------------------------------------------------------
# naive_bayes_eval
# ---------------------------------------------------------------------------


def q_naive_bayes_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NB over lang, resubstitution confusion matrix.

    score(d, l) = ln P(l) − |d|·ln(tok_l + V) + Σ_w cnt_d(w)·ln(c_wl + 1),
    every ln micro-quantized at the (token, class) level so the
    per-document sum is exact integer arithmetic.  The unseen-pair
    term is 0 by construction (ln(0+1)), so scoring joins doc tokens
    ONLY to observed (w, l) rows — sparse, vocabulary-sized.

    Scale: two corpus shuffles (doc-token counts; (w, l) counts); the
    class table (priors, offsets) is |langs| rows on a broadcast; the
    argmax is a max_by partial agg, no window.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
    )
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("t", " ")).alias("w")
    ).where(F.col("w") != "")
    toks = _q._persist_tracked(toks)
    doc_tok = toks.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    cwl = toks.groupBy("w", F.col("lang").alias("l")).agg(
        F.count("*").alias("c")
    )
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    cls = (
        toks.groupBy(F.col("lang").alias("l"))
        .agg(F.count("*").alias("tok_l"))
        .crossJoin(F.broadcast(vocab))
    )
    n_docs = d.agg(F.count("*").alias("n"))
    priors = (
        d.groupBy(F.col("lang").alias("l"))
        .agg(F.count("*").alias("n_l"))
        .crossJoin(F.broadcast(n_docs))
        .join(cls, "l")
        .select(
            "l",
            F.floor(F.log(F.col("n_l").cast("double") / F.col("n")) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("prior_micro"),
            F.floor(F.log((F.col("tok_l") + F.col("v")).cast("double")) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("z_micro"),
        )
    )
    lp = cwl.select(
        "w",
        "l",
        F.floor(F.log((F.col("c") + 1).cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("lp_micro"),
    )
    # sparse score part: Σ cnt·lp over observed (w, l)
    part = (
        doc_tok.join(lp, "w")
        .groupBy("doc_id", "l")
        .agg(F.sum(F.col("cnt") * F.col("lp_micro")).alias("s_part"))
    )
    doc_len = doc_tok.groupBy("doc_id").agg(F.sum("cnt").alias("len"))
    scored = (
        doc_len.crossJoin(F.broadcast(priors))
        .join(part, ["doc_id", "l"], "left")
        .select(
            "doc_id",
            "l",
            (
                F.col("prior_micro")
                - F.col("len") * F.col("z_micro")
                + F.coalesce(F.col("s_part"), F.lit(0))
            ).alias("score"),
        )
    )
    # argmax with ties -> lexicographically smallest class: a rank-1
    # window partitioned per doc (|langs| rows per partition)
    pred = scored.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("l"))
        ),
    ).where(F.col("rk") == 1).select("doc_id", F.col("l").alias("pred"))
    truth = d.select("doc_id", F.col("lang").alias("true_lang"))
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", F.col("pred").alias("pred_lang"))
        .agg(F.count("*").alias("n"))
    )


ORACLE_NAIVE_BAYES_EVAL = """
WITH d AS (
  SELECT doc_id, coalesce(lang, '') AS lang, coalesce(text, '') AS t
  FROM documents),
toks AS (
  SELECT doc_id, lang, unnest(string_split(t, ' ')) AS w FROM d),
tk AS (SELECT * FROM toks WHERE w <> ''),
doc_tok AS (SELECT doc_id, w, count(*) AS cnt FROM tk GROUP BY doc_id, w),
cwl AS (SELECT w, lang AS l, count(*) AS c FROM tk GROUP BY w, lang),
vocab AS (SELECT count(DISTINCT w) AS v FROM tk),
cls AS (
  SELECT lang AS l, count(*) AS tok_l FROM tk GROUP BY lang),
n_docs AS (SELECT count(*) AS n FROM d),
priors AS (
  SELECT p.l,
         CAST(floor(ln(CAST(p.n_l AS DOUBLE) / nd.n) * 1e6 + 0.5) AS BIGINT)
           AS prior_micro,
         CAST(floor(ln(CAST(c.tok_l + v.v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
           AS z_micro
  FROM (SELECT lang AS l, count(*) AS n_l FROM d GROUP BY lang) p
  JOIN cls c ON p.l = c.l, n_docs nd, vocab v),
lp AS (
  SELECT w, l,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lp_micro
  FROM cwl),
part AS (
  SELECT dt.doc_id, lp.l, sum(dt.cnt * lp.lp_micro) AS s_part
  FROM doc_tok dt JOIN lp ON dt.w = lp.w
  GROUP BY dt.doc_id, lp.l),
doc_len AS (SELECT doc_id, sum(cnt) AS len FROM doc_tok GROUP BY doc_id),
scored AS (
  SELECT dl.doc_id, pr.l,
         pr.prior_micro - dl.len * pr.z_micro + coalesce(p.s_part, 0) AS score
  FROM doc_len dl CROSS JOIN priors pr
  LEFT JOIN part p ON p.doc_id = dl.doc_id AND p.l = pr.l),
pred AS (
  SELECT doc_id, l AS pred FROM (
    SELECT doc_id, l,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, l) AS rk
    FROM scored) WHERE rk = 1)
SELECT d.lang AS true_lang, pred.pred AS pred_lang,
       CAST(count(*) AS BIGINT) AS n
FROM d JOIN pred ON d.doc_id = pred.doc_id
GROUP BY d.lang, pred.pred
"""


# ---------------------------------------------------------------------------
# burrows_delta
# ---------------------------------------------------------------------------


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between sources over the top-{_BD_TOP} corpus
    tokens: f(w,s) in micro-units, cross-source mean/std (population,
    exact integer moments), z in milli-units, delta(a,b) = mean|Δz|.

    Zero-variance tokens (same relative frequency everywhere) z to 0
    on both engines.  Scale: one corpus tokenize shuffle; everything
    after is (top-K × sources)-sized.
    """
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.coalesce(F.col("source"), F.lit("")).alias("s"),
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("w"),
        )
        .where(F.col("w") != "")
    )
    toks = _q._persist_tracked(toks)
    top = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_BD_TOP)
        .select("w")
    )
    tok_s = toks.groupBy("s").agg(F.count("*").alias("tok_s"))
    cws = toks.join(F.broadcast(top), "w").groupBy("w", "s").agg(
        F.count("*").alias("c")
    )
    # dense (w, s) grid so absent tokens count as f = 0
    grid = top.crossJoin(tok_s.select("s", "tok_s"))
    f = grid.join(cws, ["w", "s"], "left").select(
        "w",
        "s",
        F.floor(
            F.coalesce(F.col("c"), F.lit(0)).cast("double")
            / F.col("tok_s")
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("f_micro"),
    )
    stats = f.groupBy("w").agg(
        F.count("*").alias("k"),
        F.sum("f_micro").alias("sf"),
        F.sum(F.col("f_micro") * F.col("f_micro")).alias("sff"),
    )
    # population std in micro-units: sqrt((k·sff − sf²)/k²)
    mstats = stats.select(
        "w",
        F.floor(F.col("sf").cast("double") / F.col("k") + F.lit(0.5))
        .cast("long")
        .alias("mean_micro"),
        F.floor(
            F.sqrt(
                (
                    F.col("k").cast("double") * F.col("sff")
                    - F.col("sf").cast("double") * F.col("sf")
                )
            )
            / F.col("k")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("std_micro"),
    )
    z = f.join(F.broadcast(mstats), "w").select(
        "w",
        "s",
        F.when(F.col("std_micro") > 0,
               F.floor(
                   (F.col("f_micro") - F.col("mean_micro")).cast("double")
                   / F.col("std_micro")
                   * 1000
                   + F.lit(0.5)
               ).cast("long"))
        .otherwise(F.lit(0))
        .alias("z_milli"),
    )
    za = z.select(F.col("s").alias("src_a"), "w", F.col("z_milli").alias("za"))
    zb = z.select(F.col("s").alias("src_b"), "w", F.col("z_milli").alias("zb"))
    return (
        za.join(zb, "w")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.floor(
                F.sum(F.abs(F.col("za") - F.col("zb"))).cast("double")
                / F.count("*")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("delta_milli"),
        )
    )


ORACLE_BURROWS_DELTA = f"""
WITH toks AS (
  SELECT coalesce(source, '') AS s,
         unnest(string_split(coalesce(text, ''), ' ')) AS w
  FROM documents),
tk AS (SELECT * FROM toks WHERE w <> ''),
top AS (
  SELECT w FROM (
    SELECT w, count(*) AS c FROM tk GROUP BY w
    ORDER BY c DESC, w LIMIT {_BD_TOP})),
tok_s AS (SELECT s, count(*) AS tok_s FROM tk GROUP BY s),
cws AS (
  SELECT t.w, t.s, count(*) AS c FROM tk t JOIN top USING (w)
  GROUP BY t.w, t.s),
grid AS (SELECT top.w, tok_s.s, tok_s.tok_s FROM top CROSS JOIN tok_s),
f AS (
  SELECT g.w, g.s,
         CAST(floor(CAST(coalesce(c.c, 0) AS DOUBLE) / g.tok_s * 1e6 + 0.5)
              AS BIGINT) AS f_micro
  FROM grid g LEFT JOIN cws c ON g.w = c.w AND g.s = c.s),
stats AS (
  SELECT w, count(*) AS k, sum(f_micro) AS sf,
         sum(f_micro * f_micro) AS sff
  FROM f GROUP BY w),
mstats AS (
  SELECT w,
         CAST(floor(CAST(sf AS DOUBLE) / k + 0.5) AS BIGINT) AS mean_micro,
         CAST(floor(sqrt(CAST(k AS DOUBLE) * sff - CAST(sf AS DOUBLE) * sf) / k
                    + 0.5) AS BIGINT) AS std_micro
  FROM stats),
z AS (
  SELECT f.w, f.s,
         CASE WHEN m.std_micro > 0 THEN
           CAST(floor(CAST(f.f_micro - m.mean_micro AS DOUBLE) / m.std_micro
                      * 1000 + 0.5) AS BIGINT)
         ELSE 0 END AS z_milli
  FROM f JOIN mstats m USING (w))
SELECT a.s AS src_a, b.s AS src_b,
       CAST(count(*) AS BIGINT) AS k,
       CAST(floor(CAST(sum(abs(a.z_milli - b.z_milli)) AS DOUBLE) / count(*)
                  + 0.5) AS BIGINT) AS delta_milli
FROM z a JOIN z b ON a.w = b.w AND a.s < b.s
GROUP BY a.s, b.s
"""


# ---------------------------------------------------------------------------
# cuped_adjustment
# ---------------------------------------------------------------------------


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED: variance-reduced post-period means per hash variant.

    Pre/post split at the midpoint of the event time range; per-user
    pre/post spend in micro-units (per-event values quantized before
    the exact integer sum); variant = portable md5 hash16(user_id)
    mod {_CUPED_VARIANTS}.  θ = cov(pre, post)/var(pre) from exact
    DECIMAL moment sums over ALL users (pooled, the standard
    estimator); each user's adjusted value post − θ·(pre − pre_mean)
    is quantized to micro BEFORE the per-variant sum.

    Scale: one events shuffle to per-user; the θ moment scan is one
    1-row aggregate; per-variant means are a 2-group partial agg.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("v_micro"),
    )
    span = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t0"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t1"),
    )
    hash16 = (
        "((((instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cuped'), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cuped'), 2, 1)) - 1)) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cuped'), 3, 1)) - 1)) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cuped'), 4, 1)) - 1))"
    )
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .withColumn(
            "is_pre", F.unix_micros(F.col("ts").cast("timestamp")) * 2 <= F.col("t0") + F.col("t1")
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("is_pre"), F.col("v_micro")).otherwise(F.lit(0)))
            .alias("pre"),
            F.sum(F.when(~F.col("is_pre"), F.col("v_micro")).otherwise(F.lit(0)))
            .alias("post"),
        )
        .withColumn("variant", F.expr(hash16) % _CUPED_VARIANTS)
    )
    dec = "decimal(38,0)"
    m = per_user.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("pre").cast(dec).alias("sx"),
        F.sum("post").cast(dec).alias("sy"),
        F.sum(F.col("pre").cast(dec) * F.col("pre")).cast(dec).alias("sxx"),
        F.sum(F.col("pre").cast(dec) * F.col("post")).cast(dec).alias("sxy"),
    )
    theta = m.select(
        "n",
        "sx",
        (
            (F.col("n").cast("double") * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (F.col("n").cast("double") * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("th"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "variant",
        "post",
        F.floor(
            F.col("post")
            - F.col("th")
            * (F.col("pre") - F.col("sx").cast("double") / F.col("n"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("adj_micro"),
        F.floor(F.col("th") * 1e6 + F.lit(0.5)).cast("long").alias("theta_micro"),
    )
    return adj.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.floor(F.sum("post").cast("double") / F.count("*") + F.lit(0.5))
        .cast("long")
        .alias("post_mean_micro"),
        F.floor(F.sum("adj_micro").cast("double") / F.count("*") + F.lit(0.5))
        .cast("long")
        .alias("adj_mean_micro"),
        F.max("theta_micro").alias("theta_micro"),
    )


ORACLE_CUPED_ADJUSTMENT = f"""
WITH ev AS (
  SELECT user_id, ts,
         CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS v_micro
  FROM events),
span AS (SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM ev),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN epoch_us(ts) * 2 <= s.t0 + s.t1 THEN v_micro ELSE 0 END)
           AS pre,
         sum(CASE WHEN epoch_us(ts) * 2 > s.t0 + s.t1 THEN v_micro ELSE 0 END)
           AS post,
         ((((strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || ':cuped'), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || ':cuped'), 2, 1)) - 1)) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || ':cuped'), 3, 1)) - 1)) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || ':cuped'), 4, 1)) - 1))
           % {_CUPED_VARIANTS} AS variant
  FROM ev, span s GROUP BY user_id),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(pre) AS HUGEINT) AS sx,
         CAST(sum(post) AS HUGEINT) AS sy,
         CAST(sum(CAST(pre AS HUGEINT) * pre) AS HUGEINT) AS sxx,
         CAST(sum(CAST(pre AS HUGEINT) * post) AS HUGEINT) AS sxy
  FROM per_user),
theta AS (
  SELECT n, sx,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS th
  FROM m),
adj AS (
  SELECT p.variant, p.post,
         CAST(floor(p.post - t.th * (p.pre - CAST(t.sx AS DOUBLE)
                                             / CAST(t.n AS DOUBLE)) + 0.5)
              AS BIGINT) AS adj_micro,
         CAST(floor(t.th * 1e6 + 0.5) AS BIGINT) AS theta_micro
  FROM per_user p, theta t)
SELECT variant,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(floor(CAST(sum(post) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
         AS post_mean_micro,
       CAST(floor(CAST(sum(adj_micro) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
         AS adj_mean_micro,
       max(theta_micro) AS theta_micro
FROM adj GROUP BY variant
"""


# ---------------------------------------------------------------------------
# window_funnel
# ---------------------------------------------------------------------------


def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(view → click → purchase, {_WF_WINDOW_D} days):
    per user the deepest greedy prefix completing within the window
    of the first step, then the depth histogram.

    The greedy chain needs, for every event row, the NEXT strictly-
    later step-2 / step-3 timestamp for the same user — a min over an
    integer-microsecond RANGE frame (1 FOLLOWING .. UNBOUNDED), which
    is tie-safe where a DESC row frame is not (equal timestamps would
    make the frame order-dependent).  A step-1 row then reads its
    next-click; one
    per-user equi-join on that click's timestamp reads the click
    row's next-purchase; depth is a per-user max.

    Scale: windows are partitioned on user_id; the only join is a
    per-user equi-join on (user_id, ts) — no event-pair blow-up.
    """
    s1, s2, s3 = _WF_STEPS
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    # strict-after via an integer RANGE frame (>= current + 1 µs):
    # tie-safe on both engines, unlike a DESC row frame under equal ts
    w_after = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    nexts = ev.select(
        "user_id",
        "event_type",
        "us",
        F.min(F.when(F.col("event_type") == s2, F.col("us"))).over(w_after).alias(
            "next_s2"
        ),
        F.min(F.when(F.col("event_type") == s3, F.col("us"))).over(w_after).alias(
            "next_s3"
        ),
    )
    nexts = _q._persist_tracked(nexts)
    a_rows = nexts.where(F.col("event_type") == s1).select(
        "user_id",
        F.col("us").alias("t1"),
        F.col("next_s2").alias("t2"),
    )
    # fetch next_s3 as seen FROM the chained step-2 row
    b_rows = nexts.where(F.col("event_type") == s2).select(
        "user_id", F.col("us").alias("t2"), F.col("next_s3").alias("t3")
    ).distinct()
    lim = F.col("t1") + F.lit(_WF_WINDOW_D * 86_400_000_000)
    chains = a_rows.join(b_rows, ["user_id", "t2"], "left").select(
        "user_id",
        F.when(
            F.col("t3").isNotNull() & (F.col("t3") <= lim), F.lit(3)
        )
        .when(F.col("t2").isNotNull() & (F.col("t2") <= lim), F.lit(2))
        .otherwise(F.lit(1))
        .alias("depth"),
    )
    per_user = (
        ev.select("user_id")
        .distinct()
        .join(chains.groupBy("user_id").agg(F.max("depth").alias("d")), "user_id", "left")
        .select("user_id", F.coalesce(F.col("d"), F.lit(0)).alias("depth"))
    )
    return per_user.groupBy("depth").agg(F.count("*").cast("long").alias("n_users"))


ORACLE_WINDOW_FUNNEL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
nexts AS (
  SELECT user_id, event_type, us,
         min(CASE WHEN event_type = '{_WF_STEPS[1]}' THEN us END) OVER
           (PARTITION BY user_id ORDER BY us
            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_s2,
         min(CASE WHEN event_type = '{_WF_STEPS[2]}' THEN us END) OVER
           (PARTITION BY user_id ORDER BY us
            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_s3
  FROM ev),
a_rows AS (
  SELECT user_id, us AS t1, next_s2 AS t2 FROM nexts
  WHERE event_type = '{_WF_STEPS[0]}'),
b_rows AS (
  SELECT DISTINCT user_id, us AS t2, next_s3 AS t3 FROM nexts
  WHERE event_type = '{_WF_STEPS[1]}'),
chains AS (
  SELECT a.user_id,
         CASE WHEN b.t3 IS NOT NULL
                   AND b.t3 <= a.t1 + {_WF_WINDOW_D * 86_400_000_000} THEN 3
              WHEN a.t2 IS NOT NULL
                   AND a.t2 <= a.t1 + {_WF_WINDOW_D * 86_400_000_000} THEN 2
              ELSE 1 END AS depth
  FROM a_rows a LEFT JOIN b_rows b
    ON a.user_id = b.user_id AND a.t2 = b.t2),
per_user AS (
  SELECT u.user_id, coalesce(c.d, 0) AS depth
  FROM (SELECT DISTINCT user_id FROM ev) u
  LEFT JOIN (SELECT user_id, max(depth) AS d FROM chains GROUP BY user_id) c
    ON u.user_id = c.user_id)
SELECT depth, CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY depth
"""


# ---------------------------------------------------------------------------
# good_turing_counts
# ---------------------------------------------------------------------------


def q_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing frequency-of-frequencies: N_r = #vocabulary words
    seen exactly r times, with r* = (r+1)·N_{r+1}/N_r in micro-units
    (0 where N_{r+1} is absent — the standard truncation).

    Scale: one corpus tokenize shuffle to unigram counts, one
    vocabulary-sized groupBy to the N_r table (at most #distinct
    counts rows), one self-join on r+1.
    """
    uni = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("r"))
    )
    nr = uni.groupBy("r").agg(F.count("*").alias("n_r"))
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        nr.join(nxt, "r", "left")
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.coalesce(
                F.floor(
                    (F.col("r") + 1).cast("double")
                    * F.col("n_r1")
                    / F.col("n_r")
                    * 1e6
                    + F.lit(0.5)
                ).cast("long"),
                F.lit(0),
            ).alias("r_star_micro"),
        )
    )


ORACLE_GOOD_TURING_COUNTS = """
WITH uni AS (
  SELECT w, count(*) AS r FROM (
    SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w),
nr AS (SELECT r, count(*) AS n_r FROM uni GROUP BY r)
SELECT CAST(a.r AS BIGINT) AS r,
       CAST(a.n_r AS BIGINT) AS n_r,
       coalesce(CAST(floor(CAST(a.r + 1 AS DOUBLE) * b.n_r / a.n_r * 1e6 + 0.5)
                     AS BIGINT), 0) AS r_star_micro
FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
"""


EXPERIMENT_QUERIES = {
    "naive_bayes_eval": q_naive_bayes_eval,
    "burrows_delta": q_burrows_delta,
    "cuped_adjustment": q_cuped_adjustment,
    "window_funnel": q_window_funnel,
    "good_turing_counts": q_good_turing_counts,
}

EXPERIMENT_ORACLES = {
    "naive_bayes_eval": ORACLE_NAIVE_BAYES_EVAL,
    "burrows_delta": ORACLE_BURROWS_DELTA,
    "cuped_adjustment": ORACLE_CUPED_ADJUSTMENT,
    "window_funnel": ORACLE_WINDOW_FUNNEL,
    "good_turing_counts": ORACLE_GOOD_TURING_COUNTS,
}

_q.QUERIES.update(EXPERIMENT_QUERIES)
_q.ORACLES.update(EXPERIMENT_ORACLES)
