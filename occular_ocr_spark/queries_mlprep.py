"""Training-prep & behavior-mining catalog, round 4 (wave 34): five
operators spanning the model-training, sequence-mining, sampling,
segmentation, and graph-projection surfaces —

* ``logreg_gd`` — 2-step batch-gradient logistic regression (predict
  "is English" from token-count features): each step is ONE
  partial-aggregated gradient scan; the 3-weight state rides a 1-row
  broadcast between steps — no driver-side math, no collect.  The
  iterative-ML shape next to ``kmeans_lloyd``.
* ``seq_pattern_pairs`` — sequential-pattern support (PrefixSpan depth
  1): for every ordered event-type pair (a, b), in how many users
  does an `a` occur strictly before a `b`.  The existential
  before-relation reduces to per-(user, type) (min_ts, max_ts) — one
  groupBy — so no per-event self-join ever happens.
* ``negative_sampling_table`` — the word2vec negative-sampling
  distribution: p(w) ∝ count(w)^0.75 over the corpus vocabulary, in
  parts-per-billion fixed point.  The sampling-prep table a skip-gram
  / contrastive trainer ships to every worker.
* ``rfm_segments`` — per-user Recency/Frequency/Monetary quintiles via
  the ``score_deciles`` two-level distributed rank (never a
  corpus-wide single-task window), with the canonical "R-F-M" segment
  label.  The classic engagement segmentation over the events table.
* ``bipartite_projection`` — project the user↔event_type bipartite
  graph onto event types: co-engagement weight (shared users) and
  Jaccard over user sets for every type pair.  The co-occurrence
  projection that turns behavior into an item graph.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_mlprep_wave.py.

Cross-engine float policy: ``logreg_gd`` quantizes each row's
gradient contribution to a micro-unit BIGINT BEFORE the batch sum
(welch_ttest doctrine — integer sums are order-independent; libm
exp() ULP differences are absorbed by the quantization) and carries
the weights themselves as micro-unit BIGINTs between steps;
``negative_sampling_table`` quantizes count^0.75 to micro-units per
word before the exact-integer normalizer; ``rfm_segments`` quantizes
monetary to whole units so the rank's value histogram stays bounded;
``bipartite_projection`` and ``seq_pattern_pairs`` are exact-integer
end-to-end.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the iterative-ML family
(``kmeans_lloyd``, ``ols_fit``), the two-level-rank family
(``score_deciles`` queries_round4.py:544 — same decomposition), the
sampling family (``mixture_sample``, ``weighted_sample``), and the
behavior family (``event_markov``, ``session_paths``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# Logistic-regression learning rate (fixed, unrolled 2 steps).
_LR_RATE = 0.1
_LR_ITERS = 2
# RFM quantile fan (quintiles).
_RFM_Q = 5


# ---------------------------------------------------------------------------
# logreg_gd
# ---------------------------------------------------------------------------


def q_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-gradient logistic regression, 2 unrolled steps, on
    y = [lang = 'en'], x = (1, token count, distinct-token count).

    Step k: z = (w·x)/1e6 (weights live in micro-units), each row's
    gradient component (sigmoid(z) − y)·x_j is quantized to a
    micro-unit BIGINT, and ONE partial-agg scan sums them exactly;
    the weight update w_j ← w_j − lr·grad_j/n happens on the 1-row
    aggregate and is re-quantized to micro-units — so both engines
    carry bit-identical integer weights into the next step.  Step 1's
    sigmoid(0) = 1/2 exactly; step 2's exp() ULP noise dies in the
    quantization.

    Scale: per step one corpus scan + a 1-row exchange; the weight
    state is a 3-number broadcast.  No collect, no driver math, no
    windows.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )
    feats = d.select(
        F.lit(1.0).alias("x0"),
        F.size(F.filter(F.split("t", " "), lambda w: w != ""))
        .cast("double")
        .alias("x1"),
        F.size(F.array_distinct(F.filter(F.split("t", " "), lambda w: w != "")))
        .cast("double")
        .alias("x2"),
        "y",
    )
    # weights in micro-units as a 1-row DataFrame; starts at zero
    w = spark.range(1).select(
        F.lit(0).cast("long").alias("w0"),
        F.lit(0).cast("long").alias("w1"),
        F.lit(0).cast("long").alias("w2"),
    )
    for _ in range(_LR_ITERS):
        z = (
            F.col("w0") * F.col("x0") + F.col("w1") * F.col("x1")
            + F.col("w2") * F.col("x2")
        ) / F.lit(1e6)
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = sig - F.col("y")
        g = feats.crossJoin(F.broadcast(w)).select(
            *[
                F.floor(err * F.col(f"x{j}") * 1e6 + F.lit(0.5))
                .cast("long")
                .alias(f"g{j}")
                for j in range(3)
            ],
            "w0",
            "w1",
            "w2",
        )
        agg = g.groupBy("w0", "w1", "w2").agg(
            F.count("*").alias("n"),
            *[F.sum(f"g{j}").alias(f"gs{j}") for j in range(3)],
        )
        w = agg.select(
            *[
                (
                    F.col(f"w{j}")
                    + F.floor(
                        -F.lit(_LR_RATE) * F.col(f"gs{j}") / F.col("n") + F.lit(0.5)
                    ).cast("long")
                ).alias(f"w{j}")
                for j in range(3)
            ],
            F.col("n"),
        )
    return w.select(
        F.col("n").cast("long").alias("n"),
        F.col("w0").alias("w0_micro"),
        F.col("w1").alias("w1_micro"),
        F.col("w2").alias("w2_micro"),
    )


ORACLE_LOGREG_GD = f"""
WITH feats AS (
  SELECT 1.0 AS x0,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              w -> w <> '')) AS DOUBLE) AS x1,
         CAST(len(list_distinct(list_filter(string_split(coalesce(text, ''), ' '),
                                            w -> w <> ''))) AS DOUBLE) AS x2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
g1 AS (
  SELECT count(*) AS n,
         sum(CAST(floor((1.0 / (1.0 + exp(-(0.0))) - y) * x0 * 1e6 + 0.5) AS BIGINT)) AS gs0,
         sum(CAST(floor((1.0 / (1.0 + exp(-(0.0))) - y) * x1 * 1e6 + 0.5) AS BIGINT)) AS gs1,
         sum(CAST(floor((1.0 / (1.0 + exp(-(0.0))) - y) * x2 * 1e6 + 0.5) AS BIGINT)) AS gs2
  FROM feats),
w1 AS (
  SELECT n,
         CAST(floor(-{_LR_RATE} * gs0 / n + 0.5) AS BIGINT) AS w0,
         CAST(floor(-{_LR_RATE} * gs1 / n + 0.5) AS BIGINT) AS w1,
         CAST(floor(-{_LR_RATE} * gs2 / n + 0.5) AS BIGINT) AS w2
  FROM g1),
g2 AS (
  SELECT w1.w0, w1.w1, w1.w2, count(*) AS n,
         sum(CAST(floor((1.0 / (1.0 + exp(-((w1.w0 * f.x0 + w1.w1 * f.x1 + w1.w2 * f.x2) / 1e6))) - f.y) * f.x0 * 1e6 + 0.5) AS BIGINT)) AS gs0,
         sum(CAST(floor((1.0 / (1.0 + exp(-((w1.w0 * f.x0 + w1.w1 * f.x1 + w1.w2 * f.x2) / 1e6))) - f.y) * f.x1 * 1e6 + 0.5) AS BIGINT)) AS gs1,
         sum(CAST(floor((1.0 / (1.0 + exp(-((w1.w0 * f.x0 + w1.w1 * f.x1 + w1.w2 * f.x2) / 1e6))) - f.y) * f.x2 * 1e6 + 0.5) AS BIGINT)) AS gs2
  FROM feats f, w1
  GROUP BY w1.w0, w1.w1, w1.w2)
SELECT CAST(n AS BIGINT) AS n,
       w0 + CAST(floor(-{_LR_RATE} * gs0 / n + 0.5) AS BIGINT) AS w0_micro,
       w1 + CAST(floor(-{_LR_RATE} * gs1 / n + 0.5) AS BIGINT) AS w1_micro,
       w2 + CAST(floor(-{_LR_RATE} * gs2 / n + 0.5) AS BIGINT) AS w2_micro
FROM g2
"""


# ---------------------------------------------------------------------------
# seq_pattern_pairs
# ---------------------------------------------------------------------------


def q_seq_pattern_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 sequential patterns: support(a → b) = #users with some
    `a` event strictly before some `b` event (a ≠ b).

    The existential before-relation needs only per-(user, type)
    (min_ts, max_ts): "an a before a b exists" ⇔ min_ts(a) <
    max_ts(b).  So the plan is one groupBy over events, then a
    per-user self-join of the (user, type) summary — |types|-bounded
    per user, NEVER a per-event pair blow-up — then a partial-agg
    count per (antecedent, consequent).

    Scale: one corpus shuffle on (user, type); the self-join is
    co-partitioned on user_id (same exchange reused); output is
    |types|² rows.
    """
    spans = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    )
    a = spans.select(
        "user_id",
        F.col("event_type").alias("ante"),
        F.col("first_ts").alias("a_first"),
    )
    b = spans.select(
        "user_id",
        F.col("event_type").alias("cons"),
        F.col("last_ts").alias("b_last"),
    )
    return (
        a.join(b, "user_id")
        .where((F.col("ante") != F.col("cons")) & (F.col("a_first") < F.col("b_last")))
        .groupBy("ante", "cons")
        .agg(F.count("*").alias("support"))
    )


ORACLE_SEQ_PATTERN_PAIRS = """
WITH spans AS (
  SELECT user_id, event_type, min(ts) AS first_ts, max(ts) AS last_ts
  FROM events GROUP BY user_id, event_type)
SELECT a.event_type AS ante, b.event_type AS cons,
       CAST(count(*) AS BIGINT) AS support
FROM spans a JOIN spans b USING (user_id)
WHERE a.event_type <> b.event_type AND a.first_ts < b.last_ts
GROUP BY a.event_type, b.event_type
"""


# ---------------------------------------------------------------------------
# negative_sampling_table
# ---------------------------------------------------------------------------


def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling distribution: p(w) ∝ count(w)^0.75,
    emitted in parts-per-billion fixed point.

    One tokenize + groupBy builds the unigram counts; count^0.75 is
    quantized to a micro-unit BIGINT per word (pow() ULP noise dies
    there), the normalizer is the EXACT integer sum of those, and the
    ppb probability divides the two integers in double (both exact
    below 2^53 at any realistic vocabulary).  The table is
    vocabulary-sized — the thing a contrastive trainer broadcasts.

    Scale: one corpus shuffle (unigram groupBy); the normalizer is a
    1-row broadcast.
    """
    uni = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    wq = uni.select(
        "w",
        F.col("c").cast("long").alias("c"),
        F.floor(F.pow(F.col("c").cast("double"), F.lit(0.75)) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("w_micro"),
    )
    z = wq.agg(F.sum("w_micro").alias("z"))
    return wq.crossJoin(F.broadcast(z)).select(
        "w",
        "c",
        "w_micro",
        F.floor(
            F.col("w_micro").cast("double") / F.col("z").cast("double") * 1e9
            + F.lit(0.5)
        )
        .cast("long")
        .alias("p_ppb"),
    )


ORACLE_NEGATIVE_SAMPLING_TABLE = """
WITH uni AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w),
wq AS (
  SELECT w, CAST(c AS BIGINT) AS c,
         CAST(floor(pow(CAST(c AS DOUBLE), 0.75) * 1e6 + 0.5) AS BIGINT) AS w_micro
  FROM uni),
z AS (SELECT sum(w_micro) AS z FROM wq)
SELECT w, c, w_micro,
       CAST(floor(CAST(w_micro AS DOUBLE) / CAST(z.z AS DOUBLE) * 1e9 + 0.5)
            AS BIGINT) AS p_ppb
FROM wq, z
"""


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------


def _two_level_quintile(metric: DataFrame, col: str) -> DataFrame:
    """Quintile of ``col`` over the per-user metric table via the
    score_deciles two-level rank: per-value counts (bounded by the
    value range), one tiny prefix window over the value histogram,
    row_number within each value (ties break by user_id)."""
    vcounts = metric.groupBy(col).agg(F.count("*").alias("c"))
    wv = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
    prefix = vcounts.select(
        col, F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("p")
    )
    total = metric.agg(F.count("*").alias("n"))
    wr = Window.partitionBy(col).orderBy("user_id")
    return (
        metric.join(F.broadcast(prefix), col)
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            col,
            (
                F.floor(
                    (F.col("p") + F.row_number().over(wr) - 1)
                    * _RFM_Q
                    / F.col("n")
                ).cast("int")
                + F.lit(1)
            ).alias(f"{col}_q"),
        )
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary segmentation: per-user quintiles of
    (days since last event, event count, whole-unit spend), plus the
    canonical "R-F-M" segment label.

    Each metric ranks via the two-level decomposition (the
    score_deciles shape): the only global frame is the per-metric
    VALUE histogram — days and counts are naturally narrow, and
    monetary is quantized to whole units exactly so its histogram
    stays bounded too.  Quintile 1 = lowest value (so R=1 means most
    recent, F=5 means most frequent — documented, deterministic).

    Scale: one events shuffle to the per-user rollup; three
    histogram-sized rank joins; ties always break by user_id.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", F.col("value").cast("double").alias("v")
    )
    anchor = ev.agg(F.max("ts").alias("t_max"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("t_max"), F.max("ts")).cast("long").alias("recency_d"),
            F.count("*").alias("frequency"),
            # whole-unit monetary: floor(value) summed exactly as ints
            F.sum(F.floor("v").cast("long")).alias("monetary_u"),
        )
    )
    r = _two_level_quintile(per_user.select("user_id", "recency_d"), "recency_d")
    f_ = _two_level_quintile(per_user.select("user_id", "frequency"), "frequency")
    m = _two_level_quintile(per_user.select("user_id", "monetary_u"), "monetary_u")
    return (
        r.join(f_, "user_id")
        .join(m, "user_id")
        .select(
            "user_id",
            "recency_d",
            "frequency",
            "monetary_u",
            F.col("recency_d_q").alias("r_q"),
            F.col("frequency_q").alias("f_q"),
            F.col("monetary_u_q").alias("m_q"),
            F.concat_ws(
                "-",
                F.col("recency_d_q").cast("string"),
                F.col("frequency_q").cast("string"),
                F.col("monetary_u_q").cast("string"),
            ).alias("segment"),
        )
    )


ORACLE_RFM_SEGMENTS = f"""
WITH ev AS (
  SELECT user_id, ts, CAST(value AS DOUBLE) AS v FROM events),
anchor AS (SELECT max(ts) AS t_max FROM ev),
per_user AS (
  SELECT user_id,
         CAST(date_diff('day', CAST(max(ts) AS DATE), CAST(max(a.t_max) AS DATE))
              AS BIGINT) AS recency_d,
         count(*) AS frequency,
         sum(CAST(floor(v) AS BIGINT)) AS monetary_u
  FROM ev, anchor a GROUP BY user_id),
n AS (SELECT count(*) AS n FROM per_user),
rq AS (
  SELECT user_id,
         CAST(floor((row_number() OVER (ORDER BY recency_d, user_id) - 1)
                    * {_RFM_Q} / n.n) AS INTEGER) + 1 AS r_q
  FROM per_user, n),
fq AS (
  SELECT user_id,
         CAST(floor((row_number() OVER (ORDER BY frequency, user_id) - 1)
                    * {_RFM_Q} / n.n) AS INTEGER) + 1 AS f_q
  FROM per_user, n),
mq AS (
  SELECT user_id,
         CAST(floor((row_number() OVER (ORDER BY monetary_u, user_id) - 1)
                    * {_RFM_Q} / n.n) AS INTEGER) + 1 AS m_q
  FROM per_user, n)
SELECT p.user_id,
       CAST(p.recency_d AS BIGINT) AS recency_d,
       CAST(p.frequency AS BIGINT) AS frequency,
       CAST(p.monetary_u AS BIGINT) AS monetary_u,
       rq.r_q, fq.f_q, mq.m_q,
       concat(rq.r_q, '-', fq.f_q, '-', mq.m_q) AS segment
FROM per_user p
JOIN rq USING (user_id) JOIN fq USING (user_id) JOIN mq USING (user_id)
"""


# ---------------------------------------------------------------------------
# bipartite_projection
# ---------------------------------------------------------------------------


def q_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project user↔event_type onto event types: for every unordered
    type pair, the co-engagement weight (#shared users) and the
    Jaccard over the two user sets.

    Build: distinct (user, type) once; the projection self-joins it on
    user_id with type_a < type_b — per-user fan-out is |types the user
    touched|², bounded by the type vocabulary, never by event volume.
    Degrees re-aggregate from the SAME distinct table and join on the
    type keys (vocabulary-sized).  Jaccard is emitted in micro-units
    from exact integers.

    Scale: one events shuffle to the distinct; the self-join reuses
    the user_id partitioning; everything after is |types|²-sized.
    """
    ut = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    ut = _q._persist_tracked(ut)
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    shared = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("shared_users"))
    )
    deg = ut.groupBy("event_type").agg(F.count("*").alias("d"))
    da = deg.select(F.col("event_type").alias("type_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("event_type").alias("type_b"), F.col("d").alias("deg_b"))
    return (
        shared.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("shared_users").cast("long").alias("shared_users"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            F.floor(
                F.col("shared_users").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("shared_users"))
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("jaccard_micro"),
        )
    )


ORACLE_BIPARTITE_PROJECTION = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
shared AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS shared_users
  FROM ut a JOIN ut b USING (user_id)
  WHERE a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type),
deg AS (SELECT event_type, count(*) AS d FROM ut GROUP BY event_type)
SELECT s.type_a, s.type_b,
       CAST(s.shared_users AS BIGINT) AS shared_users,
       CAST(da.d AS BIGINT) AS deg_a,
       CAST(db.d AS BIGINT) AS deg_b,
       CAST(floor(CAST(s.shared_users AS DOUBLE)
                  / (da.d + db.d - s.shared_users) * 1e6 + 0.5) AS BIGINT)
         AS jaccard_micro
FROM shared s
JOIN deg da ON s.type_a = da.event_type
JOIN deg db ON s.type_b = db.event_type
"""


MLPREP_QUERIES = {
    "logreg_gd": q_logreg_gd,
    "seq_pattern_pairs": q_seq_pattern_pairs,
    "negative_sampling_table": q_negative_sampling_table,
    "rfm_segments": q_rfm_segments,
    "bipartite_projection": q_bipartite_projection,
}

MLPREP_ORACLES = {
    "logreg_gd": ORACLE_LOGREG_GD,
    "seq_pattern_pairs": ORACLE_SEQ_PATTERN_PAIRS,
    "negative_sampling_table": ORACLE_NEGATIVE_SAMPLING_TABLE,
    "rfm_segments": ORACLE_RFM_SEGMENTS,
    "bipartite_projection": ORACLE_BIPARTITE_PROJECTION,
}

_q.QUERIES.update(MLPREP_QUERIES)
_q.ORACLES.update(MLPREP_ORACLES)
