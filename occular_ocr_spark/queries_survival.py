"""Forecasting, survival & linkage catalog, round 4 (wave 35): five
operators spanning the time-series, survival-analysis, physical-
planning, record-linkage, and sketch-intersection surfaces —

* ``holt_smoothing`` — Holt double-exponential smoothing (level +
  trend, α=1/2, β=1/4) over each event type's daily-count series,
  with the one-step-ahead forecast.  The recursion runs INSIDE a
  per-series ``F.aggregate`` over the day-ordered array — state is
  two integers, series length is #days (bounded), and the corpus
  never sees a sequential pass.
* ``kaplan_meier`` — the Kaplan–Meier product-limit survival curve
  over user activity lifetimes (days between first and last event),
  right-censoring users still active in the last week.  At-risk
  counts come from the duration HISTOGRAM (prefix sums over a
  #distinct-durations frame, never a per-user window); the product
  is exp of an exact integer prefix sum of micro-quantized ln terms.
* ``range_partition_plan`` — the range-exchange boundary planner: 8
  range buckets over documents.n_chars computed from the exact value
  histogram (what a sort/range partitioner derives from sampling,
  done exactly), emitting per-bucket [lo, hi] and the achieved row
  count — the skew evidence a planner acts on.
* ``fellegi_sunter`` — record-linkage field weights: m/u agreement
  probabilities and log2 match weights for (lang, source,
  length-bucket), with the verified MinHash near-dup pairs as the
  match set and a deterministic shifted-id pairing as the non-match
  sample (Laplace-smoothed; anti-joined against the matches).
* ``kmv_intersect`` — K-Minimum-Values sketch intersection: per
  source-pair estimated distinct-text union / intersection /
  Jaccard from k=64 smallest portable 32-bit text hashes, next to
  the exact values the estimate is judged against.  The mergeable
  sketch family's INTERSECTION member (HLL in ``sketch_rollup``
  cannot intersect; KMV can).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_survival_wave.py.

Cross-engine float policy: ``holt_smoothing`` carries (level, trend)
as micro-unit BIGINTs re-quantized after every step (α, β are dyadic
so each step is one exact add-and-halve plus one floor);
``kaplan_meier`` quantizes each ln(1 − d/n) to micro-units BEFORE the
prefix sum (integer prefix sums are order-independent) and rounds the
survival ppm from exp of that exact sum; ``fellegi_sunter`` and
``kmv_intersect`` derive every probability/estimate from exact BIGINT
counts with one final micro-quantized division; the portable 32-bit
hash is the house md5 hex-digit decode (weighted_sample_es doctrine)
— bit-identical on both engines.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the time-series family
(``ewma_trailing``, ``cusum_chart``), the histogram-rank family
(``score_deciles``, ``group_quantiles_dist``), the dedup family
(``dedup_minhash_verify`` — match-set reuse, the keep_canonical
composition pattern), and the sketch family (``sketch_rollup``,
``heavy_hitters_cms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# Holt parameters — dyadic on purpose: each step is exact integer
# arithmetic before the single floor.
_HOLT_ALPHA_INV = 2  # alpha = 1/2
_HOLT_BETA_INV = 4   # beta  = 1/4
# Kaplan–Meier right-censoring horizon (days before corpus max).
_KM_CENSOR_D = 7
# Range-partition fan.
_RPP_BUCKETS = 8
# KMV sketch size.
_KMV_K = 64
# Fellegi–Sunter non-match pairing shift and length-bucket width.
_FS_SHIFT = 173
_FS_LEN_BUCKET = 100


# ---------------------------------------------------------------------------
# holt_smoothing
# ---------------------------------------------------------------------------


def q_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear smoothing per event type over daily counts.

    Init l₀ = x₀ (micro-units), b₀ = 0; step t ≥ 1:
    l_t = ⌊(x_t·1e6 + l + b)/2 + ½⌋, b_t = ⌊((l_t − l) + 3b)/4 + ½⌋.
    The per-series recursion runs in ``F.aggregate`` over the
    day-sorted (day, count) array — series are #days long (bounded by
    calendar time, not corpus size), so the array per group is small
    even at 100 TB; the corpus-sized work is ONE partial-agg groupBy.

    Output: per type the series length, final level/trend
    (micro-units) and the one-step forecast level + trend.
    """
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "c"))).alias("s")
    )
    init = F.struct(
        (F.element_at("s", 1)["c"] * F.lit(1_000_000)).cast("long").alias("l"),
        F.lit(0).cast("long").alias("b"),
    )

    def step(acc, x):
        l_new = F.floor(
            (x["c"].cast("double") * 1e6 + acc["l"] + acc["b"]) / _HOLT_ALPHA_INV
            + F.lit(0.5)
        ).cast("long")
        b_new = F.floor(
            ((l_new - acc["l"]) + (_HOLT_BETA_INV - 1) * acc["b"])
            / _HOLT_BETA_INV
            + F.lit(0.5)
        ).cast("long")
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    fin = F.aggregate(
        F.slice(F.col("s"), 2, F.size("s") - 1), init, step
    )
    return series.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        fin["l"].alias("level_micro"),
        fin["b"].alias("trend_micro"),
        (fin["l"] + fin["b"]).alias("forecast_micro"),
    )


ORACLE_HOLT_SMOOTHING = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
series AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily),
rec AS (
  SELECT event_type, rn, n_days,
         CAST(c * 1000000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
  FROM series WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.rn, s.n_days,
         CAST(floor((CAST(s.c AS DOUBLE) * 1e6 + r.l + r.b)
                    / {_HOLT_ALPHA_INV} + 0.5) AS BIGINT) AS l,
         CAST(floor(((CAST(floor((CAST(s.c AS DOUBLE) * 1e6 + r.l + r.b)
                                 / {_HOLT_ALPHA_INV} + 0.5) AS BIGINT) - r.l)
                     + {_HOLT_BETA_INV - 1} * r.b)
                    / {_HOLT_BETA_INV} + 0.5) AS BIGINT) AS b
  FROM rec r JOIN series s
    ON s.event_type = r.event_type AND s.rn = r.rn + 1)
SELECT event_type,
       CAST(n_days AS BIGINT) AS n_days,
       l AS level_micro,
       b AS trend_micro,
       l + b AS forecast_micro
FROM rec WHERE rn = n_days
"""


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival over user activity lifetimes.

    Duration = days between a user's first and last event; a user
    whose last event falls within ``_KM_CENSOR_D`` days of the corpus
    maximum is right-censored (still "alive"), otherwise the lifetime
    ended (event).  Per distinct duration t: d(t) events, c(t)
    censored, at-risk n(t) = users − Σ_{t'<t}(d+c); survival
    S(t) = Π_{t'≤t}(1 − d/n), computed as exp of the exact integer
    prefix sum of micro-quantized ln terms.

    Scale: one events shuffle to per-user (users-sized), one groupBy
    to the duration histogram; every window is over that #durations
    frame (calendar-bounded), never over users.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    anchor = ev.agg(F.max("d").alias("d_max"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("d"), F.min("d")).cast("long").alias("dur"),
            (
                F.datediff(F.max("d_max"), F.max("d")) >= F.lit(_KM_CENSOR_D)
            ).alias("event"),
        )
    )
    hist = per_user.groupBy("dur").agg(
        F.sum(F.when(F.col("event"), 1).otherwise(0)).alias("d_n"),
        F.sum(F.when(F.col("event"), 0).otherwise(1)).alias("c_n"),
    )
    total = per_user.agg(F.count("*").alias("n_users"))
    wp = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    wi = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    staged = (
        hist.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_users")
            - F.coalesce(F.sum(F.col("d_n") + F.col("c_n")).over(wp), F.lit(0)),
        )
        .withColumn(
            "q_micro",
            F.when(
                F.col("d_n") < F.col("n_risk"),
                F.floor(
                    F.log(
                        F.lit(1.0)
                        - F.col("d_n").cast("double") / F.col("n_risk")
                    )
                    * 1e6
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(F.lit(0)),
        )
        .withColumn("cum_micro", F.sum("q_micro").over(wi))
        .withColumn(
            "dead", F.max((F.col("d_n") >= F.col("n_risk")).cast("int")).over(wi)
        )
    )
    return staged.select(
        "dur",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_n").cast("long").alias("d_n"),
        F.col("c_n").cast("long").alias("c_n"),
        F.when(F.col("dead") == 1, F.lit(0))
        .otherwise(
            F.floor(F.exp(F.col("cum_micro").cast("double") / 1e6) * 1e6 + F.lit(0.5))
        )
        .cast("long")
        .alias("s_ppm"),
    )


ORACLE_KAPLAN_MEIER = f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
anchor AS (SELECT max(d) AS d_max FROM ev),
per_user AS (
  SELECT user_id,
         CAST(date_diff('day', min(d), max(d)) AS BIGINT) AS dur,
         date_diff('day', max(d), max(a.d_max)) >= {_KM_CENSOR_D} AS event
  FROM ev, anchor a GROUP BY user_id),
hist AS (
  SELECT dur,
         sum(CASE WHEN event THEN 1 ELSE 0 END) AS d_n,
         sum(CASE WHEN event THEN 0 ELSE 1 END) AS c_n
  FROM per_user GROUP BY dur),
total AS (SELECT count(*) AS n_users FROM per_user),
staged AS (
  SELECT h.dur, h.d_n, h.c_n,
         t.n_users - coalesce(sum(h.d_n + h.c_n) OVER
           (ORDER BY h.dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS n_risk
  FROM hist h, total t),
terms AS (
  SELECT dur, d_n, c_n, n_risk,
         CASE WHEN d_n < n_risk THEN
           CAST(floor(ln(1.0 - CAST(d_n AS DOUBLE) / n_risk) * 1e6 + 0.5)
                AS BIGINT)
         ELSE 0 END AS q_micro,
         CASE WHEN d_n >= n_risk THEN 1 ELSE 0 END AS is_dead
  FROM staged),
cum AS (
  SELECT dur, d_n, c_n, n_risk,
         sum(q_micro) OVER
           (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_micro,
         max(is_dead) OVER
           (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dead
  FROM terms)
SELECT dur,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_n AS BIGINT) AS d_n,
       CAST(c_n AS BIGINT) AS c_n,
       CASE WHEN dead = 1 THEN 0
            ELSE CAST(floor(exp(CAST(cum_micro AS DOUBLE) / 1e6) * 1e6 + 0.5)
                      AS BIGINT)
       END AS s_ppm
FROM cum
"""


# ---------------------------------------------------------------------------
# range_partition_plan
# ---------------------------------------------------------------------------


def q_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range-exchange boundary planner: assign every n_chars VALUE
    to one of {_RPP_BUCKETS} range buckets by its exact rank prefix
    (a value never splits across buckets — the range-partitioning
    invariant), and report each bucket's [lo, hi] and achieved row
    count.  Uneven counts under heavy values are the point: this IS
    the skew report a planner (or AQE) acts on before a global sort.

    Scale: histogram + one prefix window over #distinct values;
    corpus rows never enter a window.
    """
    t = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("v")
    )
    vcounts = t.groupBy("v").agg(F.count("*").alias("c"))
    total = t.agg(F.count("*").alias("n"))
    wp = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    assigned = (
        vcounts.crossJoin(F.broadcast(total))
        .withColumn("p", F.coalesce(F.sum("c").over(wp), F.lit(0)))
        .withColumn(
            "bucket",
            F.least(
                F.floor(F.col("p") * _RPP_BUCKETS / F.col("n")).cast("int"),
                F.lit(_RPP_BUCKETS - 1),
            )
            + F.lit(1),
        )
    )
    return assigned.groupBy("bucket").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_values"),
    )


ORACLE_RANGE_PARTITION_PLAN = f"""
WITH vcounts AS (
  SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c
  FROM documents GROUP BY n_chars),
total AS (SELECT count(*) AS n FROM documents),
assigned AS (
  SELECT v, c,
         least(CAST(floor(coalesce(sum(c) OVER
                 (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) * {_RPP_BUCKETS} / t.n) AS INTEGER),
               {_RPP_BUCKETS - 1}) + 1 AS bucket
  FROM vcounts, total t)
SELECT bucket, min(v) AS lo, max(v) AS hi,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_values
FROM assigned GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# fellegi_sunter
# ---------------------------------------------------------------------------


def _fs_attrs(spark: SparkSession, sf_dir: str, side: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias(f"doc_{side}"),
        F.coalesce(F.col("lang"), F.lit("")).alias(f"lang_{side}"),
        F.coalesce(F.col("source"), F.lit("")).alias(f"src_{side}"),
        F.floor(F.col("n_chars") / _FS_LEN_BUCKET).alias(f"lb_{side}"),
    )


def q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record-linkage field weights over (lang, source,
    length-bucket): m = P(field agrees | match), u = P(agrees |
    non-match), weight = log2(m/u) — the table a probabilistic
    matcher thresholds on.

    Match set: the verified MinHash near-dup pairs (the
    keep_canonical composition pattern — the dedup chain IS the
    labeled data a linkage model trains on).  Non-match sample:
    deterministic shifted-id pairing (doc, doc+{_FS_SHIFT}) anti-
    joined against the matches — no RNG, no collect, reproducible at
    any scale.  Probabilities are Laplace-smoothed ((agree+1)/(n+2))
    so zero-agreement fields stay finite; all counts are exact
    BIGINTs, the only floats are the two final micro-quantized
    divisions and one log2.

    Scale: |pairs| ≪ corpus on both sides; the attribute joins are
    doc_id equi-joins; the field pivot is a 3-row constant explode.
    """
    matches = _q.QUERIES["dedup_minhash_verify"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    a = _fs_attrs(spark, sf_dir, "a")
    b = _fs_attrs(spark, sf_dir, "b")
    docs_ids = _t(spark, sf_dir, "documents").select("doc_id")
    nonm = (
        docs_ids.select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + _FS_SHIFT).alias("doc_b"),
        )
        .join(docs_ids.select(F.col("doc_id").alias("doc_b")), "doc_b")
        .join(matches, ["doc_a", "doc_b"], "left_anti")
    )

    def agree_counts(pairs: DataFrame, tag: str) -> DataFrame:
        j = pairs.join(a, "doc_a").join(b, "doc_b")
        return j.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lang").alias("field"),
                        (F.col("lang_a") == F.col("lang_b")).cast("long").alias("agree"),
                    ),
                    F.struct(
                        F.lit("source").alias("field"),
                        (F.col("src_a") == F.col("src_b")).cast("long").alias("agree"),
                    ),
                    F.struct(
                        F.lit("len_bucket").alias("field"),
                        (F.col("lb_a") == F.col("lb_b")).cast("long").alias("agree"),
                    ),
                )
            ).alias("fa")
        ).select(
            F.col("fa.field").alias("field"),
            F.col("fa.agree").alias("agree"),
        ).groupBy("field").agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum("agree").alias(f"agree_{tag}"),
        )
    m_c = agree_counts(matches, "m")
    u_c = agree_counts(nonm, "u")
    mm = (F.col("agree_m") + 1).cast("double") / (F.col("n_m") + 2)
    uu = (F.col("agree_u") + 1).cast("double") / (F.col("n_u") + 2)
    return (
        m_c.join(u_c, "field")
        .select(
            "field",
            F.col("n_m").cast("long").alias("n_match"),
            F.col("agree_m").cast("long").alias("agree_match"),
            F.col("n_u").cast("long").alias("n_nonmatch"),
            F.col("agree_u").cast("long").alias("agree_nonmatch"),
            F.floor(mm * 1e6 + F.lit(0.5)).cast("long").alias("m_micro"),
            F.floor(uu * 1e6 + F.lit(0.5)).cast("long").alias("u_micro"),
            F.floor(F.log2(mm / uu) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("weight_micro"),
        )
    )


def _oracle_fellegi_sunter() -> str:
    from .queries import ORACLES

    verify = ORACLES["dedup_minhash_verify"]
    return f"""
WITH matches AS (SELECT doc_a, doc_b FROM ({verify})),
attrs AS (
  SELECT doc_id, coalesce(lang, '') AS lang, coalesce(source, '') AS src,
         CAST(floor(CAST(n_chars AS DOUBLE) / {_FS_LEN_BUCKET}) AS BIGINT) AS lb
  FROM documents),
nonm AS (
  SELECT d.doc_id AS doc_a, d.doc_id + {_FS_SHIFT} AS doc_b
  FROM documents d
  WHERE EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + {_FS_SHIFT})
    AND NOT EXISTS (SELECT 1 FROM matches m
                    WHERE m.doc_a = d.doc_id
                      AND m.doc_b = d.doc_id + {_FS_SHIFT})),
m_pairs AS (
  SELECT aa.lang = bb.lang AS ag_lang, aa.src = bb.src AS ag_src,
         aa.lb = bb.lb AS ag_lb
  FROM matches p JOIN attrs aa ON p.doc_a = aa.doc_id
                 JOIN attrs bb ON p.doc_b = bb.doc_id),
u_pairs AS (
  SELECT aa.lang = bb.lang AS ag_lang, aa.src = bb.src AS ag_src,
         aa.lb = bb.lb AS ag_lb
  FROM nonm p JOIN attrs aa ON p.doc_a = aa.doc_id
              JOIN attrs bb ON p.doc_b = bb.doc_id),
m_c AS (
  SELECT f.field,
         count(*) AS n_m,
         sum(CASE f.field WHEN 'lang' THEN CASE WHEN ag_lang THEN 1 ELSE 0 END
                          WHEN 'source' THEN CASE WHEN ag_src THEN 1 ELSE 0 END
                          ELSE CASE WHEN ag_lb THEN 1 ELSE 0 END END) AS agree_m
  FROM m_pairs, (VALUES ('lang'), ('source'), ('len_bucket')) AS f(field)
  GROUP BY f.field),
u_c AS (
  SELECT f.field,
         count(*) AS n_u,
         sum(CASE f.field WHEN 'lang' THEN CASE WHEN ag_lang THEN 1 ELSE 0 END
                          WHEN 'source' THEN CASE WHEN ag_src THEN 1 ELSE 0 END
                          ELSE CASE WHEN ag_lb THEN 1 ELSE 0 END END) AS agree_u
  FROM u_pairs, (VALUES ('lang'), ('source'), ('len_bucket')) AS f(field)
  GROUP BY f.field)
SELECT m_c.field,
       CAST(n_m AS BIGINT) AS n_match,
       CAST(agree_m AS BIGINT) AS agree_match,
       CAST(n_u AS BIGINT) AS n_nonmatch,
       CAST(agree_u AS BIGINT) AS agree_nonmatch,
       CAST(floor(CAST(agree_m + 1 AS DOUBLE) / (n_m + 2) * 1e6 + 0.5) AS BIGINT)
         AS m_micro,
       CAST(floor(CAST(agree_u + 1 AS DOUBLE) / (n_u + 2) * 1e6 + 0.5) AS BIGINT)
         AS u_micro,
       CAST(floor(log2((CAST(agree_m + 1 AS DOUBLE) / (n_m + 2))
                       / (CAST(agree_u + 1 AS DOUBLE) / (n_u + 2))) * 1e6 + 0.5)
            AS BIGINT) AS weight_micro
FROM m_c JOIN u_c ON m_c.field = u_c.field
"""


# ---------------------------------------------------------------------------
# kmv_intersect
# ---------------------------------------------------------------------------


def _hash32(col_sql: str) -> str:
    """Portable 32-bit hash: first 8 hex digits of md5, decoded by
    string arithmetic — the weighted_sample_es family, widened."""
    def hexv(j: int) -> str:
        return f"(instr('0123456789abcdef', substr(md5({col_sql}), {j}, 1)) - 1)"

    # seed as BIGINT so the 8-digit build-up never overflows int32
    expr = f"CAST({hexv(1)} AS BIGINT)"
    for j in range(2, 9):
        expr = f"({expr} * 16 + {hexv(j)})"
    return expr


def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch intersection across sources.

    Per source: the k={_KMV_K} smallest portable 32-bit hashes of the
    DISTINCT document texts.  Per source pair: merge the two sketches,
    keep the k smallest of the union; with θ = kth value / 2³²,
    est_union = (k−1)/θ, est_inter = (shared among those k)/k ·
    est_union (Beyer et al. 2007).  Exact distinct/intersection
    counts ride along so the estimate is judged in-row.

    Scale: sketches are k-sized per source (a per-source top-k — a
    partial-agg min-heap shape, one shuffle of k rows per source);
    the pair merge is |sources|²·k — constant-sized.  The exact
    columns are one distinct-hash groupBy; at 100 TB you would drop
    them and keep only the sketch path (they're the oracle surface
    here).
    """
    h32 = _hash32("text")
    dt = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("source", F.expr(h32).cast("long").alias("h"))
        .distinct()
    )
    dt = _q._persist_tracked(dt)
    wk = Window.partitionBy("source").orderBy("h")
    # persisted: both merge legs (and their source-list distincts) read
    # the per-source sketch — unpersisted each of the four references
    # re-ran the top-k window over the distinct-hash table
    sk = _q._persist_tracked(
        dt.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= _KMV_K)
        .select("source", "h")
    )
    a = sk.select(F.col("source").alias("src_a"), F.col("h").alias("h"))
    b = sk.select(F.col("source").alias("src_b"), F.col("h").alias("h"))
    merged = (
        a.join(b.select("src_b").distinct(), F.lit(True))
        .where(F.col("src_a") < F.col("src_b"))
        .select("src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionAll(
            b.join(a.select("src_a").distinct(), F.lit(True))
            .where(F.col("src_a") < F.col("src_b"))
            .select(
                "src_a", "src_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = Window.partitionBy("src_a", "src_b").orderBy("h")
    topk = merged.withColumn("rn", F.row_number().over(wm)).where(
        F.col("rn") <= _KMV_K
    )
    est = topk.groupBy("src_a", "src_b").agg(
        F.max("h").alias("kth"),
        F.count("*").alias("k_eff"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("shared_k"),
    )
    # exact side (the oracle surface): distinct hashes per source + pair
    ex_d = dt.groupBy("source").agg(F.countDistinct("h").alias("nd"))
    ex_a = ex_d.select(F.col("source").alias("src_a"), F.col("nd").alias("nd_a"))
    ex_b = ex_d.select(F.col("source").alias("src_b"), F.col("nd").alias("nd_b"))
    inter = (
        dt.select(F.col("source").alias("src_a"), "h")
        .join(dt.select(F.col("source").alias("src_b"), "h"), "h")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    theta = (F.col("kth").cast("double") + F.lit(1.0)) / F.lit(float(2**32))
    est_union = (F.col("k_eff").cast("double") - 1.0) / theta
    return (
        est.join(F.broadcast(ex_a), "src_a")
        .join(F.broadcast(ex_b), "src_b")
        .join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.col("k_eff").cast("long").alias("k_eff"),
            F.col("shared_k").cast("long").alias("shared_k"),
            F.floor(est_union + F.lit(0.5)).cast("long").alias("est_union"),
            F.floor(
                F.col("shared_k").cast("double") / F.col("k_eff") * est_union
                + F.lit(0.5)
            )
            .cast("long")
            .alias("est_inter"),
            F.col("nd_a").cast("long").alias("exact_a"),
            F.col("nd_b").cast("long").alias("exact_b"),
            F.coalesce(F.col("exact_inter"), F.lit(0))
            .cast("long")
            .alias("exact_inter"),
        )
    )


def _oracle_kmv_intersect() -> str:
    h32 = _hash32("text").replace("instr(", "strpos(")
    return f"""
WITH dt AS (
  SELECT DISTINCT source, CAST({h32} AS BIGINT) AS h
  FROM documents WHERE text IS NOT NULL),
sk AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM dt) WHERE rn <= {_KMV_K}),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM (SELECT DISTINCT source FROM sk) a,
       (SELECT DISTINCT source FROM sk) b
  WHERE a.source < b.source),
merged AS (
  SELECT p.src_a, p.src_b, s.h,
         max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.source IN (p.src_a, p.src_b)
  GROUP BY p.src_a, p.src_b, s.h),
topk AS (
  SELECT * FROM (
    SELECT src_a, src_b, h, in_a, in_b,
           row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
    FROM merged) WHERE rn <= {_KMV_K}),
est AS (
  SELECT src_a, src_b, max(h) AS kth, count(*) AS k_eff,
         sum(in_a * in_b) AS shared_k
  FROM topk GROUP BY src_a, src_b),
ex_d AS (SELECT source, count(DISTINCT h) AS nd FROM dt GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS exact_inter
  FROM dt a JOIN dt b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT e.src_a, e.src_b,
       CAST(e.k_eff AS BIGINT) AS k_eff,
       CAST(e.shared_k AS BIGINT) AS shared_k,
       CAST(floor((CAST(e.k_eff AS DOUBLE) - 1.0)
                  / ((CAST(e.kth AS DOUBLE) + 1.0) / 4294967296.0) + 0.5)
            AS BIGINT) AS est_union,
       CAST(floor(CAST(e.shared_k AS DOUBLE) / e.k_eff
                  * ((CAST(e.k_eff AS DOUBLE) - 1.0)
                     / ((CAST(e.kth AS DOUBLE) + 1.0) / 4294967296.0)) + 0.5)
            AS BIGINT) AS est_inter,
       CAST(da.nd AS BIGINT) AS exact_a,
       CAST(db.nd AS BIGINT) AS exact_b,
       CAST(coalesce(i.exact_inter, 0) AS BIGINT) AS exact_inter
FROM est e
JOIN ex_d da ON e.src_a = da.source
JOIN ex_d db ON e.src_b = db.source
LEFT JOIN inter i ON e.src_a = i.src_a AND e.src_b = i.src_b
"""


SURVIVAL_QUERIES = {
    "holt_smoothing": q_holt_smoothing,
    "kaplan_meier": q_kaplan_meier,
    "range_partition_plan": q_range_partition_plan,
    "fellegi_sunter": q_fellegi_sunter,
    "kmv_intersect": q_kmv_intersect,
}

SURVIVAL_ORACLES = {
    "holt_smoothing": ORACLE_HOLT_SMOOTHING,
    "kaplan_meier": ORACLE_KAPLAN_MEIER,
    "range_partition_plan": ORACLE_RANGE_PARTITION_PLAN,
    "fellegi_sunter": _oracle_fellegi_sunter(),
    "kmv_intersect": _oracle_kmv_intersect(),
}

_q.QUERIES.update(SURVIVAL_QUERIES)
_q.ORACLES.update(SURVIVAL_ORACLES)
