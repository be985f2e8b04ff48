"""Decoding, storage-planning & nonparametrics catalog, round 4
(wave 37): five operators spanning the sequence-decoding, columnar-
storage, nonparametric-testing, tree-learning, and richness surfaces —

* ``viterbi_decode`` — Viterbi maximum-likelihood state decoding of a
  fixed 2-state HMM over each user's time-ordered event sequence.
  The DP recursion (max-plus over integer micro log-probs) runs
  INSIDE a per-user ``F.aggregate``; the decoded path is built
  forward by carrying one candidate path per state — the textbook
  O(states²·T) decode with exact integer scores, no backtrace pass.
* ``encoding_planner`` — the columnar-encoding advisor: per column
  (source, lang), run counts over the doc_id-ordered layout
  (successor equi-join, never a global window), distinct counts, and
  the estimated bytes under PLAIN / DICTIONARY / RLE — the decision
  a parquet writer makes per column chunk.
* ``wilcoxon_signed_rank`` — the paired nonparametric pre/post test
  (the CUPED companion): per-user spend diffs, midranks of |diff|
  from the value histogram (exact doubled-midrank integers), W⁺ and
  the tie-corrected normal approximation z.
* ``gini_split_search`` — the CART decision-stump split search:
  best n_chars threshold for predicting lang = 'en' by weighted Gini
  impurity, evaluated for EVERY candidate threshold via prefix sums
  over the value histogram (one pass, no per-threshold rescan).
* ``chao1_richness`` — per-source Chao1 vocabulary-richness estimate
  V + F1(F1−1)/(2(F2+1)) (bias-corrected) from per-source count-of-
  counts — "how much vocabulary haven't we seen yet", the
  Good–Turing companion at the source grain.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_decode_wave.py.

Cross-engine float policy: ``viterbi_decode`` is exact-integer
end-to-end (the HMM tables are micro-unit BIGINT constants; max-plus
ties break to the lower state on both engines);
``wilcoxon_signed_rank`` keeps midranks as exact doubled integers and
quantizes only the final z to micro; ``gini_split_search`` quantizes
each threshold's weighted impurity to a nano-unit BIGINT (argmin
compares integers, ties to the smallest threshold);
``chao1_richness`` is one exact rational per source with a final
micro division; ``encoding_planner`` is exact-integer end-to-end.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the sequence family
(``event_markov``, ``holt_smoothing`` — same F.aggregate recursion
shape), the storage family (``zorder_cluster``, ``compaction_plan``,
``zone_map_prune``), the stats family (``welch_ttest``,
``cuped_adjustment``), and the vocabulary family
(``good_turing_counts``, ``zipf_fit``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# 2-state HMM over the 5 event types, log-probs in micro-units.
# State 0 = "browse" (view/click heavy), state 1 = "transact"
# (purchase/signup/error heavy).  Values are ln(p)·1e6 of a proper
# probability table, frozen as integer constants.
_HMM_TYPES = ("click", "error", "purchase", "signup", "view")
_HMM_INIT = (-510_826, -916_291)          # ln(0.6), ln(0.4)
_HMM_TRANS = (
    (-223_144, -1_609_438),               # 0->0 ln(0.8), 0->1 ln(0.2)
    (-1_203_973, -356_675),               # 1->0 ln(0.3), 1->1 ln(0.7)
)
_HMM_EMIT = (
    # click     error       purchase    signup      view
    (-1_203_973, -2_995_732, -2_995_732, -2_995_732, -510_826),
    (-2_302_585, -1_609_438, -1_203_973, -1_897_120, -2_302_585),
)
# Wilcoxon/Gini/Chao constants.
_GINI_LABEL = "en"


# ---------------------------------------------------------------------------
# viterbi_decode
# ---------------------------------------------------------------------------


def _emit_expr(x, state: int):
    """Emission log-prob (micro) of event-type string ``x`` in state."""
    e = _HMM_EMIT[state]
    expr = F.lit(e[-1])
    for t, v in zip(_HMM_TYPES[:-1], e[:-1]):
        expr = F.when(x == t, F.lit(v)).otherwise(expr)
    return expr


def q_viterbi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decode per user: best path log-prob (micro) and the
    decoded state string under the frozen 2-state HMM.

    Max-plus DP over exact integers; at every step each state keeps
    the better predecessor (ties -> state 0, deterministically) and
    appends its digit to that predecessor's candidate path.  The
    recursion is ``F.aggregate`` over the (ts, event_id)-sorted event
    array — per-user-bounded, corpus-parallel.

    Scale: one events shuffle (the per-user collect); path strings
    are |events-per-user| chars — the same order as the raw data.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").cast("long").alias("eid"),
            F.col("event_type").alias("et"),
        ).alias("e"),
    )
    series = ev.groupBy("user_id").agg(F.array_sort(F.collect_list("e")).alias("s"))
    first = F.element_at("s", 1)["et"]
    init = F.struct(
        (F.lit(_HMM_INIT[0]) + _emit_expr(first, 0)).alias("s0"),
        (F.lit(_HMM_INIT[1]) + _emit_expr(first, 1)).alias("s1"),
        F.lit("0").alias("p0"),
        F.lit("1").alias("p1"),
    )

    def step(acc, e):
        x = e["et"]
        c00 = acc["s0"] + F.lit(_HMM_TRANS[0][0])
        c10 = acc["s1"] + F.lit(_HMM_TRANS[1][0])
        c01 = acc["s0"] + F.lit(_HMM_TRANS[0][1])
        c11 = acc["s1"] + F.lit(_HMM_TRANS[1][1])
        best0 = F.greatest(c00, c10) + _emit_expr(x, 0)
        best1 = F.greatest(c01, c11) + _emit_expr(x, 1)
        # ties -> the state-0 predecessor (>= keeps 0)
        p0 = F.concat(F.when(c00 >= c10, acc["p0"]).otherwise(acc["p1"]), F.lit("0"))
        p1 = F.concat(F.when(c01 >= c11, acc["p0"]).otherwise(acc["p1"]), F.lit("1"))
        return F.struct(
            best0.alias("s0"), best1.alias("s1"), p0.alias("p0"), p1.alias("p1")
        )

    fin = F.aggregate(F.slice(F.col("s"), 2, F.size("s") - 1), init, step)
    return series.select(
        "user_id",
        F.size("s").cast("long").alias("n_events"),
        F.greatest(fin["s0"], fin["s1"]).alias("best_micro"),
        F.when(fin["s0"] >= fin["s1"], fin["p0"]).otherwise(fin["p1"]).alias("path"),
    )


def _emit_sql(x: str, state: int) -> str:
    e = _HMM_EMIT[state]
    cases = " ".join(
        f"WHEN '{t}' THEN {v}" for t, v in zip(_HMM_TYPES[:-1], e[:-1])
    )
    return f"(CASE {x} {cases} ELSE {e[-1]} END)"


ORACLE_VITERBI_DECODE = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
series AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM ev),
rec AS (
  SELECT user_id, rn, n,
         CAST({_HMM_INIT[0]} + {_emit_sql('event_type', 0)} AS BIGINT) AS s0,
         CAST({_HMM_INIT[1]} + {_emit_sql('event_type', 1)} AS BIGINT) AS s1,
         '0' AS p0, '1' AS p1
  FROM series WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.n,
         CAST(greatest(r.s0 + {_HMM_TRANS[0][0]}, r.s1 + {_HMM_TRANS[1][0]})
              + {_emit_sql('s.event_type', 0)} AS BIGINT) AS s0,
         CAST(greatest(r.s0 + {_HMM_TRANS[0][1]}, r.s1 + {_HMM_TRANS[1][1]})
              + {_emit_sql('s.event_type', 1)} AS BIGINT) AS s1,
         (CASE WHEN r.s0 + {_HMM_TRANS[0][0]} >= r.s1 + {_HMM_TRANS[1][0]}
               THEN r.p0 ELSE r.p1 END) || '0' AS p0,
         (CASE WHEN r.s0 + {_HMM_TRANS[0][1]} >= r.s1 + {_HMM_TRANS[1][1]}
               THEN r.p0 ELSE r.p1 END) || '1' AS p1
  FROM rec r JOIN series s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       greatest(s0, s1) AS best_micro,
       CASE WHEN s0 >= s1 THEN p0 ELSE p1 END AS path
FROM rec WHERE rn = n
"""


# ---------------------------------------------------------------------------
# encoding_planner
# ---------------------------------------------------------------------------


def q_encoding_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-encoding advisor for the low-cardinality document
    columns under the doc_id-ordered layout.

    Runs are counted by a successor equi-join (doc_id+1 — an id gap
    conservatively ends a run), never a corpus-wide ordered window.
    Estimates (parquet-ish, integer bytes): PLAIN = Σ len(value);
    DICT = Σ dictionary-entry len + 2 bytes/row of codes;
    RLE = runs · (avg value len + 4-byte run header).

    Scale: one scan + one self equi-join on doc_id; per-column stats
    are |columns| partial aggs unioned.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
    )
    d = _q._persist_tracked(d)
    out = None
    for col in ("source", "lang"):
        cur = d.select("doc_id", F.col(col).alias("v"))
        nxt = cur.select((F.col("doc_id") - 1).alias("doc_id"), F.col("v").alias("v2"))
        adj = cur.join(nxt, "doc_id").agg(
            F.sum((F.col("v") == F.col("v2")).cast("long")).alias("eq_adj")
        )
        base = cur.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("v").alias("n_distinct"),
            F.sum(F.length("v")).alias("plain_bytes"),
        )
        dict_bytes = cur.select("v").distinct().agg(
            F.sum(F.length("v")).alias("dict_entry_bytes")
        )
        stats = (
            base.crossJoin(F.broadcast(adj))
            .crossJoin(F.broadcast(dict_bytes))
            .select(
                F.lit(col).alias("column"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                (F.col("n_rows") - F.coalesce(F.col("eq_adj"), F.lit(0)))
                .cast("long")
                .alias("n_runs"),
                F.col("plain_bytes").cast("long").alias("plain_bytes"),
                (F.col("dict_entry_bytes") + 2 * F.col("n_rows"))
                .cast("long")
                .alias("dict_bytes"),
                (
                    (F.col("n_rows") - F.coalesce(F.col("eq_adj"), F.lit(0)))
                    * (
                        F.floor(
                            F.col("plain_bytes").cast("double") / F.col("n_rows")
                            + F.lit(0.5)
                        )
                        + 4
                    )
                )
                .cast("long")
                .alias("rle_bytes"),
            )
        )
        out = stats if out is None else out.unionAll(stats)
    return out


ORACLE_ENCODING_PLANNER = """
WITH d AS (
  SELECT doc_id, coalesce(source, '') AS source, coalesce(lang, '') AS lang
  FROM documents),
cols AS (
  SELECT 'source' AS col, doc_id, source AS v FROM d
  UNION ALL
  SELECT 'lang' AS col, doc_id, lang AS v FROM d),
adj AS (
  SELECT a.col, sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS eq_adj
  FROM cols a JOIN cols b ON a.col = b.col AND b.doc_id = a.doc_id + 1
  GROUP BY a.col),
base AS (
  SELECT col, count(*) AS n_rows, count(DISTINCT v) AS n_distinct,
         sum(length(v)) AS plain_bytes
  FROM cols GROUP BY col),
dictb AS (
  SELECT col, sum(length(v)) AS dict_entry_bytes
  FROM (SELECT DISTINCT col, v FROM cols) GROUP BY col)
SELECT b.col AS "column",
       CAST(b.n_rows AS BIGINT) AS n_rows,
       CAST(b.n_distinct AS BIGINT) AS n_distinct,
       CAST(b.n_rows - coalesce(a.eq_adj, 0) AS BIGINT) AS n_runs,
       CAST(b.plain_bytes AS BIGINT) AS plain_bytes,
       CAST(db.dict_entry_bytes + 2 * b.n_rows AS BIGINT) AS dict_bytes,
       CAST((b.n_rows - coalesce(a.eq_adj, 0))
            * (CAST(floor(CAST(b.plain_bytes AS DOUBLE) / b.n_rows + 0.5)
                    AS BIGINT) + 4) AS BIGINT) AS rle_bytes
FROM base b
LEFT JOIN adj a ON b.col = a.col
JOIN dictb db ON b.col = db.col
"""


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank
# ---------------------------------------------------------------------------


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over per-user (post − pre) spend diffs
    (the cuped_adjustment pre/post split), zeros dropped.

    Midranks come from the |diff| value HISTOGRAM: doubled midrank
    2·prefix + t + 1 stays an exact integer under ties, so W⁺ is
    emitted doubled (``w_plus_x2``).  z uses the tie-corrected
    variance n(n+1)(2n+1)/24 − Σ(t³−t)/48, all exact integers until
    the final micro-quantized division.

    Scale: one events shuffle to per-user; ranking is windows over
    the |diff| histogram (bounded by distinct |diff| values).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value").cast("double") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("v_micro"),
    )
    span = ev.agg(F.min("us").alias("t0"), F.max("us").alias("t1"))
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .withColumn("is_pre", F.col("us") * 2 <= F.col("t0") + F.col("t1"))
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.when(~F.col("is_pre"), F.col("v_micro")).otherwise(F.lit(0)))
                - F.sum(F.when(F.col("is_pre"), F.col("v_micro")).otherwise(F.lit(0)))
            ).alias("diff")
        )
        .where(F.col("diff") != 0)
    )
    hist = per_user.groupBy(F.abs("diff").alias("ad")).agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("t_pos"),
    )
    wp = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "prefix", F.coalesce(F.sum("t").over(wp), F.lit(0))
    ).withColumn("mr2", 2 * F.col("prefix") + F.col("t") + 1)
    agg = ranked.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("t_pos") * F.col("mr2")).alias("w_plus_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    nn = F.col("n").cast("double")
    mean_x2 = nn * (nn + 1) / 2.0  # 2·E[W+] = n(n+1)/2
    var_ = nn * (nn + 1) * (2 * nn + 1) / 24.0 - F.col("tie3").cast("double") / 48.0
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("w_plus_x2").cast("long").alias("w_plus_x2"),
        F.col("tie3").cast("long").alias("tie3"),
        F.floor(
            (F.col("w_plus_x2") - mean_x2) / (2.0 * F.sqrt(var_)) * 1e6 + F.lit(0.5)
        )
        .cast("long")
        .alias("z_micro"),
    )


ORACLE_WILCOXON_SIGNED_RANK = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS v_micro
  FROM events),
span AS (SELECT min(us) AS t0, max(us) AS t1 FROM ev),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN us * 2 > s.t0 + s.t1 THEN v_micro ELSE 0 END)
         - sum(CASE WHEN us * 2 <= s.t0 + s.t1 THEN v_micro ELSE 0 END) AS diff
  FROM ev, span s GROUP BY user_id),
nz AS (SELECT * FROM per_user WHERE diff <> 0),
hist AS (
  SELECT abs(diff) AS ad, count(*) AS t,
         sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS t_pos
  FROM nz GROUP BY abs(diff)),
ranked AS (
  SELECT ad, t, t_pos,
         coalesce(sum(t) OVER (ORDER BY ad
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM hist),
agg AS (
  SELECT sum(t) AS n,
         sum(t_pos * (2 * prefix + t + 1)) AS w_plus_x2,
         sum(t * t * t - t) AS tie3
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n,
       CAST(w_plus_x2 AS BIGINT) AS w_plus_x2,
       CAST(tie3 AS BIGINT) AS tie3,
       CAST(floor((w_plus_x2 - CAST(n AS DOUBLE) * (n + 1) / 2.0)
                  / (2.0 * sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
                                - CAST(tie3 AS DOUBLE) / 48.0))
                  * 1e6 + 0.5) AS BIGINT) AS z_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# gini_split_search
# ---------------------------------------------------------------------------


def q_gini_split_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CART stump: the n_chars threshold minimizing weighted Gini
    impurity for y = [lang = '{_GINI_LABEL}'], all thresholds scored
    from ONE value-histogram prefix pass.

    For split x ≤ v: left (n_l, pos_l) are prefix sums inclusive of
    v; impurity 1 − p² − (1−p)² per side, weighted by side size,
    quantized to nano-units; argmin ties to the smallest threshold.
    Thresholds with an empty right side are excluded (no split).

    Scale: one corpus scan to the (value, count, pos) histogram; the
    scoring pass is windows over that bounded frame; the argmin is a
    1-row sort-limit over it.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("v"),
        (F.coalesce(F.col("lang"), F.lit("")) == _GINI_LABEL)
        .cast("long")
        .alias("y"),
    )
    hist = d.groupBy("v").agg(F.count("*").alias("c"), F.sum("y").alias("p"))
    tot = d.agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    wi = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    pref = (
        hist.crossJoin(F.broadcast(tot))
        .withColumn("n_l", F.sum("c").over(wi))
        .withColumn("p_l", F.sum("p").over(wi))
        .where(F.col("n_l") < F.col("n"))
    )
    n_r = F.col("n") - F.col("n_l")
    p_r = F.col("pos") - F.col("p_l")

    def gini(pos, n):
        pr = pos.cast("double") / n
        return 1.0 - pr * pr - (1.0 - pr) * (1.0 - pr)

    weighted = (
        F.col("n_l").cast("double") * gini(F.col("p_l"), F.col("n_l"))
        + n_r.cast("double") * gini(p_r, n_r)
    ) / F.col("n")
    scored = pref.select(
        F.col("v").alias("threshold"),
        F.col("n_l").cast("long").alias("n_left"),
        F.col("p_l").cast("long").alias("pos_left"),
        n_r.cast("long").alias("n_right"),
        p_r.cast("long").alias("pos_right"),
        F.floor(weighted * 1e9 + F.lit(0.5)).cast("long").alias("gini_nano"),
    )
    return scored.orderBy("gini_nano", "threshold").limit(1)


ORACLE_GINI_SPLIT_SEARCH = f"""
WITH d AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         CASE WHEN coalesce(lang, '') = '{_GINI_LABEL}' THEN 1 ELSE 0 END AS y
  FROM documents),
hist AS (SELECT v, count(*) AS c, sum(y) AS p FROM d GROUP BY v),
tot AS (SELECT count(*) AS n, sum(y) AS pos FROM d),
pref AS (
  SELECT h.v,
         sum(h.c) OVER (ORDER BY h.v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_l,
         sum(h.p) OVER (ORDER BY h.v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_l,
         t.n, t.pos
  FROM hist h, tot t),
scored AS (
  SELECT v AS threshold,
         CAST(n_l AS BIGINT) AS n_left,
         CAST(p_l AS BIGINT) AS pos_left,
         CAST(n - n_l AS BIGINT) AS n_right,
         CAST(pos - p_l AS BIGINT) AS pos_right,
         CAST(floor((n_l * (1.0 - pow(CAST(p_l AS DOUBLE) / n_l, 2)
                            - pow(1.0 - CAST(p_l AS DOUBLE) / n_l, 2))
                     + (n - n_l) * (1.0 - pow(CAST(pos - p_l AS DOUBLE)
                                              / (n - n_l), 2)
                                    - pow(1.0 - CAST(pos - p_l AS DOUBLE)
                                          / (n - n_l), 2)))
                    / n * 1e9 + 0.5) AS BIGINT) AS gini_nano
  FROM pref WHERE n_l < n)
SELECT threshold, n_left, pos_left, n_right, pos_right, gini_nano
FROM scored ORDER BY gini_nano, threshold LIMIT 1
"""


# ---------------------------------------------------------------------------
# chao1_richness
# ---------------------------------------------------------------------------


def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Chao1: observed vocabulary V plus the unseen-mass
    estimate F1(F1−1)/(2(F2+1)) (bias-corrected, finite at F2 = 0).

    Scale: one tokenize shuffle to (source, word) counts, one
    vocabulary-sized rollup per source.
    """
    cws = (
        _t(spark, sf_dir, "documents")
        .select(
            F.coalesce(F.col("source"), F.lit("")).alias("s"),
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("s", "w")
        .agg(F.count("*").alias("c"))
    )
    per = cws.groupBy("s").agg(
        F.count("*").alias("v_obs"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    )
    return per.select(
        F.col("s").alias("source"),
        F.col("v_obs").cast("long").alias("v_obs"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.floor(
            F.col("v_obs")
            + F.col("f1").cast("double")
            * (F.col("f1") - 1)
            / (2.0 * (F.col("f2") + 1))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("chao1"),
    )


ORACLE_CHAO1_RICHNESS = """
WITH cws AS (
  SELECT s, w, count(*) AS c FROM (
    SELECT coalesce(source, '') AS s,
           unnest(string_split(coalesce(text, ''), ' ')) AS w
    FROM documents)
  WHERE w <> '' GROUP BY s, w)
SELECT s AS source,
       CAST(count(*) AS BIGINT) AS v_obs,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       CAST(floor(count(*)
                  + CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
                    / (2.0 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
                  + 0.5) AS BIGINT) AS chao1
FROM cws GROUP BY s
"""


DECODE_QUERIES = {
    "viterbi_decode": q_viterbi_decode,
    "encoding_planner": q_encoding_planner,
    "wilcoxon_signed_rank": q_wilcoxon_signed_rank,
    "gini_split_search": q_gini_split_search,
    "chao1_richness": q_chao1_richness,
}

DECODE_ORACLES = {
    "viterbi_decode": ORACLE_VITERBI_DECODE,
    "encoding_planner": ORACLE_ENCODING_PLANNER,
    "wilcoxon_signed_rank": ORACLE_WILCOXON_SIGNED_RANK,
    "gini_split_search": ORACLE_GINI_SPLIT_SEARCH,
    "chao1_richness": ORACLE_CHAO1_RICHNESS,
}

_q.QUERIES.update(DECODE_QUERIES)
_q.ORACLES.update(DECODE_ORACLES)
