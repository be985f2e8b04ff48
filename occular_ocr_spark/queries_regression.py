"""Model-fit & multi-level reporting catalog, round 4 (wave 33): five
operators spanning the regression, OLAP-reporting, link-analysis,
information-theory, and collocation surfaces —

* ``ols_fit`` — distributed ordinary-least-squares: regress document
  length on (token count, distinct-token count) via the normal
  equations.  The
  whole fit is ONE partial-aggregated moment scan (9 exact integer
  sums); the 3x3 solve is Cramer's rule evaluated as exact DECIMAL
  determinants INSIDE the query — no driver-side linear algebra, no
  collect.  Emitted as both the exact homogeneous solution
  (det, det_b0..det_b2 — the coefficients as exact rationals
  det_i/det) and the rounded double coefficients.
* ``grouping_sets_report`` — the multi-level OLAP rollup: one CUBE
  over (source, lang) produces the cell / row-margin / column-margin /
  grand-total report in a single shuffle (Spark expands grouping sets
  map-side; each set partial-aggregates).  The missing relational
  surface next to ``rollup_daily``'s single-axis rollup.
* ``hits_scores`` — 2-iteration HITS hubs & authorities over the
  weighted user->event_type bipartite graph: the second classic
  link-analysis fixpoint next to ``pagerank_bipartite``, with the
  same float32-quantization FP contract per iteration.
* ``mutual_information`` — I(source; lang) cell table: each cell's
  (n_xy/N)·log2(N·n_xy/(n_x·n_y)) term plus the corpus MI total —
  the dataset-card "how redundant are these two facets" number.
* ``collocations_llr`` — Dunning log-likelihood-ratio (G²) bigram
  collocations: the significance-tested upgrade of ``bigram_pmi``
  (PMI over-weights rare pairs; G² does not), from the same in-array
  bigram build and the 2x2 contingency per pair.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_regression_wave.py.

Cross-engine float policy: ``ols_fit`` moments and determinants are
exact integer arithmetic end-to-end (Spark DECIMAL(38,0) products of
DECIMAL(20,0) sums; DuckDB HUGEINT) — the only floats are the final
display coefficients, rounded at 6 dp from the same exact integers;
``hits_scores`` casts scores to float32 after every normalization on
both engines (the ``pagerank_bipartite`` doctrine) and rounds at 8 dp;
``mutual_information`` quantizes each cell's term to a micro-unit
BIGINT before the corpus total (the ``welch_ttest`` doctrine: an
integer sum is order-independent, a float sum is not);
``collocations_llr`` rounds G² at 4 dp from exact-integer-derived
doubles (the ``bigram_pmi`` doctrine), with 0·ln(0) handled as 0 on
both engines.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the stats family (``welch_ttest``,
``anova_f_source``), the graph family (``pagerank_bipartite``
queries_scale.py:449 — same bipartite build and FP contract), the
relational shell (``rollup_daily``), and the collocation family
(``bigram_pmi`` queries_scale.py:449 — same tokenizer and rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

# Collocation support floor: a bigram must occur this often to be
# scored (rare-pair G² terms are noise and bloat the output).
_LLR_MIN_COUNT = 5
# HITS power iterations (unrolled, like pagerank/kmeans).
_HITS_ITERS = 2


# ---------------------------------------------------------------------------
# ols_fit
# ---------------------------------------------------------------------------


def q_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of y = n_chars on x1 = token count, x2 = distinct-token
    count (vocabulary richness — correlated with x1 but not collinear,
    so the normal matrix is well-conditioned on any non-degenerate
    corpus).

    One moment scan: n, Sx1, Sx2, Sy, Sx1x1, Sx1x2, Sx2x2, Sx1y, Sx2y
    — all exact integers (the features are integer-valued), partial-
    aggregated map-side; the scan is the ONLY pass over the data and
    the only exchange is the 9-column single-row final aggregate.
    Cramer's rule on the 3x3 normal matrix is then pure expression
    arithmetic on that one row: DECIMAL(20,0) sums so every 3-way
    product types within DECIMAL(38,0) exactly (values ~1e30 at sf0.1
    << 1e38; at larger SFs center the features first — the standard
    conditioning fix — which this catalog entry documents rather than
    hides).  Coefficients are emitted exactly as (det_b_i, det) pairs
    and, for display, as round(det_b_i / det, 6) doubles — both
    engines divide the SAME exact integers.

    Scale: nothing but the scan; no shuffle wider than one row.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
        F.col("n_chars").cast("long").alias("y"),
    )
    feats = d.select(
        F.size(F.filter(F.split("t", " "), lambda w: w != "")).cast("long").alias("x1"),
        F.size(
            F.array_distinct(F.filter(F.split("t", " "), lambda w: w != ""))
        ).cast("long").alias("x2"),
        "y",
    )
    dec = "decimal(20,0)"
    m = feats.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("x1").cast(dec).alias("sx1"),
        F.sum("x2").cast(dec).alias("sx2"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast(dec).alias("sx1x1"),
        F.sum(F.col("x1") * F.col("x2")).cast(dec).alias("sx1x2"),
        F.sum(F.col("x2") * F.col("x2")).cast(dec).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("y")).cast(dec).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast(dec).alias("sx2y"),
    )

    def det3(a, b, c, d_, e, f_, g, h, i):
        # |a b c; d e f; g h i| with each 2x2 minor formed first so the
        # deepest product is (20,0)x(20,0)->(38,0) exact.
        return (
            F.col(a) * (F.col(e) * F.col(i) - F.col(f_) * F.col(h))
            - F.col(b) * (F.col(d_) * F.col(i) - F.col(f_) * F.col(g))
            + F.col(c) * (F.col(d_) * F.col(h) - F.col(e) * F.col(g))
        )

    # Normal matrix rows: [n sx1 sx2 | sy], [sx1 sx1x1 sx1x2 | sx1y],
    # [sx2 sx1x2 sx2x2 | sx2y].
    out = m.select(
        F.col("n").cast("long").alias("n"),
        det3("n", "sx1", "sx2", "sx1", "sx1x1", "sx1x2", "sx2", "sx1x2", "sx2x2")
        .alias("det"),
        det3("sy", "sx1", "sx2", "sx1y", "sx1x1", "sx1x2", "sx2y", "sx1x2", "sx2x2")
        .alias("det_b0"),
        det3("n", "sy", "sx2", "sx1", "sx1y", "sx1x2", "sx2", "sx2y", "sx2x2")
        .alias("det_b1"),
        det3("n", "sx1", "sy", "sx1", "sx1x1", "sx1y", "sx2", "sx1x2", "sx2y")
        .alias("det_b2"),
    )
    return out.select(
        "n",
        F.col("det").cast("decimal(38,0)").alias("det"),
        F.col("det_b0").cast("decimal(38,0)").alias("det_b0"),
        F.col("det_b1").cast("decimal(38,0)").alias("det_b1"),
        F.col("det_b2").cast("decimal(38,0)").alias("det_b2"),
        (
            F.round(F.col("det_b0").cast("double") / F.col("det").cast("double"), 6)
            + F.lit(0.0)
        ).alias("b0"),
        (
            F.round(F.col("det_b1").cast("double") / F.col("det").cast("double"), 6)
            + F.lit(0.0)
        ).alias("b1"),
        (
            F.round(F.col("det_b2").cast("double") / F.col("det").cast("double"), 6)
            + F.lit(0.0)
        ).alias("b2"),
    )


ORACLE_OLS_FIT = """
WITH feats AS (
  SELECT len(list_filter(string_split(coalesce(text, ''), ' '),
                         w -> w <> '')) AS x1,
         len(list_distinct(list_filter(string_split(coalesce(text, ''), ' '),
                                       w -> w <> ''))) AS x2,
         n_chars AS y
  FROM documents),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x1) AS HUGEINT) AS sx1,
         CAST(sum(x2) AS HUGEINT) AS sx2,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x1 * x1) AS HUGEINT) AS sx1x1,
         CAST(sum(x1 * x2) AS HUGEINT) AS sx1x2,
         CAST(sum(x2 * x2) AS HUGEINT) AS sx2x2,
         CAST(sum(x1 * y) AS HUGEINT) AS sx1y,
         CAST(sum(x2 * y) AS HUGEINT) AS sx2y
  FROM feats),
dets AS (
  SELECT n,
         n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
           - sx1 * (sx1 * sx2x2 - sx1x2 * sx2)
           + sx2 * (sx1 * sx1x2 - sx1x1 * sx2) AS det,
         sy * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
           - sx1 * (sx1y * sx2x2 - sx1x2 * sx2y)
           + sx2 * (sx1y * sx1x2 - sx1x1 * sx2y) AS det_b0,
         n * (sx1y * sx2x2 - sx1x2 * sx2y)
           - sy * (sx1 * sx2x2 - sx1x2 * sx2)
           + sx2 * (sx1 * sx2y - sx1y * sx2) AS det_b1,
         n * (sx1x1 * sx2y - sx1y * sx1x2)
           - sx1 * (sx1 * sx2y - sx1y * sx2)
           + sy * (sx1 * sx1x2 - sx1x1 * sx2) AS det_b2
  FROM m)
SELECT CAST(n AS BIGINT) AS n,
       CAST(det AS DECIMAL(38,0)) AS det,
       CAST(det_b0 AS DECIMAL(38,0)) AS det_b0,
       CAST(det_b1 AS DECIMAL(38,0)) AS det_b1,
       CAST(det_b2 AS DECIMAL(38,0)) AS det_b2,
       round(CAST(det_b0 AS DOUBLE) / CAST(det AS DOUBLE), 6) + 0.0 AS b0,
       round(CAST(det_b1 AS DOUBLE) / CAST(det AS DOUBLE), 6) + 0.0 AS b1,
       round(CAST(det_b2 AS DOUBLE) / CAST(det AS DOUBLE), 6) + 0.0 AS b2
FROM dets
"""


# ---------------------------------------------------------------------------
# grouping_sets_report
# ---------------------------------------------------------------------------


def q_grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(source, lang): the 4-level report — per-cell, per-source
    margin, per-lang margin, grand total — in ONE pass.

    Spark expands the cube map-side (an Expand node: each input row is
    replicated per grouping set BEFORE the exchange) and the single
    shuffle carries partial aggregates per (set, keys) — the same
    network cost as running the 4 group-bys fused, with one scan
    instead of four.  ``grp_id`` is derived from the rolled-up NULLs
    (inputs are coalesced to a sentinel first, so a NULL in the output
    can ONLY mean "rolled up" — never a NULL data value; the
    sorted_neighborhood ADVICE-r3 lesson).

    Scale: one scan + one partial-agg exchange of at most
    4x|cells| rows; no windows, no joins.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.coalesce(F.col("source"), F.lit("(null)")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("(null)")).alias("lang"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    return (
        d.cube("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("char_sum"),
        )
        .select(
            "source",
            "lang",
            (
                F.when(F.col("source").isNull(), F.lit(2)).otherwise(F.lit(0))
                + F.when(F.col("lang").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).cast("int").alias("grp_id"),
            "n_docs",
            F.col("char_sum").cast("long").alias("char_sum"),
        )
    )


ORACLE_GROUPING_SETS_REPORT = """
WITH d AS (
  SELECT coalesce(source, '(null)') AS source,
         coalesce(lang, '(null)') AS lang,
         n_chars
  FROM documents)
SELECT source, lang,
       CAST(CASE WHEN source IS NULL THEN 2 ELSE 0 END
            + CASE WHEN lang IS NULL THEN 1 ELSE 0 END AS INTEGER) AS grp_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS char_sum
FROM d
GROUP BY CUBE (source, lang)
"""


# ---------------------------------------------------------------------------
# hits_scores
# ---------------------------------------------------------------------------


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (2 power iterations, L1-normalized)
    over the weighted user->event_type bipartite graph.

    Edge weights are the exact (user, event_type) counts — ONE
    partial-agg shuffle builds the graph.  Each iteration: the
    authority update joins edges to hub scores on user_id (the wide
    key) and partial-aggregates per event_type; the hub update joins
    the TINY authority table back via broadcast — the wide side never
    re-shuffles for it.  L1 normalization is a 1-row broadcast
    crossJoin (no second pass).

    FP contract (``pagerank_bipartite`` doctrine): scores are cast to
    float32 after EVERY normalization on both engines, so partial-agg
    summation order cannot diverge below the quantization; output
    rounds the float32 value at 8 dp.

    Scale: per iteration one user-keyed exchange + one broadcast join;
    authority state is |event_type|-sized (vocabulary, not corpus).
    """
    e = _t(spark, sf_dir, "events").select("user_id", "event_type")
    # release-tracked: every iteration joins this weighted edge table —
    # one corpus scan + partial-agg exchange builds it, then ONE small
    # repartition keys the (much smaller) aggregated edge table by
    # user_id so every per-iteration user-keyed join and groupBy below
    # reuses the cached partitioning with ZERO further wide exchanges
    # (guide §2.4: two operations keyed the same way share one exchange).
    edges = _q._persist_tracked(
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").cast("double").alias("w"))
        .repartition("user_id")
    )
    hubs = None
    auth = None
    for it in range(_HITS_ITERS):
        if it == 0:
            # h0 is 1.0f for exactly the user_ids present in edges, so
            # the first authority update's sum(w * h) is term-for-term
            # sum(w * 1.0) = sum(w): the distinct() pass and the
            # edges-to-h0 join the unrolled form paid are pure no-ops.
            a_raw = edges.groupBy("event_type").agg(F.sum("w").alias("s"))
        else:
            a_raw = (
                edges.join(hubs, "user_id")
                .groupBy("event_type")
                .agg(F.sum(F.col("w") * F.col("h")).alias("s"))
            )
        # per-iteration state is persisted (released by the harness's
        # release_persists) so each intermediate is computed ONCE: the
        # unrolled references otherwise re-embed the whole iteration
        # history and the plan grows exponentially with _HITS_ITERS
        # (the r06 before-plan had 450 Exchange occurrences).
        a_raw = _q._persist_tracked(a_raw)
        a_tot = a_raw.agg(F.sum("s").alias("tot"))
        auth = a_raw.crossJoin(F.broadcast(a_tot)).select(
            "event_type", (F.col("s") / F.col("tot")).cast("float").alias("a")
        )
        h_raw = _q._persist_tracked(
            edges.join(F.broadcast(auth), "event_type")
            .groupBy("user_id")
            .agg(F.sum(F.col("w") * F.col("a")).alias("s"))
        )
        h_tot = h_raw.agg(F.sum("s").alias("tot"))
        hubs = h_raw.crossJoin(F.broadcast(h_tot)).select(
            "user_id", (F.col("s") / F.col("tot")).cast("float").alias("h")
        )
    out_h = hubs.select(
        F.lit("hub").alias("side"),
        F.col("user_id").cast("string").alias("node"),
        F.round(F.col("h").cast("double"), 8).alias("score"),
    )
    out_a = auth.select(
        F.lit("authority").alias("side"),
        F.col("event_type").alias("node"),
        F.round(F.col("a").cast("double"), 8).alias("score"),
    )
    return out_h.unionAll(out_a)


ORACLE_HITS_SCORES = """
WITH edges AS (
  SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS w
  FROM events GROUP BY user_id, event_type),
h0 AS (SELECT DISTINCT user_id, CAST(1.0 AS REAL) AS h FROM edges),
a1r AS (
  SELECT e.event_type, sum(e.w * h0.h) AS s
  FROM edges e JOIN h0 USING (user_id) GROUP BY e.event_type),
a1 AS (
  SELECT event_type, CAST(s / (SELECT sum(s) FROM a1r) AS REAL) AS a
  FROM a1r),
h1r AS (
  SELECT e.user_id, sum(e.w * a1.a) AS s
  FROM edges e JOIN a1 USING (event_type) GROUP BY e.user_id),
h1 AS (
  SELECT user_id, CAST(s / (SELECT sum(s) FROM h1r) AS REAL) AS h
  FROM h1r),
a2r AS (
  SELECT e.event_type, sum(e.w * h1.h) AS s
  FROM edges e JOIN h1 USING (user_id) GROUP BY e.event_type),
a2 AS (
  SELECT event_type, CAST(s / (SELECT sum(s) FROM a2r) AS REAL) AS a
  FROM a2r),
h2r AS (
  SELECT e.user_id, sum(e.w * a2.a) AS s
  FROM edges e JOIN a2 USING (event_type) GROUP BY e.user_id),
h2 AS (
  SELECT user_id, CAST(s / (SELECT sum(s) FROM h2r) AS REAL) AS h
  FROM h2r)
SELECT 'hub' AS side, CAST(user_id AS VARCHAR) AS node,
       round(CAST(h AS DOUBLE), 8) AS score
FROM h2
UNION ALL
SELECT 'authority' AS side, event_type AS node,
       round(CAST(a AS DOUBLE), 8) AS score
FROM a2
"""


# ---------------------------------------------------------------------------
# mutual_information
# ---------------------------------------------------------------------------


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I(source; lang): per-cell PMI-weighted terms plus the corpus
    total — "does knowing the source tell you the language" as one
    number, with the cell table showing WHERE the dependence lives.

    Shape: one groupBy(source, lang) for the cells; the two marginal
    tables are re-aggregated FROM the cell table (vocabulary-sized, no
    second corpus scan) and joined back; N rides a 1-row broadcast.
    Each cell's term (n_xy/N)·log2(N·n_xy/(n_x·n_y)) is computed on
    exact-integer-derived doubles and quantized to a micro-unit BIGINT
    BEFORE the corpus sum (welch_ttest doctrine: integer sums are
    order-independent), so ``mi_total_micro`` is bit-identical on both
    engines.

    Scale: one corpus shuffle (the cell groupBy); everything after is
    |sources|x|langs|-sized.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.coalesce(F.col("source"), F.lit("(null)")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("(null)")).alias("lang"),
    )
    # release-tracked: marginals, N, and the final join all re-read this
    # |sources|x|langs|-sized table — one corpus scan total
    cells = _q._persist_tracked(
        d.groupBy("source", "lang").agg(F.count("*").alias("n_xy"))
    )
    mx = cells.groupBy("source").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("lang").agg(F.sum("n_xy").alias("n_y"))
    n = cells.agg(F.sum("n_xy").alias("n_tot"))
    term = (
        F.col("n_xy").cast("double")
        / F.col("n_tot")
        * F.log2(
            F.col("n_tot").cast("double")
            * F.col("n_xy")
            / (F.col("n_x").cast("double") * F.col("n_y"))
        )
    )
    scored = (
        cells.join(mx, "source")
        .join(my, "lang")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "lang",
            F.col("n_xy").cast("long").alias("n_xy"),
            F.col("n_x").cast("long").alias("n_x"),
            F.col("n_y").cast("long").alias("n_y"),
            F.floor(term * 1e6 + F.lit(0.5)).cast("long").alias("mi_term_micro"),
        )
    )
    total = scored.agg(F.sum("mi_term_micro").alias("mi_total_micro"))
    return scored.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_xy",
        "n_x",
        "n_y",
        "mi_term_micro",
        F.col("mi_total_micro").cast("long").alias("mi_total_micro"),
    )


ORACLE_MUTUAL_INFORMATION = """
WITH d AS (
  SELECT coalesce(source, '(null)') AS source,
         coalesce(lang, '(null)') AS lang
  FROM documents),
cells AS (SELECT source, lang, count(*) AS n_xy FROM d GROUP BY source, lang),
mx AS (SELECT source, sum(n_xy) AS n_x FROM cells GROUP BY source),
my AS (SELECT lang, sum(n_xy) AS n_y FROM cells GROUP BY lang),
n AS (SELECT sum(n_xy) AS n_tot FROM cells),
scored AS (
  SELECT c.source, c.lang,
         CAST(c.n_xy AS BIGINT) AS n_xy,
         CAST(mx.n_x AS BIGINT) AS n_x,
         CAST(my.n_y AS BIGINT) AS n_y,
         CAST(floor(CAST(c.n_xy AS DOUBLE) / n.n_tot
                    * log2(CAST(n.n_tot AS DOUBLE) * c.n_xy
                           / (CAST(mx.n_x AS DOUBLE) * my.n_y))
                    * 1e6 + 0.5) AS BIGINT) AS mi_term_micro
  FROM cells c JOIN mx USING (source) JOIN my USING (lang), n)
SELECT source, lang, n_xy, n_x, n_y, mi_term_micro,
       (SELECT sum(mi_term_micro) FROM scored) AS mi_total_micro
FROM scored
"""


# ---------------------------------------------------------------------------
# collocations_llr
# ---------------------------------------------------------------------------


def q_collocations_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning G² bigram collocations: 2·Σ O·ln(O/E) over the 2x2
    contingency (bigram present/absent x first-word/second-word),
    O-terms with O=0 contributing 0.

    Bigrams build in-array exactly as ``bigram_pmi`` (element_at +
    concat_ws after an int-sequence explode — stays in whole-stage
    codegen); the margins c_x (bigrams starting with w1) and c_y
    (bigrams ending with w2) re-aggregate FROM the bigram count table
    — vocabulary-sized, no second corpus pass.  N is the total bigram
    count on a 1-row broadcast.  G² is computed on exact-integer-
    derived doubles and rounded at 4 dp (+0.0 normalizes IEEE -0.0,
    the bigram_pmi lesson).

    Scale: one corpus shuffle (bigram groupBy) + two vocabulary-sized
    self-aggregations and joins; the min-count filter prunes the join
    input, not just the output.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("toks")
    )
    big = (
        toks.select(
            F.explode(
                F.when(
                    F.size("toks") >= 2, F.sequence(F.lit(1), F.size("toks") - 1)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
            "toks",
        )
        .select(
            F.element_at("toks", F.col("i")).alias("w1"),
            F.element_at("toks", F.col("i") + 1).alias("w2"),
        )
        .where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
    )
    # release-tracked (queries.release_persists, the ADVICE-r3 leak
    # rule): the margins and the total all re-read this vocabulary-sized
    # table — one corpus tokenize pass, not four
    big = _q._persist_tracked(big)
    cx = big.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    cy = big.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    n = big.agg(F.sum("c_xy").alias("n_big"))

    def o_ln_o_over_e(o, e):
        # 0·ln(0/E) := 0; E>0 always holds for the cells we emit.
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    o11 = F.col("c_xy").cast("double")
    o12 = (F.col("c_x") - F.col("c_xy")).cast("double")
    o21 = (F.col("c_y") - F.col("c_xy")).cast("double")
    o22 = (F.col("n_big") - F.col("c_x") - F.col("c_y") + F.col("c_xy")).cast(
        "double"
    )
    nn = F.col("n_big").cast("double")
    r1 = F.col("c_x").cast("double")
    r2 = nn - r1
    k1 = F.col("c_y").cast("double")
    k2 = nn - k1
    g2 = (
        F.lit(2.0)
        * (
            o_ln_o_over_e(o11, r1 * k1 / nn)
            + o_ln_o_over_e(o12, r1 * k2 / nn)
            + o_ln_o_over_e(o21, r2 * k1 / nn)
            + o_ln_o_over_e(o22, r2 * k2 / nn)
        )
    )
    return (
        big.where(F.col("c_xy") >= _LLR_MIN_COUNT)
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            (F.round(g2, 4) + F.lit(0.0)).alias("llr"),
        )
    )


ORACLE_COLLOCATIONS_LLR = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), ' ')) AS w,
         unnest(range(1, len(string_split(coalesce(text, ''), ' ')) + 1)) AS pos
  FROM documents),
pairs AS (
  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks),
big AS (
  SELECT w1, w2, count(*) AS c_xy FROM pairs
  WHERE w2 IS NOT NULL AND w1 <> '' AND w2 <> ''
  GROUP BY w1, w2),
cx AS (SELECT w1, sum(c_xy) AS c_x FROM big GROUP BY w1),
cy AS (SELECT w2, sum(c_xy) AS c_y FROM big GROUP BY w2),
n AS (SELECT sum(c_xy) AS n_big FROM big),
cont AS (
  SELECT b.w1, b.w2,
         CAST(b.c_xy AS DOUBLE) AS o11,
         CAST(cx.c_x - b.c_xy AS DOUBLE) AS o12,
         CAST(cy.c_y - b.c_xy AS DOUBLE) AS o21,
         CAST(n.n_big - cx.c_x - cy.c_y + b.c_xy AS DOUBLE) AS o22,
         CAST(cx.c_x AS DOUBLE) AS r1,
         CAST(n.n_big - cx.c_x AS DOUBLE) AS r2,
         CAST(cy.c_y AS DOUBLE) AS k1,
         CAST(n.n_big - cy.c_y AS DOUBLE) AS k2,
         CAST(n.n_big AS DOUBLE) AS nn,
         b.c_xy, cx.c_x, cy.c_y
  FROM big b JOIN cx USING (w1) JOIN cy USING (w2), n
  WHERE b.c_xy >= {_LLR_MIN_COUNT})
SELECT w1, w2,
       CAST(c_xy AS BIGINT) AS c_xy,
       CAST(c_x AS BIGINT) AS c_x,
       CAST(c_y AS BIGINT) AS c_y,
       round(2.0 * (
           CASE WHEN o11 > 0 THEN o11 * ln(o11 / (r1 * k1 / nn)) ELSE 0 END
         + CASE WHEN o12 > 0 THEN o12 * ln(o12 / (r1 * k2 / nn)) ELSE 0 END
         + CASE WHEN o21 > 0 THEN o21 * ln(o21 / (r2 * k1 / nn)) ELSE 0 END
         + CASE WHEN o22 > 0 THEN o22 * ln(o22 / (r2 * k2 / nn)) ELSE 0 END), 4)
         + 0.0 AS llr
FROM cont
"""


REGRESSION_QUERIES = {
    "ols_fit": q_ols_fit,
    "grouping_sets_report": q_grouping_sets_report,
    "hits_scores": q_hits_scores,
    "mutual_information": q_mutual_information,
    "collocations_llr": q_collocations_llr,
}

REGRESSION_ORACLES = {
    "ols_fit": ORACLE_OLS_FIT,
    "grouping_sets_report": ORACLE_GROUPING_SETS_REPORT,
    "hits_scores": ORACLE_HITS_SCORES,
    "mutual_information": ORACLE_MUTUAL_INFORMATION,
    "collocations_llr": ORACLE_COLLOCATIONS_LLR,
}

_q.QUERIES.update(REGRESSION_QUERIES)
_q.ORACLES.update(REGRESSION_ORACLES)
