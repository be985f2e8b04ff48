"""Coreset-selection, eval & clustering catalog, round 4 (wave 38):
five operators spanning the data-selection, LLM-eval, uncertainty,
density-clustering, and path-mining surfaces —

* ``submodular_coverage`` — greedy maximum-coverage selection
  (the facility-location coreset): pick k=5 documents maximizing
  marginal NEW-vocabulary coverage, one distributed argmax per round
  (the 1/(1−1/e)-approximate classic).  Each round's driver fetch is
  ONE row; the covered set grows by at most one document's
  vocabulary.
* ``pass_at_k`` — the unbiased pass@k estimator (Chen et al. 2021):
  per user with n events of which c are 'purchase',
  pass@k = 1 − C(n−c,k)/C(n,k), evaluated as the exact 5-term
  falling-factorial product.  The LLM-eval harness statistic,
  replayed over the events fixture.
* ``conformal_interval`` — split-conformal prediction: hash-split
  docs into calibration/test, refit the ``ols_fit`` normal equations
  on calibration only, take the ceil((n+1)(1−α))-th absolute
  residual as q̂ via a TWO-PASS histogram-bucket rank (the
  group_quantiles_dist shape — no global sort), and report test-half
  empirical coverage.
* ``grid_cluster_cc`` — grid-density clustering (DBSCAN-style) on
  the first two embedding dimensions: ε-cells, core cells by
  min-count, connected components over the 8-neighborhood core-cell
  graph.  The cell graph is bounded by the GRID (≤(range/ε)² cells),
  not the data — so its union-find is a legitimately bounded driver
  step, like the K-centroid fetches.
* ``trigram_paths`` — top adjacent event-type trigrams (a→b→c) by
  global support: per-user rank + two co-partitioned successor
  joins; the sequential-pattern companion to ``event_markov`` (depth
  2) and ``seq_pattern_pairs`` (existential).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_coreset_wave.py.

Cross-engine float policy: ``submodular_coverage``, ``trigram_paths``
and the conformal residual RANKING are exact-integer end-to-end;
``pass_at_k`` multiplies ≤5 exact-integer-derived double ratios and
micro-quantizes once; ``conformal_interval`` keeps residuals in
micro-units (from the exact rational OLS prediction cast once to
double) and coverage as an exact integer ratio micro-quantized;
``grid_cluster_cc`` bins IDENTICAL doubles on both engines (float32
embeddings cast to double; one floor per axis).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the selection family
(``dsir_weights``, ``pareto_frontier``), the eval family
(``ndcg_eval``, ``calibration_curve``), the quantile family
(``group_quantiles_dist`` — same two-pass bucket rank), the
clustering family (``kmeans_lloyd``, ``dedup_groups`` — same
min-label CC contract on the oracle side), and the sequence family
(``event_markov``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# Greedy coverage fan.
_SC_K = 5
# pass@k.
_PK_K = 5
_PK_GOOD = "purchase"
# Conformal: alpha and the coarse bucket width for the 2-pass rank.
_CI_ALPHA = 0.1
_CI_BUCKET = 100_000  # micro-units -> 0.1-unit coarse buckets
# Grid clustering.
_GC_EPS = 0.05
_GC_MINPTS = 4
_GC_OFF = 1000  # cell-coordinate offset to keep codes positive
# Trigram top-k.
_TP_TOP = 10


# ---------------------------------------------------------------------------
# submodular_coverage
# ---------------------------------------------------------------------------


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    # coverage units are word BIGRAMS: the unigram vocabulary of the
    # synthetic corpus is tiny enough that one document can cover it,
    # which makes greedy selection degenerate; bigrams keep the
    # marginal-gain structure real (and mirror shingle coverage)
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("toks")
    )
    return (
        toks.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("toks") >= 2, F.sequence(F.lit(1), F.size("toks") - 1)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
            "toks",
        )
        .where(
            (F.element_at("toks", F.col("i")) != "")
            & (F.element_at("toks", F.col("i") + 1) != "")
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("toks", F.col("i")),
                F.element_at("toks", F.col("i") + 1),
            ).alias("w"),
        )
        .distinct()
    )


def q_submodular_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy max-coverage: k rounds of one distributed argmax each.

    Round r: marginal gain per doc = |words(doc) − covered| via one
    anti-join + groupBy; the argmax (ties → smallest doc_id) is a
    1-row fetch; covered grows by the winner's vocabulary.  Stops
    early if no document adds anything.  Output: (rank, doc_id,
    gain, covered_total) — the coreset manifest.

    Scale: per round one corpus-words anti-join against the covered
    set (≤ r·|doc vocabulary| rows, broadcastable) and one top-1.
    """
    words = _q._persist_tracked(_doc_words(spark, sf_dir))
    covered = None
    chosen: list = []
    rows = []
    total = 0
    for r in range(1, _SC_K + 1):
        cand = words
        if chosen:
            cand = cand.where(~F.col("doc_id").isin(chosen))
        if covered is not None:
            cand = cand.join(F.broadcast(covered), "w", "left_anti")
        top = (
            cand.groupBy("doc_id")
            .agg(F.count("*").alias("g"))
            .orderBy(F.col("g").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        doc, gain = int(top[0]["doc_id"]), int(top[0]["g"])
        total += gain
        rows.append(Row(rank=r, doc_id=doc, gain=gain, covered_total=total))
        chosen.append(doc)
        new_cov = words.where(F.col("doc_id") == doc).select("w")
        # persisted per round: the covered set is re-read by every later
        # round's anti-join broadcast, and unpersisted the union/distinct
        # chain re-executed from round 1 each time (O(k²) small jobs)
        covered = _q._persist_tracked(
            new_cov if covered is None
            else covered.unionAll(new_cov).distinct()
        )
    return spark.createDataFrame(
        rows, "rank int, doc_id long, gain long, covered_total long"
    )


def _oracle_submodular() -> str:
    # k unrolled greedy stages; stage r excludes previously selected
    # docs and previously covered words (always-true base predicate
    # keeps the conjunction uniform)
    stages = []
    for r in range(1, _SC_K + 1):
        conds = ["1 = 1"]
        for i in range(1, r):
            conds.append(f"doc_id NOT IN (SELECT doc_id FROM s{i})")
            conds.append(
                f"w NOT IN (SELECT w2.w FROM words w2 "
                f"WHERE w2.doc_id = (SELECT doc_id FROM s{i}))"
            )
        stages.append(
            f"s{r} AS (SELECT doc_id, count(*) AS g FROM words "
            f"WHERE {' AND '.join(conds)} "
            f"GROUP BY doc_id ORDER BY g DESC, doc_id LIMIT 1)"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, doc_id, g AS gain FROM s{r}" for r in range(1, _SC_K + 1)
    )
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, w1 || ' ' || w2 AS w FROM (
    SELECT doc_id, w AS w1,
           lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM (SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS w,
                 unnest(range(1, len(string_split(coalesce(text, ''), ' ')) + 1))
                   AS pos
          FROM documents))
  WHERE w1 <> '' AND w2 IS NOT NULL AND w2 <> ''),
{','.join(stages)},
sel AS ({sel})
SELECT CAST(rank AS INTEGER) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(gain AS BIGINT) AS gain,
       CAST(sum(gain) OVER (ORDER BY rank
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS covered_total
FROM sel WHERE gain > 0
"""


# ---------------------------------------------------------------------------
# pass_at_k
# ---------------------------------------------------------------------------


def _pass_terms_spark(n, c):
    prod = F.lit(1.0)
    for i in range(_PK_K):
        term = (n - c - i).cast("double") / (n - i)
        prod = prod * F.when(i < F.least(F.lit(_PK_K), n), term).otherwise(F.lit(1.0))
    return prod


def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k per user: n = events, c = '{_PK_GOOD}' events,
    k_eff = min({_PK_K}, n); pass = 1 − Π_{{i<k_eff}} (n−c−i)/(n−i),
    clamped to 1 when c > n − k_eff (the C(n−c,k)=0 case).

    Scale: one partial-agg groupBy; the product is a fixed 5-term
    expression — no UDF, no explode.
    """
    per = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == _PK_GOOD).cast("long")).alias("c"),
        )
    )
    n, c = F.col("n"), F.col("c")
    k_eff = F.least(F.lit(_PK_K), n)
    miss = _pass_terms_spark(n, c)
    pass_micro = F.when(
        c > n - k_eff, F.lit(1_000_000)
    ).otherwise(F.floor((F.lit(1.0) - miss) * 1e6 + F.lit(0.5)).cast("long"))
    return per.select(
        "user_id",
        n.cast("long").alias("n"),
        c.cast("long").alias("c"),
        k_eff.cast("long").alias("k_eff"),
        pass_micro.alias("pass_micro"),
    )


def _pass_terms_sql() -> str:
    terms = []
    for i in range(_PK_K):
        terms.append(
            f"(CASE WHEN {i} < least({_PK_K}, n) "
            f"THEN CAST(n - c - {i} AS DOUBLE) / (n - {i}) ELSE 1.0 END)"
        )
    return " * ".join(terms)


ORACLE_PASS_AT_K = f"""
WITH per AS (
  SELECT user_id, count(*) AS n,
         sum(CASE WHEN event_type = '{_PK_GOOD}' THEN 1 ELSE 0 END) AS c
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(n AS BIGINT) AS n,
       CAST(c AS BIGINT) AS c,
       CAST(least({_PK_K}, n) AS BIGINT) AS k_eff,
       CASE WHEN c > n - least({_PK_K}, n) THEN 1000000
            ELSE CAST(floor((1.0 - {_pass_terms_sql()}) * 1e6 + 0.5) AS BIGINT)
       END AS pass_micro
FROM per
"""


# ---------------------------------------------------------------------------
# conformal_interval
# ---------------------------------------------------------------------------


def _conf_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
        F.col("n_chars").cast("long").alias("y"),
    )
    h = (
        "((((instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING) || ':conf'), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING) || ':conf'), 2, 1)) - 1)) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING) || ':conf'), 3, 1)) - 1)) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING) || ':conf'), 4, 1)) - 1))"
    )
    return d.select(
        "doc_id",
        "y",
        F.size(F.filter(F.split("t", " "), lambda w: w != "")).cast("long").alias("x1"),
        F.size(
            F.array_distinct(F.filter(F.split("t", " "), lambda w: w != ""))
        ).cast("long").alias("x2"),
        (F.expr(h) % 2 == 0).alias("is_cal"),
    )


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal over the ols_fit model: q̂ = the
    ceil((n_cal+1)(1−α))-th smallest |residual| on the calibration
    half, coverage = P(|residual| ≤ q̂) on the test half.

    The OLS solve is the exact Cramer form refit on calibration only;
    residuals are micro-quantized once from the exact rational
    prediction.  The rank selection is the group_quantiles_dist
    2-pass shape: a COARSE residual-bucket histogram (bounded frame)
    finds the target bucket; row_number ranks only within it.

    Scale: two corpus scans (moments; residuals), windows only over
    the coarse-bucket histogram and inside one bucket.
    """
    fe = _q._persist_tracked(_conf_feats(spark, sf_dir))
    cal = fe.where("is_cal")
    dec = "decimal(20,0)"
    m = cal.agg(
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
        return (
            F.col(a) * (F.col(e) * F.col(i) - F.col(f_) * F.col(h))
            - F.col(b) * (F.col(d_) * F.col(i) - F.col(f_) * F.col(g))
            + F.col(c) * (F.col(d_) * F.col(h) - F.col(e) * F.col(g))
        )

    dets = m.select(
        det3("n", "sx1", "sx2", "sx1", "sx1x1", "sx1x2", "sx2", "sx1x2", "sx2x2")
        .cast("double").alias("det"),
        det3("sy", "sx1", "sx2", "sx1y", "sx1x1", "sx1x2", "sx2y", "sx1x2", "sx2x2")
        .cast("double").alias("d0"),
        det3("n", "sy", "sx2", "sx1", "sx1y", "sx1x2", "sx2", "sx2y", "sx2x2")
        .cast("double").alias("d1"),
        det3("n", "sx1", "sy", "sx1", "sx1x1", "sx1y", "sx2", "sx1x2", "sx2y")
        .cast("double").alias("d2"),
    )
    resid = fe.crossJoin(F.broadcast(dets)).select(
        "doc_id",
        "is_cal",
        F.floor(
            F.abs(
                F.col("y")
                - (
                    F.col("d0")
                    + F.col("d1") * F.col("x1")
                    + F.col("d2") * F.col("x2")
                )
                / F.col("det")
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r_micro"),
    )
    resid = _q._persist_tracked(resid)
    cal_r = resid.where("is_cal")
    n_cal = cal_r.agg(F.count("*").alias("n_cal"))
    # target rank m = ceil((n_cal + 1) * (1 - alpha)), clamped to n_cal
    m_rank = F.least(
        F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - _CI_ALPHA)).cast("long"),
        F.col("n_cal"),
    ).alias("m_rank")
    # pass 1: coarse buckets
    coarse = cal_r.groupBy(
        F.floor(F.col("r_micro") / _CI_BUCKET).alias("b")
    ).agg(F.count("*").alias("c"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    coarse = coarse.withColumn("p", F.coalesce(F.sum("c").over(wb), F.lit(0)))
    target = (
        coarse.crossJoin(F.broadcast(n_cal.select("n_cal", m_rank)))
        .where(
            (F.col("p") < F.col("m_rank"))
            & (F.col("p") + F.col("c") >= F.col("m_rank"))
        )
        .select("b", "p", "m_rank", "n_cal")
    )
    # pass 2: rank within the one target bucket
    wr = Window.partitionBy("b").orderBy("r_micro", "doc_id")
    in_bucket = (
        cal_r.withColumn("b", F.floor(F.col("r_micro") / _CI_BUCKET))
        .join(F.broadcast(target), "b")
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("p") + F.col("rn") == F.col("m_rank"))
        .select(
            F.col("r_micro").alias("qhat_micro"), "m_rank", "n_cal"
        )
    )
    test_cov = (
        resid.where(~F.col("is_cal"))
        .crossJoin(F.broadcast(in_bucket))
        .agg(
            F.max("qhat_micro").alias("qhat_micro"),
            F.max("m_rank").alias("m_rank"),
            F.max("n_cal").alias("n_cal"),
            F.count("*").alias("n_test"),
            F.sum(
                (F.col("r_micro") <= F.col("qhat_micro")).cast("long")
            ).alias("covered"),
        )
    )
    return test_cov.select(
        F.col("n_cal").cast("long").alias("n_cal"),
        F.col("n_test").cast("long").alias("n_test"),
        F.col("m_rank").cast("long").alias("m_rank"),
        F.col("qhat_micro").cast("long").alias("qhat_micro"),
        F.col("covered").cast("long").alias("covered"),
        F.floor(
            F.col("covered").cast("double") / F.col("n_test") * 1e6 + F.lit(0.5)
        )
        .cast("long")
        .alias("coverage_micro"),
    )


ORACLE_CONFORMAL_INTERVAL = f"""
WITH fe AS (
  SELECT doc_id, n_chars AS y,
         len(list_filter(string_split(coalesce(text, ''), ' '),
                         w -> w <> '')) AS x1,
         len(list_distinct(list_filter(string_split(coalesce(text, ''), ' '),
                                       w -> w <> ''))) AS x2,
         ((((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':conf'), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':conf'), 2, 1)) - 1)) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':conf'), 3, 1)) - 1)) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':conf'), 4, 1)) - 1))
           % 2 = 0 AS is_cal
  FROM documents),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(x2) AS HUGEINT) AS sx2,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x1 * x1) AS HUGEINT) AS sx1x1,
         CAST(sum(x1 * x2) AS HUGEINT) AS sx1x2,
         CAST(sum(x2 * x2) AS HUGEINT) AS sx2x2,
         CAST(sum(x1 * y) AS HUGEINT) AS sx1y,
         CAST(sum(x2 * y) AS HUGEINT) AS sx2y
  FROM fe WHERE is_cal),
dets AS (
  SELECT CAST(n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
              - sx1 * (sx1 * sx2x2 - sx1x2 * sx2)
              + sx2 * (sx1 * sx1x2 - sx1x1 * sx2) AS DOUBLE) AS det,
         CAST(sy * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
              - sx1 * (sx1y * sx2x2 - sx1x2 * sx2y)
              + sx2 * (sx1y * sx1x2 - sx1x1 * sx2y) AS DOUBLE) AS d0,
         CAST(n * (sx1y * sx2x2 - sx1x2 * sx2y)
              - sy * (sx1 * sx2x2 - sx1x2 * sx2)
              + sx2 * (sx1 * sx2y - sx1y * sx2) AS DOUBLE) AS d1,
         CAST(n * (sx1x1 * sx2y - sx1y * sx1x2)
              - sx1 * (sx1 * sx2y - sx1y * sx2)
              + sy * (sx1 * sx1x2 - sx1x1 * sx2) AS DOUBLE) AS d2
  FROM m),
resid AS (
  SELECT fe.doc_id, fe.is_cal,
         CAST(floor(abs(fe.y - (d.d0 + d.d1 * fe.x1 + d.d2 * fe.x2) / d.det)
                    * 1e6 + 0.5) AS BIGINT) AS r_micro
  FROM fe, dets d),
n_cal AS (
  SELECT count(*) AS n_cal,
         least(CAST(ceil((count(*) + 1) * {1.0 - _CI_ALPHA}) AS BIGINT),
               count(*)) AS m_rank
  FROM resid WHERE is_cal),
qhat AS (
  SELECT r_micro AS qhat_micro FROM (
    SELECT r_micro,
           row_number() OVER (ORDER BY r_micro, doc_id) AS rn
    FROM resid WHERE is_cal) r, n_cal
  WHERE r.rn = n_cal.m_rank)
SELECT CAST(nc.n_cal AS BIGINT) AS n_cal,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(nc.m_rank AS BIGINT) AS m_rank,
       CAST(q.qhat_micro AS BIGINT) AS qhat_micro,
       CAST(sum(CASE WHEN t.r_micro <= q.qhat_micro THEN 1 ELSE 0 END)
            AS BIGINT) AS covered,
       CAST(floor(CAST(sum(CASE WHEN t.r_micro <= q.qhat_micro THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*) * 1e6 + 0.5) AS BIGINT)
         AS coverage_micro
FROM (SELECT * FROM resid WHERE NOT is_cal) t, qhat q, n_cal nc
GROUP BY nc.n_cal, nc.m_rank, q.qhat_micro
"""


# ---------------------------------------------------------------------------
# grid_cluster_cc
# ---------------------------------------------------------------------------


def q_grid_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering over (embedding[0], embedding[1]):
    ε={_GC_EPS} cells, core = count ≥ {_GC_MINPTS}, clusters =
    connected components of the 8-neighborhood core-cell graph;
    border points (non-core cell touching ≥1 core cell) take the
    smallest adjacent cluster label; everything else is noise (−1).

    The core-cell graph is bounded by the GRID — ≤(range/ε)² cells
    regardless of row count — so collecting it for a driver-side
    union-find is bounded by a constant, exactly like the K-centroid
    fetches.  Points never leave the cluster: one map-side binning,
    one join to the (cell → label) broadcast.

    Scale: one embeddings scan + one cell groupBy; the label table
    is grid-sized and broadcast back.
    """
    pts = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.floor(F.col("embedding")[0].cast("double") / _GC_EPS).cast("long").alias("cx"),
        F.floor(F.col("embedding")[1].cast("double") / _GC_EPS).cast("long").alias("cy"),
    )
    pts = _q._persist_tracked(pts)
    cells = pts.groupBy("cx", "cy").agg(F.count("*").alias("cnt"))
    core = cells.where(F.col("cnt") >= _GC_MINPTS).select("cx", "cy")
    # bounded driver fetch: the grid caps this at (range/eps)^2 rows
    core_cells = [(int(r["cx"]), int(r["cy"])) for r in core.collect()]
    code = {
        c: (c[0] + _GC_OFF) * 100_000 + (c[1] + _GC_OFF) for c in core_cells
    }
    parent = {c: c for c in core_cells}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    cs = set(core_cells)
    for (x, y) in core_cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx, y + dy)
                if nb in cs and nb != (x, y):
                    ra, rb = find((x, y)), find(nb)
                    if ra != rb:
                        # union by smaller code -> deterministic labels
                        if code[ra] < code[rb]:
                            parent[rb] = ra
                        else:
                            parent[ra] = rb
    label = {c: code[find(c)] for c in core_cells}
    if core_cells:
        core_lab = spark.createDataFrame(
            [Row(cx=c[0], cy=c[1], lab=label[c]) for c in core_cells],
            "cx long, cy long, lab long",
        )
    else:
        core_lab = spark.createDataFrame([], "cx long, cy long, lab long")
    # border lookup: each point checks its 9 surrounding cells
    offs = spark.createDataFrame(
        [Row(dx=dx, dy=dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    cl = core_lab.select(
        F.col("cx").alias("ncx"), F.col("cy").alias("ncy"), "lab"
    )
    nbr = (
        pts.crossJoin(F.broadcast(offs))
        .join(
            F.broadcast(cl),
            (F.col("cx") + F.col("dx") == F.col("ncx"))
            & (F.col("cy") + F.col("dy") == F.col("ncy")),
            "left",
        )
        .groupBy("vec_id")
        .agg(F.min("lab").alias("nb_lab"))
    )
    own = pts.join(F.broadcast(core_lab), ["cx", "cy"], "left").select(
        "vec_id", F.col("lab").alias("own_lab")
    )
    return (
        own.join(nbr, "vec_id")
        .select(
            "vec_id",
            F.coalesce(
                F.col("own_lab"), F.col("nb_lab"), F.lit(-1)
            ).alias("cluster"),
            F.col("own_lab").isNotNull().alias("is_core"),
        )
    )


ORACLE_GRID_CLUSTER_CC = f"""
WITH RECURSIVE pts AS (
  SELECT vec_id,
         CAST(floor(CAST(embedding[1] AS DOUBLE) / {_GC_EPS}) AS BIGINT) AS cx,
         CAST(floor(CAST(embedding[2] AS DOUBLE) / {_GC_EPS}) AS BIGINT) AS cy
  FROM embeddings),
cells AS (SELECT cx, cy, count(*) AS cnt FROM pts GROUP BY cx, cy),
core AS (
  SELECT cx, cy, (cx + {_GC_OFF}) * 100000 + (cy + {_GC_OFF}) AS code
  FROM cells WHERE cnt >= {_GC_MINPTS}),
edges AS (
  SELECT a.code AS u, b.code AS v
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
   AND (a.cx <> b.cx OR a.cy <> b.cy)),
walk AS (
  -- fixpoint label propagation: (u, label of any node reachable from
  -- u); edges are symmetric so min over walk = min code in component
  SELECT code AS u, code AS lab FROM core
  UNION
  SELECT e.u, w.lab FROM edges e JOIN walk w ON w.u = e.v),
final AS (SELECT u, min(lab) AS lab FROM walk GROUP BY u),
core_lab AS (
  SELECT c.cx, c.cy, f.lab FROM core c JOIN final f ON f.u = c.code),
own AS (
  SELECT p.vec_id, cl.lab AS own_lab
  FROM pts p LEFT JOIN core_lab cl ON p.cx = cl.cx AND p.cy = cl.cy),
nbr AS (
  SELECT p.vec_id, min(cl.lab) AS nb_lab
  FROM pts p LEFT JOIN core_lab cl
    ON abs(p.cx - cl.cx) <= 1 AND abs(p.cy - cl.cy) <= 1
  GROUP BY p.vec_id)
SELECT o.vec_id,
       coalesce(o.own_lab, n.nb_lab, -1) AS cluster,
       o.own_lab IS NOT NULL AS is_core
FROM own o JOIN nbr n ON o.vec_id = n.vec_id
"""


# ---------------------------------------------------------------------------
# trigram_paths
# ---------------------------------------------------------------------------


def q_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top {_TP_TOP} adjacent event-type trigrams by global support.

    Per-user sequence rank (partitioned window on (us, event_id)),
    two successor equi-joins co-partitioned on user_id, one global
    count, one top-k.  Ties break on the trigram string.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("et"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_id").cast("long").alias("eid"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "eid")
    seq = _q._persist_tracked(
        ev.withColumn("rn", F.row_number().over(w)).select("user_id", "rn", "et")
    )
    s2 = seq.select("user_id", (F.col("rn") - 1).alias("rn"), F.col("et").alias("et2"))
    s3 = seq.select("user_id", (F.col("rn") - 2).alias("rn"), F.col("et").alias("et3"))
    return (
        seq.join(s2, ["user_id", "rn"])
        .join(s3, ["user_id", "rn"])
        .groupBy(
            F.concat_ws("->", "et", "et2", "et3").alias("trigram")
        )
        .agg(F.count("*").alias("support"))
        .orderBy(F.col("support").desc(), "trigram")
        .limit(_TP_TOP)
    )


ORACLE_TRIGRAM_PATHS = f"""
WITH seq AS (
  SELECT user_id, event_type AS et,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events)
SELECT a.et || '->' || b.et || '->' || c.et AS trigram,
       CAST(count(*) AS BIGINT) AS support
FROM seq a
JOIN seq b ON a.user_id = b.user_id AND b.rn = a.rn + 1
JOIN seq c ON a.user_id = c.user_id AND c.rn = a.rn + 2
GROUP BY 1 ORDER BY support DESC, trigram LIMIT {_TP_TOP}
"""


CORESET_QUERIES = {
    "submodular_coverage": q_submodular_coverage,
    "pass_at_k": q_pass_at_k,
    "conformal_interval": q_conformal_interval,
    "grid_cluster_cc": q_grid_cluster_cc,
    "trigram_paths": q_trigram_paths,
}

CORESET_ORACLES = {
    "submodular_coverage": _oracle_submodular(),
    "pass_at_k": ORACLE_PASS_AT_K,
    "conformal_interval": ORACLE_CONFORMAL_INTERVAL,
    "grid_cluster_cc": ORACLE_GRID_CLUSTER_CC,
    "trigram_paths": ORACLE_TRIGRAM_PATHS,
}

_q.QUERIES.update(CORESET_QUERIES)
_q.ORACLES.update(CORESET_ORACLES)
