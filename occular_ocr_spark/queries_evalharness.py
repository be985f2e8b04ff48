"""Classifier/ranker evaluation harness ops — the metrics layer a
100 TB curation pipeline runs over its own quality signals before
trusting them to gate data:

* ``auc_rank`` — distributed AUC (Mann-Whitney rank-sum with midrank
  tie credit) of a score column predicting a label, computed from
  per-score-value counts so the global ordering never materializes a
  per-row rank;
* ``calibration_curve`` — per-decile positive rate of the same
  score/label pair (the reliability diagram behind every "is my
  quality classifier calibrated?" check), reusing ``score_deciles``'
  two-level distributed rank;
* ``rbo_rankings`` — Rank-Biased Overlap (Webber et al., TOIS 2010)
  between two per-document term rankings (TF-IDF vs raw TF), the
  ranking-drift metric for comparing two retrieval/salience models
  without a relevance-judged eval set;
* ``ndcg_eval`` — nDCG@K / precision@K / recall@K of the BM25 ranker
  (``bm25_topk``'s exact scoring formula) against tf-threshold
  relevance labels, per query term — the retrieval-quality harness
  run before an index is trusted to mine training data.

* ``bootstrap_ci`` — deterministic Poisson bootstrap of the corpus
  mean (per-row hash-drawn multiplicities, B partial-agg replicate
  rollups), the uncertainty bars a dataset card attaches to its
  headline statistics.

Same role as the reference's eval harness around its OCR quality
scores (tests assert score distributions before thresholds are
trusted, ocr_skel/tests/test_dbnet.py); here the harness itself is a
catalog citizen with a DuckDB value-hash oracle.

Cross-engine float doctrine (see queries_round4.q_hourly_profile):
every division below is the integer half-up trick
``(2·10^6·num + den) DIV (2·den) / 10^6`` — no float op until one
final exact division by a power of ten — and the RBO depth weights
``p^(d-1)/d`` are pre-rounded integer micro-units shared by BOTH
engines as literals, so no libm ``pow`` is ever evaluated engine-side.

Self-registers into queries.QUERIES / queries.ORACLES on import (same
pattern as queries_ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# auc_rank — distributed AUC via per-score-value counts
# ---------------------------------------------------------------------------

_AUC_LABEL_LANG = "en"  # label: doc is English; score: n_chars


def q_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of ``n_chars`` predicting ``lang = 'en'`` — the
    Mann-Whitney U statistic with midrank tie credit:

        AUC = Σ_s pos_s · (2·cumneg_below(s) + neg_s) / (2·P·N)

    over per-score-VALUE counts (pos_s, neg_s) ordered by score.  The
    midrank form means ties contribute exactly 1/2, matching the
    probabilistic definition P(score_pos > score_neg) + ½·P(=).

    Scale: the corpus collapses to one partial-agg groupBy(score)
    FIRST; the only ordered structure is the prefix-sum window over
    those ≤ #distinct-score rows (bounded by the score's value range —
    the ``score_deciles`` frame, never a per-row global window).  The
    final statistic is one more partial agg to a single row.

    Determinism: numerator and denominator are exact BIGINT; the AUC
    surface is the integer half-up division to 6 decimals (see module
    docstring), with ``nullif`` guarding the empty/one-class corpus
    (P·N = 0 → NULL on both engines, never a divide-by-zero under
    ANSI).  Exactness holds while 2·10^6·Σ pos·(2·cumneg+neg) < 2^63,
    i.e. P·N < ~2.3e12 — beyond that, compute AUC on a stratified
    sample (the standard practice) or rescale the micro-unit.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("score"),
        (F.col("lang") == _AUC_LABEL_LANG).cast("bigint").alias("y"),
    )
    vc = d.groupBy("score").agg(
        F.sum("y").alias("pos"),
        (F.count("*") - F.sum("y")).alias("neg"),
    )
    wv = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    pref = vc.withColumn(
        "cumneg", F.coalesce(F.sum("neg").over(wv), F.lit(0))
    )
    return (
        pref.agg(
            F.coalesce(F.sum("pos"), F.lit(0)).alias("n_pos"),
            F.coalesce(F.sum("neg"), F.lit(0)).alias("n_neg"),
            F.coalesce(
                F.sum(F.col("pos") * (2 * F.col("cumneg") + F.col("neg"))),
                F.lit(0),
            ).alias("num"),
        )
        .select(
            "n_pos",
            "n_neg",
            (
                F.expr(
                    "(2000000 * num + nullif(2 * n_pos * n_neg, 0))"
                    " DIV nullif(4 * n_pos * n_neg, 0)"
                )
                / 1000000.0
            ).alias("auc"),
        )
    )


ORACLE_AUC_RANK = f"""
WITH vc AS (
  SELECT CAST(n_chars AS BIGINT) AS score,
         sum(CASE WHEN lang = '{_AUC_LABEL_LANG}' THEN 1 ELSE 0 END) AS pos,
         sum(CASE WHEN lang = '{_AUC_LABEL_LANG}' THEN 0 ELSE 1 END) AS neg
  FROM documents GROUP BY 1),
pref AS (
  SELECT pos, neg,
         coalesce(sum(neg) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
  FROM vc),
tot AS (
  SELECT CAST(coalesce(sum(pos), 0) AS BIGINT) AS n_pos,
         CAST(coalesce(sum(neg), 0) AS BIGINT) AS n_neg,
         CAST(coalesce(sum(pos * (2 * cumneg + neg)), 0) AS BIGINT) AS num
  FROM pref)
SELECT n_pos, n_neg,
       ((2000000 * num + nullif(2 * n_pos * n_neg, 0))
        // nullif(4 * n_pos * n_neg, 0)) / 1000000.0 AS auc
FROM tot
"""


# ---------------------------------------------------------------------------
# calibration_curve — per-decile positive rate (reliability diagram)
# ---------------------------------------------------------------------------


def q_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the same score/label pair as
    ``auc_rank``: global score deciles (the ``score_deciles``
    two-level distributed rank — per-value counts, one prefix window
    over the ≤ #distinct-values frame, parallel within-value
    row_number) → per-decile n_docs / n_pos / positive rate.

    AUC says the ranking separates; calibration says the SCORE VALUES
    mean what a thresholding gate assumes.  A pipeline that drops the
    bottom-k% by quality score reads exactly this table first.

    Determinism: pos_rate is the integer half-up division to 6
    decimals; decile boundaries use explicit floor() on both engines
    (Spark truncates double→int casts, DuckDB rounds half-even).
    """
    t = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("score"),
        (F.col("lang") == _AUC_LABEL_LANG).cast("bigint").alias("y"),
    )
    vcounts = t.groupBy("score").agg(F.count("*").alias("c"))
    wv = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    prefix = vcounts.select(
        "score", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("p")
    )
    total = t.agg(F.count("*").alias("n"))
    wr = Window.partitionBy("score").orderBy("doc_id")
    ranked = (
        t.join(F.broadcast(prefix), "score")
        .crossJoin(F.broadcast(total))
        .select(
            "y",
            F.floor(
                (F.col("p") + F.row_number().over(wr) - 1) * 10 / F.col("n")
            )
            .cast("int")
            .alias("decile"),
        )
    )
    return (
        ranked.groupBy("decile")
        .agg(F.count("*").alias("n_docs"), F.sum("y").alias("n_pos"))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            (
                F.expr("(2000000 * n_pos + n_docs) DIV (2 * n_docs)")
                / 1000000.0
            ).alias("pos_rate"),
        )
    )


ORACLE_CALIBRATION_CURVE = f"""
WITH ranked AS (
  SELECT CASE WHEN lang = '{_AUC_LABEL_LANG}' THEN 1 ELSE 0 END AS y,
         CAST(floor((row_number() OVER (ORDER BY n_chars, doc_id) - 1) * 10.0
              / count(*) OVER ()) AS INT) AS decile
  FROM documents),
agg AS (
  SELECT decile, count(*) AS n_docs, CAST(sum(y) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile)
SELECT decile, n_docs, n_pos,
       ((2000000 * n_pos + n_docs) // (2 * n_docs)) / 1000000.0 AS pos_rate
FROM agg
"""


# ---------------------------------------------------------------------------
# rbo_rankings — Rank-Biased Overlap between two term rankers
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_K = 10

# W(m) = Σ_{d=m..K} p^(d-1)/d in integer nano-units (×10^9): the
# contribution of a term whose WORSE rank across the two lists is m —
# it sits in every depth-d prefix intersection for d ≥ m.  Pre-rounded
# in Python once and inlined as literals into BOTH engines' CASE, so
# neither engine evaluates pow() (module-docstring doctrine).  The 1e9
# scale keeps the half-up numerator 2e6·wsum ≤ 2e6·Σ W ≈ 1.3e16 < 2^63
# (a 1e12 scale would overflow BIGINT at perfect overlap — Spark wraps
# silently, DuckDB raises); per-pair rounding error ≤ 0.5e-9 of a
# unit-scale weight, invisible at the 6-decimal rbo surface.
_RBO_W = {
    m: int(round(sum(_RBO_P ** (d - 1) / d for d in range(m, _RBO_K + 1)) * 1e9))
    for m in range(1, _RBO_K + 1)
}
# Identical lists hit weights W(1)..W(K) exactly once each, so this sum
# is the normalizer that makes rbo(list, list) == 1.0 exactly.
_RBO_IDENT = sum(_RBO_W.values())

# Searched CASE with an explicit NULL guard: both engines' greatest()
# SKIPS NULL arguments, so a bare CASE greatest(ra, rb) would assign a
# weight to pairs missing from ranking B — the guard keeps them NULL.
_RBO_CASE = (
    "CASE WHEN rb IS NULL THEN CAST(NULL AS BIGINT) "
    + " ".join(f"WHEN greatest(ra, rb) = {m} THEN {w}" for m, w in _RBO_W.items())
    + " END"
)


def q_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap at depth K=10 (p=0.9) between each
    document's TF-IDF term ranking and its raw-TF term ranking —
    "how much does the idf term actually change what this model calls
    salient?", the standard judgment-free ranking-comparison metric.

    RBO@K = (1-p) Σ_{d=1..K} p^(d-1) · |A_1:d ∩ B_1:d| / d.  A term in
    both top-K lists with worse-rank m = max(rank_A, rank_B) lies in
    every prefix intersection at depth ≥ m, so it contributes
    W(m) = Σ_{d=m..K} p^(d-1)/d — the per-PAIR weight.  RBO is then a
    plain SUM over the rank-join, normalized so identical lists score
    exactly 1.0.

    Scale: one tokenize + groupBy(doc_id, tok) postings pass feeds
    BOTH rankers (tf reused, df/N partial-agg rollups of it); each
    ranker is a per-doc top-K window (never global); the comparison is
    an equi-join on (doc_id, tok) between two ≤K-row-per-doc tables —
    per-doc work is O(K), shuffles hash-partition on doc_id.  The
    left join from ranker A keeps zero-overlap documents (rbo = 0)
    total.

    Determinism: both rankers order by a ROUNDED weight with token
    tie-break (the ``tfidf_topk`` cut rule); W(m) weights are shared
    integer micro-units summed in BIGINT; the single float op is the
    final half-up division by the identical-lists normalizer.
    """
    d = _t(spark, sf_dir, "documents")
    n_df = d.groupBy().agg(F.count("*").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    weighted = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n_df))
        .withColumn(
            "w_tfidf", F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 6)
        )
    )
    wa = Window.partitionBy("doc_id").orderBy(
        F.col("w_tfidf").desc(), F.col("tok")
    )
    wb = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("tok"))
    rank_a = (
        weighted.withColumn("ra", F.row_number().over(wa))
        .where(F.col("ra") <= _RBO_K)
        .select("doc_id", "tok", "ra")
    )
    rank_b = (
        weighted.withColumn("rb", F.row_number().over(wb))
        .where(F.col("rb") <= _RBO_K)
        .select("doc_id", "tok", "rb")
    )
    joined = rank_a.join(rank_b, ["doc_id", "tok"], "left").withColumn(
        "w", F.expr(_RBO_CASE)
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("w").alias("n_common"),
            F.coalesce(F.sum("w"), F.lit(0)).alias("wsum"),
        )
        .select(
            "doc_id",
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.expr(
                    f"(2000000 * wsum + {_RBO_IDENT}) DIV {2 * _RBO_IDENT}"
                )
                / 1000000.0
            ).alias("rbo"),
        )
    )


ORACLE_RBO_RANKINGS = f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY doc_id, tok),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
weighted AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         round(tf.tf * n.n_docs / dfreq.df, 6) AS w_tfidf
  FROM tf JOIN dfreq ON tf.tok = dfreq.tok, n),
rank_a AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY w_tfidf DESC, tok) AS ra
  FROM weighted QUALIFY ra <= {_RBO_K}),
rank_b AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, tok) AS rb
  FROM weighted QUALIFY rb <= {_RBO_K}),
joined AS (
  SELECT rank_a.doc_id, {_RBO_CASE} AS w
  FROM rank_a LEFT JOIN rank_b
    ON rank_a.doc_id = rank_b.doc_id AND rank_a.tok = rank_b.tok)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(w) AS BIGINT) AS n_common,
       ((2000000 * CAST(coalesce(sum(w), 0) AS BIGINT) + {_RBO_IDENT})
        // {2 * _RBO_IDENT}) / 1000000.0 AS rbo
FROM joined GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# ndcg_eval — nDCG@K / P@K / R@K of the BM25 ranker vs tf-threshold labels
# ---------------------------------------------------------------------------

import math  # noqa: E402  (stdlib, used only at import time for weight tables)

_NDCG_K = 10
_NDCG_Q = 8  # queries = the Q highest-df tokens (bm25_topk's selection rule)
_NDCG_REL_TF = 2  # relevant iff tf(d, t) >= this AND lang = _NDCG_REL_LANG
_NDCG_REL_LANG = "en"  # judgments only cover the English slice
_NDCG_K1 = 1.2  # Okapi constants shared with queries_retrieval.q_bm25_topk
_NDCG_B = 0.75

# Gain discounts 10^9/log2(r+1) in integer nano-units, pre-rounded in
# Python and inlined into BOTH engines (the _RBO_W doctrine: no libm
# log engine-side in the DCG sum).  _NDCG_IDEAL[m] = prefix sum = the
# ideal DCG when min(K, n_rel) = m ranked docs can be relevant.
_NDCG_W = {r: int(round(1e9 / math.log2(r + 1))) for r in range(1, _NDCG_K + 1)}
_NDCG_IDEAL = {
    m: sum(_NDCG_W[r] for r in range(1, m + 1)) for m in range(1, _NDCG_K + 1)
}

_NDCG_GAIN_CASE = (
    "CASE WHEN rel = 0 THEN 0 "
    + " ".join(f"WHEN rnk = {r} THEN {w}" for r, w in _NDCG_W.items())
    + " END"
)
_NDCG_IDCG_CASE = (
    f"CASE WHEN n_rel >= {_NDCG_K} THEN {_NDCG_IDEAL[_NDCG_K]} "
    + " ".join(
        f"WHEN n_rel = {m} THEN {w}" for m, w in list(_NDCG_IDEAL.items())[:-1]
    )
    + " ELSE 0 END"
)


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality harness: for each of the _NDCG_Q highest-df
    query terms, rank documents with the exact BM25 formula of
    ``bm25_topk`` (idf · tf-saturation · length-norm, rank by the
    ROUNDED score with doc_id tie-break) and grade the top-K against
    language-conditioned relevance labels (rel ⇔ tf ≥ _NDCG_REL_TF AND
    lang = _NDCG_REL_LANG — "the judgment pool only covers English"):

    * ndcg      — Σ rel_r · w_r / IDCG with w_r = 1/log2(r+1) and
                  IDCG = Σ_{{r≤min(K, n_rel)}} w_r (binary-gain ideal);
    * p_at_k    — retrieved-relevant / K;
    * recall_at_k — retrieved-relevant / n_rel.

    The ranker is language-blind, so non-English high-tf docs outrank
    relevant ones — the harness grades real mistakes (ndcg < 1), which
    is exactly the situation a mined-data eval exists to expose.

    Scale: one postings pass feeds ranker AND labels (n_rel is a
    partial-agg rollup); scoring touches only query-term postings
    (broadcast Q-row term list — index-pruned exactly like bm25_topk);
    the ranking window partitions per TERM (≤ Q frames, never global);
    gains and ideal-DCG are integer CASE lookups, so the whole grade is
    one more partial agg.  All three metric surfaces are the module's
    integer half-up division; n_rel = 0 yields NULL ndcg/recall via
    nullif on both engines.
    """
    # release-tracked postings cache: three rollups (df, doclen, the
    # scored join) read this lineage — one tokenize pass, not three
    postings = _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfc = postings.groupBy("tok").agg(F.count("*").alias("df"))
    qterms = dfc.orderBy(F.col("df").desc(), "tok").limit(_NDCG_Q)
    doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = doclen.groupBy().agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("nd")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (_NDCG_K1 + 1) / (
        F.col("tf")
        + _NDCG_K1 * (1 - _NDCG_B + _NDCG_B * F.col("dl") / F.col("avgdl"))
    )
    lang_tbl = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = (
        postings.join(F.broadcast(qterms), "tok")
        .join(doclen, "doc_id")
        .join(lang_tbl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "doc_id",
            F.round(idf * norm, 4).alias("score"),
            (
                (F.col("tf") >= _NDCG_REL_TF)
                & (F.col("lang") == _NDCG_REL_LANG)
            )
            .cast("bigint")
            .alias("rel"),
        )
    )
    w = Window.partitionBy("tok").orderBy(F.col("score").desc(), "doc_id")
    topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _NDCG_K)
        .groupBy("tok")
        .agg(
            F.coalesce(F.sum(F.expr(_NDCG_GAIN_CASE)), F.lit(0)).alias("dcg"),
            F.sum("rel").alias("n_ret_rel"),
        )
    )
    # the label rollup reuses the pruned+scored lineage — no second
    # corpus pass and no second join
    nrel = scored.groupBy("tok").agg(F.sum("rel").alias("n_rel"))
    graded = topk.join(nrel, "tok", "left").withColumn(
        "n_rel", F.coalesce("n_rel", F.lit(0))
    )
    return graded.select(
        "tok",
        F.col("n_rel").cast("bigint").alias("n_rel"),
        F.col("n_ret_rel").cast("bigint").alias("n_ret_rel"),
        (
            F.expr(
                f"(2000000 * dcg + nullif({_NDCG_IDCG_CASE}, 0))"
                f" DIV nullif(2 * ({_NDCG_IDCG_CASE}), 0)"
            )
            / 1000000.0
        ).alias("ndcg"),
        (
            F.expr(f"(2000000 * n_ret_rel + {_NDCG_K}) DIV {2 * _NDCG_K}")
            / 1000000.0
        ).alias("p_at_k"),
        (
            F.expr(
                "(2000000 * n_ret_rel + nullif(n_rel, 0))"
                " DIV nullif(2 * n_rel, 0)"
            )
            / 1000000.0
        ).alias("recall_at_k"),
    )


ORACLE_NDCG_EVAL = f"""
WITH postings AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok),
dfs AS (SELECT tok, count(*) AS df FROM postings GROUP BY tok),
q AS (SELECT tok, df FROM dfs ORDER BY df DESC, tok LIMIT {_NDCG_Q}),
dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
tot AS (SELECT avg(dl) AS avgdl, count(*) AS nd FROM dl),
scored AS (
  SELECT p.tok, p.doc_id,
         round(ln(1 + (tot.nd - q.df + 0.5) / (q.df + 0.5))
               * p.tf * ({_NDCG_K1} + 1)
               / (p.tf + {_NDCG_K1} * (1 - {_NDCG_B}
                                       + {_NDCG_B} * dl.dl / tot.avgdl)),
               4) AS score,
         CASE WHEN p.tf >= {_NDCG_REL_TF} AND d.lang = '{_NDCG_REL_LANG}'
              THEN 1 ELSE 0 END AS rel
  FROM postings p JOIN q USING (tok) JOIN dl USING (doc_id)
  JOIN documents d ON p.doc_id = d.doc_id, tot),
topk AS (
  SELECT tok,
         CAST(coalesce(sum({_NDCG_GAIN_CASE}), 0) AS BIGINT) AS dcg,
         CAST(sum(rel) AS BIGINT) AS n_ret_rel
  FROM (SELECT *, row_number() OVER (PARTITION BY tok
                                     ORDER BY score DESC, doc_id) AS rnk
        FROM scored) s
  WHERE rnk <= {_NDCG_K} GROUP BY tok),
nrel AS (SELECT tok, CAST(sum(rel) AS BIGINT) AS n_rel FROM scored GROUP BY tok)
SELECT topk.tok,
       CAST(coalesce(nrel.n_rel, 0) AS BIGINT) AS n_rel,
       n_ret_rel,
       ((2000000 * dcg + nullif(CASE
           WHEN coalesce(nrel.n_rel, 0) >= {_NDCG_K} THEN {_NDCG_IDEAL[_NDCG_K]}
           {" ".join(f"WHEN coalesce(nrel.n_rel, 0) = {m} THEN {w}"
                     for m, w in list(_NDCG_IDEAL.items())[:-1])}
           ELSE 0 END, 0))
        // nullif(2 * (CASE
           WHEN coalesce(nrel.n_rel, 0) >= {_NDCG_K} THEN {_NDCG_IDEAL[_NDCG_K]}
           {" ".join(f"WHEN coalesce(nrel.n_rel, 0) = {m} THEN {w}"
                     for m, w in list(_NDCG_IDEAL.items())[:-1])}
           ELSE 0 END), 0)) / 1000000.0 AS ndcg,
       ((2000000 * n_ret_rel + {_NDCG_K}) // {2 * _NDCG_K}) / 1000000.0
         AS p_at_k,
       ((2000000 * n_ret_rel + nullif(coalesce(nrel.n_rel, 0), 0))
        // nullif(2 * coalesce(nrel.n_rel, 0), 0)) / 1000000.0 AS recall_at_k
FROM topk LEFT JOIN nrel USING (tok)
"""


# ---------------------------------------------------------------------------
# bootstrap_ci — deterministic Poisson bootstrap of a corpus statistic
# ---------------------------------------------------------------------------

_BOOT_B = 32  # bootstrap replicates

# Poisson(1) inverse-CDF thresholds in 1/65536 units (cumulative pmf at
# k = 0..4, pre-rounded in Python, shared by BOTH engines as literals;
# mass above the last threshold maps to 5).  Poisson resampling is THE
# distributed bootstrap: per-row replicate multiplicities need no
# global n, so the whole resample is map-side.
_BOOT_T = [24109, 48219, 60273, 64292, 65296]
_BOOT_CASE = (
    "CASE "
    + " ".join(f"WHEN u < {t} THEN {k}" for k, t in enumerate(_BOOT_T))
    + " ELSE 5 END"
)


def _boot_hash16(dialect: str) -> str:
    """First 16 bits of md5('doc_id:b') as an integer via hex-alphabet
    string arithmetic — the portable hash shared with mix_apply_sample
    (queries_analytics._hash16_expr), extended with the replicate id so
    each replicate draws an independent multiplicity."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"

    def hexv(j: int) -> str:
        return (
            f"(instr('0123456789abcdef', substr(md5("
            f"CAST(doc_id AS {strtype}) || ':' || CAST(b AS {strtype})"
            f"), {j}, 1)) - 1)"
        )

    return f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the corpus mean document length: every
    (document, replicate) pair draws a deterministic Poisson(1)
    multiplicity from a portable hash, and each replicate's weighted
    mean is one partial-agg rollup — the uncertainty quantification a
    dataset card attaches to its headline statistics, in the only
    bootstrap formulation that distributes (per-row multiplicities
    need no global coordination; Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", the production Poisson-
    bootstrap recipe).

    Scale: the B-fold expansion is a map-side explode of a constant
    sequence that collapses immediately into ≤ B partial-agg groups —
    no shuffle carries the expanded rows' data beyond (b, partial
    sums); B is a constant.  Determinism: multiplicities are integer
    CASE lookups on a 16-bit portable hash; sums are exact BIGINT; the
    replicate mean is the house half-up division.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("x")
    )
    expanded = d.select(
        "doc_id",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select(
        "b", "x", F.expr(_boot_hash16("spark")).alias("u")
    )
    counted = expanded.select(
        "b", "x", F.expr(_BOOT_CASE).alias("c")
    )
    return (
        counted.groupBy("b")
        .agg(
            F.sum("c").cast("bigint").alias("n_eff"),
            F.sum(F.col("c") * F.col("x")).cast("bigint").alias("s"),
        )
        .select(
            F.col("b").cast("int").alias("b"),
            "n_eff",
            (
                F.expr("(2000000 * s + nullif(n_eff, 0)) DIV nullif(2 * n_eff, 0)")
                / 1000000.0
            ).alias("boot_mean"),
        )
    )


ORACLE_BOOTSTRAP_CI = f"""
WITH expanded AS (
  SELECT b, CAST(n_chars AS BIGINT) AS x,
         {_boot_hash16("duckdb")} AS u
  FROM documents, unnest(range(0, {_BOOT_B})) AS r(b)),
counted AS (SELECT b, x, {_BOOT_CASE} AS c FROM expanded)
SELECT CAST(b AS INT) AS b,
       CAST(sum(c) AS BIGINT) AS n_eff,
       ((2000000 * CAST(sum(c * x) AS BIGINT) + nullif(CAST(sum(c) AS BIGINT), 0))
        // nullif(2 * CAST(sum(c) AS BIGINT), 0)) / 1000000.0 AS boot_mean
FROM counted GROUP BY b
"""


# ---------------------------------------------------------------------------
# langid_confusion — confusion matrix of the lang_quality heuristic
# ---------------------------------------------------------------------------


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the ``lang_quality`` language-ID heuristic
    against the metadata label: per (true lang, predicted lang) cell —
    count and within-true-language share (the recall diagonal) — the
    eval every langid gate ships with before its predictions are
    allowed to drop documents.  The marker list only covers en/es/fr,
    so de/zh rows land in 'unk' or a false language: the matrix
    QUANTIFIES that known blind spot instead of hiding it.

    Scale: the heuristic is the same zero-shuffle map-side string
    arithmetic as ``lang_quality``; the matrix is one partial-agg
    groupBy over the ≤ |langs|² key space, with row totals as a rollup
    of the cells (never a second corpus pass).  Shares are the house
    half-up division.
    """
    pred = _q.q_lang_quality(spark, sf_dir).select("doc_id", "lang_pred")
    truth = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rowtot = cells.groupBy("lang").agg(F.sum("n").alias("row_n"))
    return cells.join(F.broadcast(rowtot), "lang").select(
        "lang",
        "lang_pred",
        "n",
        (F.col("lang") == F.col("lang_pred")).alias("is_correct"),
        (
            F.expr("(2000000 * n + row_n) DIV (2 * row_n)") / 1000000.0
        ).alias("share_of_true"),
    )


def _langid_confusion_oracle() -> str:
    return f"""
WITH pred AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_q._LANG_PRED_SQL} AS lang_pred
  FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)),
cells AS (
  SELECT d.lang, pred.lang_pred, CAST(count(*) AS BIGINT) AS n
  FROM documents d JOIN pred ON pred.doc_id = d.doc_id
  GROUP BY d.lang, pred.lang_pred),
rowtot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY lang)
SELECT cells.lang, lang_pred, n,
       (cells.lang = lang_pred) AS is_correct,
       ((2000000 * n + row_n) // (2 * row_n)) / 1000000.0 AS share_of_true
FROM cells JOIN rowtot USING (lang)
"""


ORACLE_LANGID_CONFUSION = _langid_confusion_oracle()


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the ``lang_quality`` language-ID heuristic
    and the metadata label — the chance-corrected agreement statistic
    every weak-labeler pair gets audited with before its votes enter a
    label model (``langid_confusion`` shows WHERE they disagree; kappa
    compresses it to the one number a dashboard tracks).

    With exact integer cells n_ij, row totals r_i, column totals c_i:
    po = Σ n_ii / N, pe = Σ r_i·c_i / N², and

        kappa = (N·Σ n_ii − Σ r_i·c_i) / (N² − Σ r_i·c_i)

    — numerator and denominator are EXACT integers (DECIMAL(38,0)
    promoted), so kappa is one IEEE division, bit-identical on both
    engines; po/pe are derived the same way.

    Scale: the heuristic is zero-shuffle map-side string arithmetic;
    the matrix is a ≤|langs|² bounded-key partial agg; rows, columns
    and the three scalars are rollups of those cells — never a second
    corpus pass, never a collect.
    """
    pred = _q.q_lang_quality(spark, sf_dir).select("doc_id", "lang_pred")
    truth = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    cells = _q._persist_tracked(cells)
    rows = cells.groupBy("lang").agg(F.sum("n").alias("r"))
    cols = cells.groupBy("lang_pred").agg(F.sum("n").alias("c"))
    rc = (
        rows.join(cols, rows.lang == cols.lang_pred)
        .agg(
            F.sum(
                F.col("r").cast("decimal(38,0)")
                * F.col("c").cast("decimal(38,0)")
            ).alias("s_rc")
        )
    )
    scalars = cells.agg(
        F.sum("n").cast("decimal(38,0)").alias("n_docs"),
        F.sum(F.when(F.col("lang") == F.col("lang_pred"), F.col("n"))
              .otherwise(F.lit(0))).cast("decimal(38,0)").alias("s_diag"),
    )
    return scalars.crossJoin(rc).select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(
            F.col("s_diag").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("po"),
        F.round(
            F.col("s_rc").cast("double")
            / (F.col("n_docs") * F.col("n_docs")).cast("double"),
            6,
        ).alias("pe"),
        F.round(
            (F.col("n_docs") * F.col("s_diag") - F.col("s_rc")).cast("double")
            / (F.col("n_docs") * F.col("n_docs") - F.col("s_rc")).cast(
                "double"
            ),
            6,
        ).alias("kappa"),
    )


def _cohens_kappa_oracle() -> str:
    return f"""
WITH pred AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_q._LANG_PRED_SQL} AS lang_pred
  FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)),
cells AS (
  SELECT d.lang, pred.lang_pred, CAST(count(*) AS BIGINT) AS n
  FROM documents d JOIN pred ON pred.doc_id = d.doc_id
  GROUP BY d.lang, pred.lang_pred),
rows_ AS (SELECT lang, sum(n) AS r FROM cells GROUP BY lang),
cols_ AS (SELECT lang_pred, sum(n) AS c FROM cells GROUP BY lang_pred),
rc AS (
  SELECT sum(CAST(r AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS s_rc
  FROM rows_ JOIN cols_ ON rows_.lang = cols_.lang_pred),
scalars AS (
  SELECT CAST(sum(n) AS DECIMAL(38,0)) AS n_docs,
         CAST(sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END)
              AS DECIMAL(38,0)) AS s_diag
  FROM cells)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(s_diag AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS po,
       round(CAST(s_rc AS DOUBLE)
             / CAST(n_docs * n_docs AS DOUBLE), 6) AS pe,
       round(CAST(n_docs * s_diag - s_rc AS DOUBLE)
             / CAST(n_docs * n_docs - s_rc AS DOUBLE), 6) AS kappa
FROM scalars, rc
"""


ORACLE_COHENS_KAPPA = _cohens_kappa_oracle()


EVALHARNESS_QUERIES = {
    "auc_rank": q_auc_rank,
    "calibration_curve": q_calibration_curve,
    "rbo_rankings": q_rbo_rankings,
    "ndcg_eval": q_ndcg_eval,
    "bootstrap_ci": q_bootstrap_ci,
    "langid_confusion": q_langid_confusion,
    "cohens_kappa": q_cohens_kappa,
}

EVALHARNESS_ORACLES = {
    "auc_rank": ORACLE_AUC_RANK,
    "calibration_curve": ORACLE_CALIBRATION_CURVE,
    "rbo_rankings": ORACLE_RBO_RANKINGS,
    "ndcg_eval": ORACLE_NDCG_EVAL,
    "bootstrap_ci": ORACLE_BOOTSTRAP_CI,
    "langid_confusion": ORACLE_LANGID_CONFUSION,
    "cohens_kappa": ORACLE_COHENS_KAPPA,
}

_q.QUERIES.update(EVALHARNESS_QUERIES)
_q.ORACLES.update(EVALHARNESS_ORACLES)
