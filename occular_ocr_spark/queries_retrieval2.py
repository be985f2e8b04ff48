"""Retrieval-scoring catalog, round 4 (wave 57): five operators that
grade and extend the ranking stack beyond ``bm25_topk`` / ``ndcg_eval``
/ ``avg_precision_eval`` —

* ``rbp_eval`` — Rank-Biased Precision (Moffat & Zobel 2008) of the
  pure-tf ranker at persistence p = 4/5: RBP@K =
  (1−p)·Σ rel_i·p^(i−1).  Every term (1/5)·(4/5)^(i−1) scaled by
  5^K is the exact integer 4^(i−1)·5^(K−i), so the score and its
  residual upper bound (+p^K, the unjudged-tail uncertainty RBP is
  famous for) are both exact.
* ``err_eval`` — Expected Reciprocal Rank (Chapelle et al. 2009) with
  graded relevance g ∈ {0,1,2} → stop probability R = (2^g−1)/4 ∈
  {0, ¼, ¾}: ERR = Σ_r (1/r)·R_r·Π_{j<r}(1−R_j).  Quarters make the
  cascade product Π(4−q_j) an integer (≤ 4^(K−1), exact in the
  windowed ``product`` double), and lcm(1..K) clears the 1/r — the
  whole cascade is one BIGINT per rank.
* ``ql_dirichlet`` — Dirichlet-smoothed query-likelihood ranking
  (Zhai & Lafferty 2001): score(q,d) = ln((tf + μ·cf_q/|C|)/(len_d+μ)),
  μ = {_QL_MU}; top-{_QL_K} docs per query term over the index-pruned
  candidate set (docs containing the term — the standard posting-list
  evaluation).  ln runs on exact-integer-derived doubles and is
  micro-quantized per row BEFORE the rank, so ordering is
  engine-stable (ties break by doc_id).
* ``term_proximity`` — min-span proximity for two-term queries: pair
  the top-df terms ((1,2), (3,4), …), and for each doc containing
  both, the minimum absolute token-position distance; top-{_TP_K}
  docs per pair by (min_dist asc, doc_id).  Pure integers — the
  MinDist feature of Tao & Zhai 2007.
* ``query_clarity`` — Cronen-Townsend clarity score: KL divergence of
  the top-{_QC_K} result set's unigram LM from the corpus LM,
  Σ_w p(w|R)·ln(p(w|R)/p(w|C)), each vocabulary term's contribution
  micro-quantized before the order-free sum.  Low clarity = ambiguous
  query — the pre-retrieval difficulty predictor.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_retrieval2_wave.py.

Cross-engine float policy: ``rbp_eval`` / ``err_eval`` /
``term_proximity`` are exact-integer end-to-end; ``ql_dirichlet`` and
``query_clarity`` take one ln() per row on exact-integer-derived
doubles and half-up micro-quantize BEFORE any sum or rank (the
markov_entropy_rate convention), so accumulation order and libm
last-ulp noise cannot reorder or change results.

Scale notes: every entry touches only the ≤Q broadcast query terms'
postings plus vocabulary-sized partial aggs; rankings are per-term
windows (never a global sort); the ERR/RBP cascades order only
K-row frames; corpus scalars (|C|, total tokens) ride 1-row
broadcasts.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

_RBP_Q = 8  # query terms (highest-df, the bm25_topk selection rule)
_RBP_K = 10
_RBP_P_NUM, _RBP_P_DEN = 4, 5  # persistence p = 0.8 exact
_RBP_REL_TF = 2  # judgment rule shared with ndcg_eval / avg_precision_eval
_RBP_REL_LANG = "en"
_RBP_SCALE = _RBP_P_DEN**_RBP_K  # 5^K

_ERR_Q = 8
_ERR_K = 10
_ERR_L = 2520  # lcm(1..10)
_ERR_G2_TF = 3  # grade 2: tf >= 3 AND lang = en
_ERR_G1_TF = 2  # grade 1: tf >= 2 (any lang)
_ERR_SCALE = _ERR_L * 4**_ERR_K

_QL_Q = 8
_QL_K = 10
_QL_MU = 200

_TP_PAIRS = 4  # query pairs from the top-2*_TP_PAIRS df terms
_TP_K = 5

_QC_Q = 8
_QC_K = 10


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )


_POSTINGS_SQL = """
postings AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok)
"""


def _qterms(postings: DataFrame, n: int) -> DataFrame:
    return (
        postings.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "tok")
        .limit(n)
        .select("tok")
    )


def _qterms_sql(n: int) -> str:
    return (
        "q AS (SELECT tok FROM "
        "(SELECT tok, count(*) AS df FROM postings GROUP BY tok) "
        f"ORDER BY df DESC, tok LIMIT {n})"
    )


# ---------------------------------------------------------------------------
# rbp_eval
# ---------------------------------------------------------------------------


def q_rbp_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBP@{_RBP_K} at p = {_RBP_P_NUM}/{_RBP_P_DEN} for the pure-tf
    ranker, exact through the 5^K scaling: rank i contributes
    rel_i·4^(i−1)·5^(K−i); rbp_micro = halfup(1e6·Σ, 5^K) and the
    published upper bound adds the residual 4^K (mass of unjudged
    ranks > K).

    Scale: ranking window partitions per term over the ≤Q broadcast
    query terms' postings; the cascade frame is K rows.
    """
    postings = _postings(spark, sf_dir)
    qterms = _qterms(postings, _RBP_Q)
    lang_tbl = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("tok").orderBy(F.col("tf").desc(), "doc_id")
    graded = (
        postings.join(F.broadcast(qterms), "tok")
        .join(lang_tbl, "doc_id")
        .select(
            "tok",
            "doc_id",
            "tf",
            (
                (F.col("tf") >= _RBP_REL_TF)
                & (F.col("lang") == _RBP_REL_LANG)
            )
            .cast("bigint")
            .alias("rel"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _RBP_K)
    )
    scored = graded.selectExpr(
        "tok",
        "rel",
        f"rel * CAST(pow({_RBP_P_NUM}, rnk - 1) AS BIGINT)"
        f" * CAST(pow({_RBP_P_DEN}, {_RBP_K} - rnk) AS BIGINT) AS gain",
    )
    return (
        scored.groupBy("tok")
        .agg(
            F.sum("rel").cast("long").alias("n_rel_topk"),
            F.sum("gain").cast("long").alias("gain"),
        )
        .selectExpr(
            "tok",
            "n_rel_topk",
            f"CAST((2000000 * gain + {_RBP_SCALE})"
            f" DIV (2 * {_RBP_SCALE}) AS BIGINT) AS rbp_micro",
            f"CAST((2000000 * (gain + CAST(pow({_RBP_P_NUM}, {_RBP_K})"
            f" AS BIGINT)) + {_RBP_SCALE})"
            f" DIV (2 * {_RBP_SCALE}) AS BIGINT) AS rbp_max_micro",
        )
    )


ORACLE_RBP_EVAL = f"""
WITH {_POSTINGS_SQL},
{_qterms_sql(_RBP_Q)},
graded AS (
  SELECT p.tok, p.doc_id, p.tf,
         CASE WHEN p.tf >= {_RBP_REL_TF} AND d.lang = '{_RBP_REL_LANG}'
              THEN 1 ELSE 0 END AS rel,
         row_number() OVER (PARTITION BY p.tok
                            ORDER BY p.tf DESC, p.doc_id) AS rnk
  FROM postings p JOIN q USING (tok)
  JOIN documents d ON d.doc_id = p.doc_id),
scored AS (
  SELECT tok, rel,
         rel * CAST(pow({_RBP_P_NUM}, rnk - 1) AS BIGINT)
             * CAST(pow({_RBP_P_DEN}, {_RBP_K} - rnk) AS BIGINT) AS gain
  FROM graded WHERE rnk <= {_RBP_K})
SELECT tok, CAST(sum(rel) AS BIGINT) AS n_rel_topk,
       CAST(CAST(2000000 * sum(gain) + {_RBP_SCALE} AS HUGEINT)
            // CAST(2 * {_RBP_SCALE} AS HUGEINT) AS BIGINT) AS rbp_micro,
       CAST(CAST(2000000 * (sum(gain) + CAST(pow({_RBP_P_NUM}, {_RBP_K})
                 AS BIGINT)) + {_RBP_SCALE} AS HUGEINT)
            // CAST(2 * {_RBP_SCALE} AS HUGEINT) AS BIGINT)
         AS rbp_max_micro
FROM scored GROUP BY tok
"""


# ---------------------------------------------------------------------------
# err_eval
# ---------------------------------------------------------------------------


def q_err_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERR@{_ERR_K} with quarter-unit stop probabilities: grade 2
    (tf ≥ {_ERR_G2_TF} AND lang = en) stops with R = ¾, grade 1
    (tf ≥ {_ERR_G1_TF}) with ¼, else 0.  Per rank r the exact-scaled
    term is (L/r)·q_r·4^(K−r)·Π_{{j<r}}(4−q_j) with q = 4R — the
    cascade product stays ≤ 4^(K−1) so the windowed ``product``
    double is integer-exact; err_micro = halfup(1e6·Σ, L·4^K).

    Scale: identical shapes to rbp_eval — per-term windows over
    broadcast-pruned postings, K-row cascade frames.
    """
    postings = _postings(spark, sf_dir)
    qterms = _qterms(postings, _ERR_Q)
    lang_tbl = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("tok").orderBy(F.col("tf").desc(), "doc_id")
    graded = (
        postings.join(F.broadcast(qterms), "tok")
        .join(lang_tbl, "doc_id")
        .selectExpr(
            "tok",
            "doc_id",
            "tf",
            f"CASE WHEN tf >= {_ERR_G2_TF} AND lang = '{_RBP_REL_LANG}'"
            f" THEN 3 WHEN tf >= {_ERR_G1_TF} THEN 1 ELSE 0 END AS qr",
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _ERR_K)
    )
    wprod = (
        Window.partitionBy("tok")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    terms = graded.withColumn(
        "surv",
        F.coalesce(
            F.product((F.lit(4) - F.col("qr")).cast("double")).over(wprod),
            F.lit(1.0),
        ),
    ).selectExpr(
        "tok",
        "qr",
        f"CAST({_ERR_L} / rnk AS BIGINT) * qr"
        f" * CAST(pow(4, {_ERR_K} - rnk) AS BIGINT)"
        " * CAST(floor(surv + 0.5) AS BIGINT) AS term",
    )
    return (
        terms.groupBy("tok")
        .agg(
            F.sum((F.col("qr") > 0).cast("bigint"))
            .cast("long")
            .alias("n_rel_topk"),
            F.sum("term").cast("decimal(38,0)").alias("s"),
        )
        .selectExpr(
            "tok",
            "n_rel_topk",
            f"CAST((2000000 * s + {_ERR_SCALE})"
            f" DIV (2 * {_ERR_SCALE}) AS BIGINT) AS err_micro",
        )
    )


ORACLE_ERR_EVAL = f"""
WITH {_POSTINGS_SQL},
{_qterms_sql(_ERR_Q)},
graded AS (
  SELECT p.tok, p.doc_id, p.tf,
         CASE WHEN p.tf >= {_ERR_G2_TF} AND d.lang = '{_RBP_REL_LANG}'
              THEN 3 WHEN p.tf >= {_ERR_G1_TF} THEN 1 ELSE 0 END AS qr,
         row_number() OVER (PARTITION BY p.tok
                            ORDER BY p.tf DESC, p.doc_id) AS rnk
  FROM postings p JOIN q USING (tok)
  JOIN documents d ON d.doc_id = p.doc_id),
topk AS (SELECT * FROM graded WHERE rnk <= {_ERR_K}),
terms AS (
  SELECT tok, qr,
         CAST({_ERR_L} / rnk AS BIGINT) * qr
           * CAST(pow(4, {_ERR_K} - rnk) AS BIGINT)
           * CAST(floor(coalesce(
               product(CAST(4 - qr AS DOUBLE))
                 OVER (PARTITION BY tok ORDER BY rnk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               1.0) + 0.5) AS BIGINT) AS term
  FROM topk)
SELECT tok,
       CAST(sum(CASE WHEN qr > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rel_topk,
       CAST(CAST(2000000 * sum(term) + {_ERR_SCALE} AS HUGEINT)
            // CAST(2 * {_ERR_SCALE} AS HUGEINT) AS BIGINT) AS err_micro
FROM terms GROUP BY tok
"""


# ---------------------------------------------------------------------------
# ql_dirichlet
# ---------------------------------------------------------------------------


def q_ql_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query likelihood, μ = {_QL_MU}: for each of
    the top-{_QL_Q} df terms, score candidate docs (index-pruned to
    docs containing the term) by
    ln((tf + μ·cf/T) / (len + μ)) — tf, cf (corpus term count),
    T (corpus token count), and len (doc token count) all exact
    integers, the one ln per row micro-quantized before the per-term
    rank (desc, doc_id); emit the top {_QL_K} per term.

    Scale: cf/T are one vocabulary partial agg + a 1-row broadcast;
    len is a doc-keyed partial agg joined to the ≤Q-term pruned
    postings; ranking windows are per-term.
    """
    postings = _postings(spark, sf_dir)
    qterms = _qterms(postings, _QL_Q)
    cf = postings.groupBy("tok").agg(F.sum("tf").alias("cf"))
    doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("len"))
    total = postings.agg(F.sum("tf").alias("t_tok"))
    scored = (
        postings.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(cf.join(F.broadcast(qterms), "tok")), "tok")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "tok",
            "doc_id",
            "tf",
            "len",
            "CAST(floor(ln((tf + {mu} * (CAST(cf AS DOUBLE) / t_tok))"
            " / CAST(len + {mu} AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"
            " AS score_micro".format(mu=_QL_MU),
        )
    )
    w = Window.partitionBy("tok").orderBy(
        F.col("score_micro").desc(), "doc_id"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _QL_K)
        .select("tok", "rnk", "doc_id", "tf", "len", "score_micro")
    )


ORACLE_QL_DIRICHLET = f"""
WITH {_POSTINGS_SQL},
{_qterms_sql(_QL_Q)},
cf AS (SELECT tok, sum(tf) AS cf FROM postings GROUP BY tok),
doclen AS (SELECT doc_id, sum(tf) AS len FROM postings GROUP BY doc_id),
total AS (SELECT sum(tf) AS t_tok FROM postings),
scored AS (
  SELECT p.tok, p.doc_id, p.tf, l.len,
         CAST(floor(ln((p.tf + {_QL_MU} * (CAST(c.cf AS DOUBLE) / t.t_tok))
                    / CAST(l.len + {_QL_MU} AS DOUBLE)) * 1e6 + 0.5)
              AS BIGINT) AS score_micro
  FROM postings p JOIN q USING (tok)
  JOIN cf c ON c.tok = p.tok
  JOIN doclen l ON l.doc_id = p.doc_id, total t),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tok
                               ORDER BY score_micro DESC, doc_id) AS rnk
  FROM scored)
SELECT tok, CAST(rnk AS INT) AS rnk, doc_id,
       CAST(tf AS BIGINT) AS tf, CAST(len AS BIGINT) AS len, score_micro
FROM ranked WHERE rnk <= {_QL_K}
"""


# ---------------------------------------------------------------------------
# term_proximity
# ---------------------------------------------------------------------------


def q_term_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinDist proximity for {_TP_PAIRS} two-term queries built by
    pairing the top-df terms ((1st,2nd), (3rd,4th), …): per doc
    containing both, min |pos_a − pos_b| over all occurrence pairs;
    top-{_TP_K} docs per query by (min_dist asc, doc_id).  Integers
    end-to-end.

    Scale: positions explode only for the ≤2·{_TP_PAIRS} broadcast
    query terms (anti-joined scan stays pruned); the per-doc min is a
    partial agg over the two terms' position lists within one doc —
    no global window.
    """
    docs = _t(spark, sf_dir, "documents")
    postings = _postings(spark, sf_dir)
    dfc = postings.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.orderBy(F.col("df").desc(), "tok")
    # top is read twice (the pos broadcast and the labels broadcast) and
    # pos twice (the a/b sides of the distance join) — persisted, each
    # branch reads the cache instead of re-running the df window / the
    # full position explode of the corpus.
    top = _q._persist_tracked(
        dfc.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 2 * _TP_PAIRS)
        .selectExpr(
            "tok",
            "CAST((r + 1) DIV 2 AS INT) AS pair_id",
            "r % 2 AS side",
        )
    )
    pos = _q._persist_tracked(
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr("filter(split(text, ' '), x -> x <> '')")
            ).alias("p", "tok"),
        )
        .join(F.broadcast(top), "tok")
        .select("doc_id", "pair_id", "side", (F.col("p") + 1).alias("pos"))
    )
    a = pos.where("side = 1").select(
        "doc_id", "pair_id", F.col("pos").alias("pa")
    )
    b = pos.where("side = 0").select(
        F.col("doc_id").alias("doc_b"),
        F.col("pair_id").alias("pair_b"),
        F.col("pos").alias("pb"),
    )
    dists = (
        a.join(
            b,
            (a.doc_id == b.doc_b) & (a.pair_id == b.pair_b),
        )
        .groupBy("doc_id", "pair_id")
        .agg(F.min(F.abs(F.col("pa") - F.col("pb"))).alias("min_dist"))
    )
    wk = Window.partitionBy("pair_id").orderBy("min_dist", "doc_id")
    labels = (
        top.groupBy("pair_id")
        .agg(
            F.max(F.when(F.col("side") == 1, F.col("tok"))).alias("term_a"),
            F.max(F.when(F.col("side") == 0, F.col("tok"))).alias("term_b"),
        )
    )
    return (
        dists.withColumn("rnk", F.row_number().over(wk))
        .where(F.col("rnk") <= _TP_K)
        .join(F.broadcast(labels), "pair_id")
        .select(
            "pair_id",
            "term_a",
            "term_b",
            "rnk",
            "doc_id",
            F.col("min_dist").cast("long").alias("min_dist"),
        )
    )


ORACLE_TERM_PROXIMITY = f"""
WITH {_POSTINGS_SQL},
top AS (
  SELECT tok, CAST((r + 1) // 2 AS INT) AS pair_id, r % 2 AS side
  FROM (SELECT tok, row_number() OVER (ORDER BY df DESC, tok) AS r
        FROM (SELECT tok, count(*) AS df FROM postings GROUP BY tok))
  WHERE r <= {2 * _TP_PAIRS}),
pos AS (
  SELECT s.doc_id, t.pair_id, t.side, s.pos
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS tok,
               generate_subscripts(list_filter(string_split(text, ' '),
                                               x -> x <> ''), 1) AS pos
        FROM documents) s
  JOIN top t USING (tok)),
dists AS (
  SELECT a.doc_id, a.pair_id, min(abs(a.pos - b.pos)) AS min_dist
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND a.pair_id = b.pair_id
   AND a.side = 1 AND b.side = 0
  GROUP BY 1, 2),
labels AS (
  SELECT pair_id,
         max(CASE WHEN side = 1 THEN tok END) AS term_a,
         max(CASE WHEN side = 0 THEN tok END) AS term_b
  FROM top GROUP BY pair_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pair_id
                               ORDER BY min_dist, doc_id) AS rnk
  FROM dists)
SELECT r.pair_id, l.term_a, l.term_b, CAST(r.rnk AS INT) AS rnk,
       r.doc_id, CAST(r.min_dist AS BIGINT) AS min_dist
FROM ranked r JOIN labels l USING (pair_id)
WHERE r.rnk <= {_TP_K}
"""


# ---------------------------------------------------------------------------
# query_clarity
# ---------------------------------------------------------------------------


def q_query_clarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronen-Townsend clarity per top-{_QC_Q} df term: with R = the
    term's top-{_QC_K} tf-ranked docs, clarity =
    Σ_w (tfR_w/lenR)·ln(tfR_w·T/(lenR·cf_w)) over R's vocabulary —
    each term's double contribution is micro-quantized BEFORE the
    sum (order-free), inputs all exact integers.

    Scale: R is ≤ Q·K broadcast docs; the vocabulary sum touches only
    their postings joined to the corpus cf partial agg; T rides a
    1-row broadcast.
    """
    postings = _postings(spark, sf_dir)
    qterms = _qterms(postings, _QC_Q)
    w = Window.partitionBy("tok").orderBy(F.col("tf").desc(), "doc_id")
    cands = (
        postings.join(F.broadcast(qterms), "tok")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _QC_K)
        .select(F.col("tok").alias("qt"), "doc_id")
    )
    # persisted: rlen and the term frame both read rtf — unpersisted
    # each re-ran the candidate-postings join + rollup
    rtf = _q._persist_tracked(
        postings.join(F.broadcast(cands), "doc_id")
        .groupBy("qt", "tok")
        .agg(F.sum("tf").alias("tfr"))
    )
    rlen = rtf.groupBy("qt").agg(F.sum("tfr").alias("lenr"))
    cf = postings.groupBy("tok").agg(F.sum("tf").alias("cf"))
    total = postings.agg(F.sum("tf").alias("t_tok"))
    terms = (
        rtf.join(cf, "tok")
        .join(F.broadcast(rlen), "qt")
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "qt",
            "CAST(floor((CAST(tfr AS DOUBLE) / lenr)"
            " * ln(CAST(tfr AS DOUBLE) * t_tok"
            " / (CAST(lenr AS DOUBLE) * cf)) * 1e6 + 0.5) AS BIGINT)"
            " AS c_micro",
        )
    )
    return (
        terms.groupBy("qt")
        .agg(
            F.count("*").cast("long").alias("vocab_r"),
            F.sum("c_micro").cast("long").alias("clarity_micro"),
        )
        .select(F.col("qt").alias("tok"), "vocab_r", "clarity_micro")
    )


ORACLE_QUERY_CLARITY = f"""
WITH {_POSTINGS_SQL},
{_qterms_sql(_QC_Q)},
cands AS (
  SELECT tok AS qt, doc_id FROM (
    SELECT p.tok, p.doc_id,
           row_number() OVER (PARTITION BY p.tok
                              ORDER BY p.tf DESC, p.doc_id) AS rnk
    FROM postings p JOIN q USING (tok)) s
  WHERE rnk <= {_QC_K}),
rtf AS (
  SELECT c.qt, p.tok, sum(p.tf) AS tfr
  FROM postings p JOIN cands c USING (doc_id)
  GROUP BY 1, 2),
rlen AS (SELECT qt, sum(tfr) AS lenr FROM rtf GROUP BY qt),
cf AS (SELECT tok, sum(tf) AS cf FROM postings GROUP BY tok),
total AS (SELECT sum(tf) AS t_tok FROM postings),
terms AS (
  SELECT r.qt,
         CAST(floor((CAST(r.tfr AS DOUBLE) / l.lenr)
              * ln(CAST(r.tfr AS DOUBLE) * t.t_tok
                   / (CAST(l.lenr AS DOUBLE) * c.cf)) * 1e6 + 0.5)
              AS BIGINT) AS c_micro
  FROM rtf r JOIN cf c USING (tok) JOIN rlen l USING (qt), total t)
SELECT qt AS tok, CAST(count(*) AS BIGINT) AS vocab_r,
       CAST(sum(c_micro) AS BIGINT) AS clarity_micro
FROM terms GROUP BY qt
"""


RETRIEVAL2_QUERIES = {
    "rbp_eval": q_rbp_eval,
    "err_eval": q_err_eval,
    "ql_dirichlet": q_ql_dirichlet,
    "term_proximity": q_term_proximity,
    "query_clarity": q_query_clarity,
}

RETRIEVAL2_ORACLES = {
    "rbp_eval": ORACLE_RBP_EVAL,
    "err_eval": ORACLE_ERR_EVAL,
    "ql_dirichlet": ORACLE_QL_DIRICHLET,
    "term_proximity": ORACLE_TERM_PROXIMITY,
    "query_clarity": ORACLE_QUERY_CLARITY,
}

_q.QUERIES.update(RETRIEVAL2_QUERIES)
_q.ORACLES.update(RETRIEVAL2_ORACLES)
