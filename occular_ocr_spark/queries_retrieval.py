"""Retrieval + web-curation catalog, round 3 (session 5): the two
operators a web-scale corpus pipeline runs that the catalog did not yet
gate-verify —

* ``bm25_topk`` — Okapi BM25 ranking over the inverted-index shape:
  the length-normalized, saturating lexical scorer production search
  actually uses (``sparse_retrieval`` is its unsaturated TF-IDF
  sibling).  Everything — idf, length norm, the score — is computed
  IN-PLAN on both engines (no driver-side math), so the value-hash
  gate pins the full formula.
* ``url_canonicalize`` — URL canonicalization + frontier dedup: scheme/
  host lowercasing, default-port strip, fragment strip, tracking-param
  removal, query-param reordering — the normalization every crawler
  runs before its seen-URL check, where raw-variant collapse IS the
  dedup win.

House contract (same as every other catalog module): deterministic
synthesis from the sf tables, the Spark plan is the 100 TB design, a
DuckDB oracle replays the exact semantics for the driver's value-hash
gate, and the module self-registers into queries.QUERIES / ORACLES on
import.

Reference parity: the reference engine has no retrieval layer; these
are north-rule additions (the "operations a large-scale training-data
pipeline would need" tier), sited next to sparse_retrieval
(queries_scale.py:644) and link_extract (queries_transcript.py:237).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# Okapi BM25 top-k retrieval
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY_TERMS = 3
_BM25_TOPK = 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k: score(d) = sum_t idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl)) with the Lucene idf
    ln(1 + (N - df + 0.5)/(df + 0.5)); query = the
    _BM25_QUERY_TERMS highest-df tokens (ties by token), so both
    engines search for the same thing.

    Scale shape: the corpus is tokenized ONCE into a cached postings
    lineage (doc_id, tok, tf) — document lengths, document frequencies,
    and the corpus stats are all partial-agg rollups of it, never a
    second scan.  The query side is a K-row broadcast (df per query
    term) and corpus stats ride a 1-row broadcast crossJoin (the
    domain_mix_weights pattern) — scoring therefore touches ONLY
    postings of query terms (index-pruned), shuffles once on doc_id to
    attach lengths, and ends in TakeOrdered.  No driver-side float
    math: idf and the length norm are Catalyst expressions, so the
    oracle pins the formula itself, not a Python reimplementation.
    Both engines rank by the ROUNDED score (doc_id tie-break) so
    sub-ulp summation order cannot reorder the cut.  At 100 TB the
    postings/doclen/df tables are the pre-built inverted index this
    entry's first half materializes; per-query work is the second half
    only.
    """
    # release-tracked, not a bare cache: a bench session invoking the
    # catalog repeatedly must be able to drop this block afterwards
    # (queries.release_persists — the ADVICE-r3 leak rule)
    postings = _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfc = postings.groupBy("tok").agg(F.count("*").alias("df"))
    qterms = dfc.orderBy(F.col("df").desc(), "tok").limit(_BM25_QUERY_TERMS)
    doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # N = docs with >= 1 token (one definition, derived from the same
    # lineage on both engines); avg over exact integer sums is exact.
    tot = doclen.groupBy().agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("nd")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (_BM25_K1 + 1) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        postings.join(F.broadcast(qterms), "tok")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * norm), 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(_BM25_TOPK)


ORACLE_BM25_TOPK = f"""
WITH postings AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok),
dfs AS (SELECT tok, count(*) AS df FROM postings GROUP BY tok),
q AS (SELECT tok, df FROM dfs ORDER BY df DESC, tok LIMIT {_BM25_QUERY_TERMS}),
dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
tot AS (SELECT avg(dl) AS avgdl, count(*) AS nd FROM dl),
scored AS (
  SELECT p.doc_id,
         round(sum(
           ln(1 + (tot.nd - q.df + 0.5) / (q.df + 0.5))
           * p.tf * ({_BM25_K1} + 1)
           / (p.tf + {_BM25_K1} * (1 - {_BM25_B}
                                   + {_BM25_B} * dl.dl / tot.avgdl))
         ), 4) AS score
  FROM postings p
  JOIN q USING (tok)
  JOIN dl USING (doc_id), tot
  GROUP BY p.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# URL canonicalization + frontier dedup
# ---------------------------------------------------------------------------
#
# Raw-variant synthesis: four per-doc variants of the "same" resource
# (doc_id % 4) — mixed-case scheme/host + default port + tracking param
# + fragment + reordered query; plain reordered query; tracking-only
# query + default port; bare.  Canonicalization collapses 0 with 1 and
# 2 with 3, so the entry's output VISIBLY demonstrates the dedup win
# (n_variants > 1) rather than hashing unchanged strings.

_UTM_PREFIX = "utm_"


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + canonical-key dedup rollup: lowercase
    scheme/host, strip default ports (:80/:443) and fragments, drop
    ``utm_*`` tracking params, sort surviving query params, then roll
    up raw variants per canonical URL — the seen-URL normalization at
    the head of every crawl/curation pipeline.

    Scale shape: canonicalization is 100% map-side codegen'd JVM string
    ops (regexp_extract for scheme/host/path/query, higher-order
    filter + array_sort + array_join for the param set — no Python, no
    UDF); the rollup is ONE partial-agg groupBy on the canonical key.
    The distinct-raw-variant count is the standard two-phase expand; at
    100 TB the canonical key is also the natural Iceberg bucket key, so
    the frontier check becomes a bucket-local anti-join
    (incremental_extract pattern).
    """
    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    h = (doc % 5).cast("string")
    p = (doc % 50).cast("string")
    raw = (
        F.when(
            doc % 4 == 0,
            F.concat(
                F.lit("HTTPS://H"), h,
                F.lit(".Example.COM:443/p"), p,
                F.lit("?b=2&utm_source=x&a=1#frag"),
            ),
        )
        .when(
            doc % 4 == 1,
            F.concat(
                F.lit("https://h"), h, F.lit(".example.com/p"), p,
                F.lit("?a=1&b=2"),
            ),
        )
        .when(
            doc % 4 == 2,
            F.concat(
                F.lit("https://h"), h, F.lit(".example.com:443/p"), p,
                F.lit("?utm_campaign=y"),
            ),
        )
        .otherwise(
            F.concat(F.lit("https://h"), h, F.lit(".example.com/p"), p)
        )
    )
    u = d.select("doc_id", raw.alias("raw"))
    scheme = F.lower(F.regexp_extract("raw", r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("raw", r"^[A-Za-z]+://([^/?#]+)", 1)),
        r":(443|80)$",
        "",
    )
    path = F.regexp_extract("raw", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract("raw", r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.startswith(_UTM_PREFIX),
        )
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )
    return (
        u.select("doc_id", "raw", canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count("*").cast("int").alias("n_urls"),
            F.countDistinct("raw").cast("int").alias("n_variants"),
        )
    )


ORACLE_URL_CANONICALIZE = f"""
WITH u AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 4 = 0 THEN
             'HTTPS://H' || CAST(doc_id % 5 AS VARCHAR)
             || '.Example.COM:443/p' || CAST(doc_id % 50 AS VARCHAR)
             || '?b=2&utm_source=x&a=1#frag'
           WHEN doc_id % 4 = 1 THEN
             'https://h' || CAST(doc_id % 5 AS VARCHAR)
             || '.example.com/p' || CAST(doc_id % 50 AS VARCHAR)
             || '?a=1&b=2'
           WHEN doc_id % 4 = 2 THEN
             'https://h' || CAST(doc_id % 5 AS VARCHAR)
             || '.example.com:443/p' || CAST(doc_id % 50 AS VARCHAR)
             || '?utm_campaign=y'
           ELSE
             'https://h' || CAST(doc_id % 5 AS VARCHAR)
             || '.example.com/p' || CAST(doc_id % 50 AS VARCHAR)
         END AS raw
  FROM documents),
parts AS (
  SELECT doc_id, raw,
         lower(regexp_extract(raw, '^([A-Za-z]+)://', 1)) AS scheme,
         regexp_replace(
           lower(regexp_extract(raw, '^[A-Za-z]+://([^/?#]+)', 1)),
           ':(443|80)$', '') AS host,
         regexp_extract(raw, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
         coalesce(regexp_extract(raw, '\\?([^#]*)', 1), '') AS query
  FROM u),
canon AS (
  SELECT doc_id, raw,
         scheme || '://' || host || path ||
         CASE WHEN len(list_sort(list_filter(string_split(query, '&'),
                     x -> x <> '' AND NOT starts_with(x, '{_UTM_PREFIX}')))) > 0
              THEN '?' || array_to_string(
                     list_sort(list_filter(string_split(query, '&'),
                       x -> x <> '' AND NOT starts_with(x, '{_UTM_PREFIX}'))),
                     '&')
              ELSE '' END AS canon_url
  FROM parts)
SELECT canon_url,
       CAST(count(*) AS INT) AS n_urls,
       CAST(count(DISTINCT raw) AS INT) AS n_variants
FROM canon GROUP BY canon_url
"""


# ---------------------------------------------------------------------------
# Registration
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# hard_negative_mining — (query, positive, hard-negative) triplets
# ---------------------------------------------------------------------------

_HN_Q = 8  # query terms (highest-df, the bm25_topk selection rule)
_HN_P = 5  # triplets per query
_HN_REL_TF = 2  # relevance labels shared with ndcg_eval
_HN_REL_LANG = "en"


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for embedding/reranker training: for each query
    term, pair the r-th best RELEVANT document with the r-th best
    NON-relevant one under the same BM25 ranking — the "hard negatives
    from the first-stage retriever" recipe (a random negative is too
    easy; the top-ranked non-relevant docs are exactly what the trained
    model must learn to push down).  Labels are the ``ndcg_eval``
    language-conditioned tf-threshold judgments, so this entry MINES
    from the same eval frame that grades the ranker.

    Output: (tok, r, pos_doc, neg_doc, margin) for r ≤ _HN_P where both
    sides exist; margin = pos_score − neg_score (negative margins are
    the hard cases).

    Scale: scoring touches only query-term postings (broadcast Q-row
    term list); both rankings are per-term windows over those pruned
    postings (≤ Q frames); the pairing is one equi-join on (tok, r) —
    triplet-sized.  Determinism: ranks order by the ROUNDED score with
    doc_id tie-break (the bm25 cut rule); margin is a difference of
    already-rounded scores.
    """
    postings = _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfc = postings.groupBy("tok").agg(F.count("*").alias("df"))
    qterms = dfc.orderBy(F.col("df").desc(), "tok").limit(_HN_Q)
    doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = doclen.groupBy().agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("nd")
    )
    lang_tbl = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    idf = F.log(
        F.lit(1.0) + (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (_BM25_K1 + 1) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    # persisted: both the positive and negative rankings read the
    # scored frame — unpersisted each re-ran the 4-way scoring join
    scored = _q._persist_tracked(
        postings.join(F.broadcast(qterms), "tok")
        .join(doclen, "doc_id")
        .join(lang_tbl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "doc_id",
            F.round(idf * norm, 4).alias("score"),
            (
                (F.col("tf") >= _HN_REL_TF)
                & (F.col("lang") == _HN_REL_LANG)
            ).alias("rel"),
        )
    )
    w = Window.partitionBy("tok").orderBy(F.col("score").desc(), "doc_id")
    pos = (
        scored.where(F.col("rel"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _HN_P)
        .select("tok", "r", F.col("doc_id").alias("pos_doc"),
                F.col("score").alias("pos_score"))
    )
    neg = (
        scored.where(~F.col("rel"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _HN_P)
        .select("tok", "r", F.col("doc_id").alias("neg_doc"),
                F.col("score").alias("neg_score"))
    )
    return pos.join(neg, ["tok", "r"]).select(
        "tok",
        F.col("r").cast("int").alias("r"),
        "pos_doc",
        "neg_doc",
        F.round(F.col("pos_score") - F.col("neg_score"), 4).alias("margin"),
    )


ORACLE_HARD_NEGATIVE_MINING = f"""
WITH postings AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok),
dfs AS (SELECT tok, count(*) AS df FROM postings GROUP BY tok),
q AS (SELECT tok, df FROM dfs ORDER BY df DESC, tok LIMIT {_HN_Q}),
dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
tot AS (SELECT avg(dl) AS avgdl, count(*) AS nd FROM dl),
scored AS (
  SELECT p.tok, p.doc_id,
         round(ln(1 + (tot.nd - q.df + 0.5) / (q.df + 0.5))
               * p.tf * ({_BM25_K1} + 1)
               / (p.tf + {_BM25_K1} * (1 - {_BM25_B}
                                       + {_BM25_B} * dl.dl / tot.avgdl)),
               4) AS score,
         (p.tf >= {_HN_REL_TF} AND d.lang = '{_HN_REL_LANG}') AS rel
  FROM postings p JOIN q USING (tok) JOIN dl USING (doc_id)
  JOIN documents d ON p.doc_id = d.doc_id, tot),
pos AS (
  SELECT tok, row_number() OVER (PARTITION BY tok
                                 ORDER BY score DESC, doc_id) AS r,
         doc_id AS pos_doc, score AS pos_score
  FROM scored WHERE rel QUALIFY r <= {_HN_P}),
neg AS (
  SELECT tok, row_number() OVER (PARTITION BY tok
                                 ORDER BY score DESC, doc_id) AS r,
         doc_id AS neg_doc, score AS neg_score
  FROM scored WHERE NOT rel QUALIFY r <= {_HN_P})
SELECT pos.tok, CAST(pos.r AS INT) AS r, pos_doc, neg_doc,
       round(pos_score - neg_score, 4) AS margin
FROM pos JOIN neg USING (tok, r)
"""


# ---------------------------------------------------------------------------
# rrf_fusion
# ---------------------------------------------------------------------------

_RRF_C = 60  # the canonical smoothing constant (Cormack et al. 2009)
_RRF_DEPTH = 20  # per-ranker list depth entering the fusion


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    rankers over the same query — the standard zero-training ensemble
    that merges lexical retrieval systems before a reranker sees them:

    * ranker A — Okapi BM25 over the ``_BM25_QUERY_TERMS`` highest-df
      tokens (the exact ``bm25_topk`` scoring: rounded-4 score,
      doc_id tie-break);
    * ranker B — raw term-frequency sum over the SAME query terms
      (exact BIGINT, doc_id tie-break) — the boolean-ish baseline RRF
      exists to absorb.

    fused(d) = Σ_lists 1/(C + rank_d); a doc missing from a list
    contributes 0 (top-``_RRF_DEPTH`` fusion).  Each reciprocal is a
    single IEEE division of exact integers and the fusion is one
    fixed-order two-term sum, so the fused score is bit-identical on
    both engines with NO rounding tricks needed; rounding to 6 is
    cosmetic.

    Scale: both rankers share ONE postings lineage (the bm25_topk
    cached build); each ranking ends in TakeOrdered(depth), the
    fusion is a full outer join of two depth-row lists — driver-free,
    broadcast-sized.  At 100 TB per-query work is index-pruned to the
    query terms' postings exactly like bm25_topk.
    """
    postings = _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfc = postings.groupBy("tok").agg(F.count("*").alias("df"))
    qterms = dfc.orderBy(F.col("df").desc(), "tok").limit(_BM25_QUERY_TERMS)
    doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = doclen.groupBy().agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("nd")
    )
    qpost = postings.join(F.broadcast(qterms), "tok")
    idf = F.log(
        F.lit(1.0)
        + (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (_BM25_K1 + 1) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    top_a = (
        qpost.join(doclen, "doc_id")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * norm), 4).alias("score_a"))
        .orderBy(F.col("score_a").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    top_b = (
        qpost.groupBy("doc_id")
        .agg(F.sum("tf").cast("bigint").alias("score_b"))
        .orderBy(F.col("score_b").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    wa = Window.orderBy(F.col("score_a").desc(), "doc_id")
    wb = Window.orderBy(F.col("score_b").desc(), "doc_id")
    ra = top_a.select(
        "doc_id", F.row_number().over(wa).cast("int").alias("r_bm25")
    )
    rb = top_b.select(
        "doc_id", F.row_number().over(wb).cast("int").alias("r_tf")
    )
    fused = ra.join(rb, "doc_id", "full_outer").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "r_bm25",
        "r_tf",
        F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_C) + F.col("r_bm25")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_C) + F.col("r_tf")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    return fused


ORACLE_RRF_FUSION = f"""
WITH postings AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok),
dfs AS (SELECT tok, count(*) AS df FROM postings GROUP BY tok),
q AS (SELECT tok, df FROM dfs ORDER BY df DESC, tok LIMIT {_BM25_QUERY_TERMS}),
dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
tot AS (SELECT avg(dl) AS avgdl, count(*) AS nd FROM dl),
top_a AS (
  SELECT p.doc_id,
         round(sum(
           ln(1 + (tot.nd - q.df + 0.5) / (q.df + 0.5))
           * p.tf * ({_BM25_K1} + 1)
           / (p.tf + {_BM25_K1} * (1 - {_BM25_B}
                                   + {_BM25_B} * dl.dl / tot.avgdl))
         ), 4) AS score_a
  FROM postings p
  JOIN q USING (tok)
  JOIN dl USING (doc_id), tot
  GROUP BY p.doc_id
  ORDER BY score_a DESC, p.doc_id LIMIT {_RRF_DEPTH}),
top_b AS (
  SELECT p.doc_id, CAST(sum(p.tf) AS BIGINT) AS score_b
  FROM postings p JOIN q USING (tok)
  GROUP BY p.doc_id
  ORDER BY score_b DESC, p.doc_id LIMIT {_RRF_DEPTH}),
ra AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score_a DESC, doc_id)
                      AS INT) AS r_bm25
  FROM top_a),
rb AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score_b DESC, doc_id)
                      AS INT) AS r_tf
  FROM top_b)
SELECT CAST(coalesce(ra.doc_id, rb.doc_id) AS BIGINT) AS doc_id,
       r_bm25, r_tf,
       round(coalesce(1.0 / ({_RRF_C} + r_bm25), 0.0)
             + coalesce(1.0 / ({_RRF_C} + r_tf), 0.0), 6) AS rrf_score
FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
"""


RETRIEVAL_QUERIES = {
    "bm25_topk": q_bm25_topk,
    "rrf_fusion": q_rrf_fusion,
    "url_canonicalize": q_url_canonicalize,
    "hard_negative_mining": q_hard_negative_mining,
}

RETRIEVAL_ORACLES = {
    "bm25_topk": ORACLE_BM25_TOPK,
    "rrf_fusion": ORACLE_RRF_FUSION,
    "url_canonicalize": ORACLE_URL_CANONICALIZE,
    "hard_negative_mining": ORACLE_HARD_NEGATIVE_MINING,
}

_q.QUERIES.update(RETRIEVAL_QUERIES)
_q.ORACLES.update(RETRIEVAL_ORACLES)
