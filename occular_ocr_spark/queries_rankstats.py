"""Rank-statistics & storage-audit catalog, round 4 (wave 28): five
operators a curation platform runs to grade its rankers, correlate its
quality signals, and audit its storage layout —

* ``mrr_eval`` — MRR@K of the BM25 ranker per query term: the
  reciprocal rank of the FIRST relevant document in the top K (0 when
  none retrieved), the standard QA-retrieval headline next to
  ``ndcg_eval``'s graded view.
* ``spearman_corr`` — Spearman rank correlation (midrank tie
  handling) between two per-document quality signals (char length vs
  token count), computed from per-VALUE counts so no per-row global
  rank ever materializes — the "do my quality scores even agree?"
  check before one of them gates data.
* ``kendall_tau`` — Kendall τ-b between two SOURCE rankings (by total
  tokens vs by total chars): concordant/discordant pair counting
  with full tie correction, exact integers end-to-end.
* ``readability_score`` — per-document Flesch reading ease from
  regex-counted sentences and vowel-group syllables: the classic
  readability gate in quality funnels (Gopher/C4-style heuristics).
* ``zone_map_prune`` — file-skipping audit: synthesize two physical
  layouts (portable-hash vs value-bucketed by ``n_chars``), build each
  file's zone map (min/max), and report how many files a fixed range
  predicate can skip under each — the number that justifies sort/
  Z-order layouts before a 1000-executor scan.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_rankstats_wave.py.

Cross-engine float policy: mrr/prune fractions use the integer
half-up micro-unit division; Spearman/Kendall keep every moment an
exact integer (2×midrank trick; DECIMAL(38,0) promotion before the
cross products) and convert to DOUBLE only inside the final rounded
expression; readability divides exact integers with a shared literal
formula (identical expression tree on both engines).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the eval-harness family
(``ndcg_eval`` / ``auc_rank`` queries_evalharness.py — mrr reuses the
same BM25 scaffolding and relevance labels), the stats family
(``corr_matrix`` queries_drift.py, ``cohens_kappa``), the quality
family (``gopher_rules``, ``quality_score``) and the warehouse family
(``zorder_cluster`` queries_scale.py — zone_map_prune measures the
benefit zorder exists to create).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t
from .queries_evalharness import (
    _NDCG_B,
    _NDCG_K,
    _NDCG_K1,
    _NDCG_Q,
    _NDCG_REL_LANG,
    _NDCG_REL_TF,
)

# ---------------------------------------------------------------------------
# mrr_eval
# ---------------------------------------------------------------------------


def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@K per query term: rank documents with the exact BM25 formula
    of ``bm25_topk``/``ndcg_eval`` (same constants, same rounded-score
    + doc_id tie-break) and report the rank of the FIRST relevant
    document within the top ``_NDCG_K`` plus its reciprocal (0.0 when
    the top K contains no relevant document; relevance labels are
    ``ndcg_eval``'s tf/lang rule).  The single-number "did we put a
    right answer first?" metric.

    Scale: identical exchange budget to ``ndcg_eval`` — one postings
    pass, broadcast Q-row term list prunes scoring to query-term
    postings, the ranking window partitions per TERM (≤ Q frames).
    The reciprocal is the house integer half-up micro-division, so the
    surface is float-risk-free.
    """
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
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _NDCG_K)
        .groupBy("tok")
        .agg(
            F.min(F.when(F.col("rel") == 1, F.col("rnk")))
            .cast("bigint")
            .alias("first_rel_rank")
        )
        .select(
            "tok",
            "first_rel_rank",
            F.coalesce(
                F.expr(
                    "(2000000 + first_rel_rank) DIV (2 * first_rel_rank)"
                )
                / 1000000.0,
                F.lit(0.0),
            ).alias("rr"),
        )
    )


ORACLE_MRR_EVAL = f"""
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
ranked AS (
  SELECT tok, rel,
         row_number() OVER (PARTITION BY tok ORDER BY score DESC, doc_id) AS rnk
  FROM scored),
firsts AS (
  SELECT tok,
         CAST(min(CASE WHEN rel = 1 THEN rnk END) AS BIGINT) AS first_rel_rank
  FROM ranked WHERE rnk <= {_NDCG_K} GROUP BY tok)
SELECT tok, first_rel_rank,
       coalesce(((2000000 + first_rel_rank) // (2 * first_rel_rank)) / 1000000.0,
                CAST(0.0 AS DOUBLE)) AS rr
FROM firsts
"""


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------


def _spearman_sql(dialect: str) -> str:
    """Dual-dialect Spearman ρ with midrank ties between ``n_chars``
    (x) and the whitespace token count (y).

    2·midrank(v) = 2·(#rows below v) + (#rows at v) + 1 — an exact
    integer per VALUE, built from one groupBy(value) + a prefix-sum
    window over the ≤ #distinct-value rows (the ``auc_rank`` frame,
    never a per-row global window).  ρ is then Pearson over the
    doubled midranks (the ×2 cancels):

        ρ = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))

    with every moment an exact integer — promoted to DECIMAL(38,0)
    before the cross products (n·Σxy ≈ 4n³ overflows BIGINT past
    n ≈ 1.6e6) — and ONE final double expression, shared verbatim by
    both engines, rounded to 6.
    """
    ntoks = (
        "size(split(text, ' '))"
        if dialect == "spark"
        else "len(string_split(text, ' '))"
    )
    dec = "DECIMAL(38,0)"
    return f"""
WITH vals AS (
  SELECT CAST(n_chars AS BIGINT) AS x, CAST({ntoks} AS BIGINT) AS y
  FROM documents),
xc AS (SELECT x AS v, count(*) AS c FROM vals GROUP BY x),
xr AS (
  SELECT v, 2 * coalesce(sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2
  FROM xc),
yc AS (SELECT y AS v, count(*) AS c FROM vals GROUP BY y),
yr AS (
  SELECT v, 2 * coalesce(sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2
  FROM yc),
ranked AS (
  SELECT CAST(xr.r2 AS {dec}) AS rx, CAST(yr.r2 AS {dec}) AS ry
  FROM vals JOIN xr ON vals.x = xr.v JOIN yr ON vals.y = yr.v),
m AS (
  SELECT CAST(count(*) AS {dec}) AS n,
         CAST(sum(rx) AS {dec}) AS sx,
         CAST(sum(ry) AS {dec}) AS sy,
         CAST(sum(rx * ry) AS {dec}) AS sxy,
         CAST(sum(rx * rx) AS {dec}) AS sxx,
         CAST(sum(ry * ry) AS {dec}) AS syy
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n_rows,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
FROM m
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (midrank ties) between two quality
    signals — char length vs token count — the sanity check that two
    quality gates broadly agree before either one filters a corpus.

    Scale: the corpus collapses to per-VALUE counts first; midranks
    are prefix sums over ≤ #distinct-value rows; the rank tables
    broadcast back onto the rows, and the five moments are one partial
    agg.  Degenerate inputs (constant column → zero variance) return
    zero rows on both engines via the variance guard.
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_spearman_sql("spark"))


ORACLE_SPEARMAN_CORR = _spearman_sql("duck")


# ---------------------------------------------------------------------------
# kendall_tau
# ---------------------------------------------------------------------------


def _kendall_sql(dialect: str) -> str:
    """Dual-dialect Kendall τ-b between two SOURCE rankings — by total
    token count (metric a) and by total char count (metric b).  Pairs of
    sources are compared directly on the metric VALUES (ranking by a
    value and comparing ranks is the same as comparing values), so no
    rank ever needs to exist:

        C/D  = concordant / discordant pairs,
        Ta/Tb = pairs tied on a / on b (double ties counted in both),
        τ_b  = (C − D) / (sqrt(n0 − Ta') · sqrt(n0 − Tb'))

    where n0 = S(S−1)/2 and Ta' counts pairs tied on a.  Everything up
    to the final sqrt is exact integers over the S-row self-join
    (S = #sources — a bounded dimension, the house tiny-frame
    exception)."""
    ntoks = (
        "size(split(text, ' '))"
        if dialect == "spark"
        else "len(string_split(text, ' '))"
    )
    return f"""
WITH caps AS (
  SELECT source, CAST(sum({ntoks}) AS BIGINT) AS a,
         CAST(sum(n_chars) AS BIGINT) AS b
  FROM documents GROUP BY source),
pairs AS (
  SELECT CASE WHEN (x.a - y.a) * (x.b - y.b) > 0 THEN 1 ELSE 0 END AS con,
         CASE WHEN (x.a - y.a) * (x.b - y.b) < 0 THEN 1 ELSE 0 END AS dis,
         CASE WHEN x.a = y.a THEN 1 ELSE 0 END AS ta,
         CASE WHEN x.b = y.b THEN 1 ELSE 0 END AS tb
  FROM caps x JOIN caps y ON x.source < y.source),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(con) AS BIGINT) AS c, CAST(sum(dis) AS BIGINT) AS d,
         CAST(sum(ta) AS BIGINT) AS ta, CAST(sum(tb) AS BIGINT) AS tb
  FROM pairs)
SELECT n0 AS n_pairs, c AS concordant, d AS discordant,
       round(CAST(c - d AS DOUBLE)
             / (sqrt(CAST(n0 - ta AS DOUBLE)) * sqrt(CAST(n0 - tb AS DOUBLE))),
             6) AS tau_b
FROM m
WHERE n0 - ta > 0 AND n0 - tb > 0
"""


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b agreement between ranking sources by total tokens
    vs by total chars — the rank-agreement check run before one
    source-level ordering (e.g. for mixture priority) substitutes for
    another.

    Scale: caps are ONE partial-aggregated token pass to S rows; the
    pair comparison is the S-row self-join (bounded dimension).  All
    counts exact integers; only the final τ expression is float,
    rounded to 6.
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_kendall_sql("spark"))


ORACLE_KENDALL_TAU = _kendall_sql("duck")


# ---------------------------------------------------------------------------
# readability_score
# ---------------------------------------------------------------------------


def _readability_sql(dialect: str) -> str:
    """Dual-dialect Flesch reading ease:

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    with sentences = max(1, #'[.!?]+' runs), words = whitespace tokens,
    syllables = vowel-group runs '[aeiouy]+' over the lowercased text
    (the standard regex approximation).  Both engines count with the
    same regexes (verified: run-class patterns behave identically in
    Java regex and RE2) and evaluate the same literal expression tree
    over exact integers, so the only float freedom is IEEE-determined.
    """
    if dialect == "spark":
        nw = "size(split(text, ' '))"
        nsent = "size(regexp_extract_all(text, '[.!?]+', 0))"
        nsyl = "size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
        greatest = "greatest"
    else:
        nw = "len(string_split(text, ' '))"
        nsent = "len(regexp_extract_all(text, '[.!?]+'))"
        nsyl = "len(regexp_extract_all(lower(text), '[aeiouy]+'))"
        greatest = "greatest"
    return f"""
WITH c AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST({nw} AS BIGINT) AS n_words,
         CAST({greatest}({nsent}, 1) AS BIGINT) AS n_sentences,
         CAST({nsyl} AS BIGINT) AS n_syllables
  FROM documents WHERE length(text) > 0)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
         AS flesch
FROM c WHERE n_words > 0
"""


def q_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Flesch reading ease — the classic readability gate
    in quality funnels: boilerplate/navigation junk scores far outside
    the natural-prose band, gibberish collapses the syllable ratio.

    Scale: pure map-side row arithmetic (three regex counts + one
    literal formula) — zero exchanges, zero joins; Catalyst keeps the
    whole thing in one WholeStageCodegen span over the scan.
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_readability_sql("spark"))


ORACLE_READABILITY_SCORE = _readability_sql("duck")


# ---------------------------------------------------------------------------
# zone_map_prune
# ---------------------------------------------------------------------------

_ZM_FILES = 16     # files in the hash layout
_ZM_WIDTH = 50     # n_chars per file in the value-bucketed layout
_ZM_LO, _ZM_HI = 250, 350  # the audited range predicate on n_chars


def _zone_map_sql(dialect: str) -> str:
    """Dual-dialect file-skipping audit: assign every row to a file
    under two layouts — ``hash`` (portable md5-hash16(doc_id) mod
    ``_ZM_FILES``, the layout a hash-partitioned writer produces) and
    ``bychars`` (n_chars DIV ``_ZM_WIDTH``, the layout a sort/Z-order
    writer produces) — build each file's zone map (min/max n_chars),
    and evaluate which files the predicate
    ``n_chars BETWEEN {_ZM_LO} AND {_ZM_HI}`` can skip:

        scanned(file) ⇔ max ≥ lo AND min ≤ hi.

    Integer arithmetic end-to-end; the prune fraction is the house
    half-up micro-division."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    div = "DIV" if dialect == "spark" else "//"
    hexv = (
        lambda j: f"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS {strtype})), {j}, 1)) - 1)"
    )
    h16 = f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"
    return f"""
WITH assigned AS (
  SELECT 'hash' AS layout, CAST({h16} % {_ZM_FILES} AS INT) AS file_id,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
  UNION ALL
  SELECT 'bychars' AS layout, CAST(n_chars {div} {_ZM_WIDTH} AS INT) AS file_id,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents),
zones AS (
  SELECT layout, file_id, min(n_chars) AS zmin, max(n_chars) AS zmax,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM assigned GROUP BY layout, file_id),
graded AS (
  SELECT layout,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(CASE WHEN zmax >= {_ZM_LO} AND zmin <= {_ZM_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         CAST(sum(n_rows) AS BIGINT) AS rows_total,
         CAST(sum(CASE WHEN zmax >= {_ZM_LO} AND zmin <= {_ZM_HI}
                       THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
  FROM zones GROUP BY layout)
SELECT layout, n_files, files_scanned, rows_total, rows_scanned,
       ((2000000 * (n_files - files_scanned) + n_files) {div} (2 * n_files))
         / CAST(1000000.0 AS DOUBLE) AS prune_fraction
FROM graded
"""


def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping audit of two physical layouts under a range
    predicate: how many synthetic files (and rows) a min/max zone map
    lets the scanner skip when the data is hash-scattered vs
    value-clustered on the predicate column.  The report that turns
    "we should sort by n_chars" into a measured prune fraction before
    anyone rewrites 100 TB — the measurement twin of
    ``zorder_cluster`` (which produces such layouts) and
    ``compaction_plan`` (which sizes their files).

    Scale: one map-side layout assignment (the UNION ALL is two
    column-pruned passes over the same scan), ONE partial-aggregated
    groupBy(layout, file_id) to ≤ #files zone rows, then a 2-row
    rollup.  Exact integers everywhere; the prune fraction is the
    half-up micro-division.
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_zone_map_sql("spark"))


ORACLE_ZONE_MAP_PRUNE = _zone_map_sql("duck")


RANKSTATS_QUERIES = {
    "mrr_eval": q_mrr_eval,
    "spearman_corr": q_spearman_corr,
    "kendall_tau": q_kendall_tau,
    "readability_score": q_readability_score,
    "zone_map_prune": q_zone_map_prune,
}

RANKSTATS_ORACLES = {
    "mrr_eval": ORACLE_MRR_EVAL,
    "spearman_corr": ORACLE_SPEARMAN_CORR,
    "kendall_tau": ORACLE_KENDALL_TAU,
    "readability_score": ORACLE_READABILITY_SCORE,
    "zone_map_prune": ORACLE_ZONE_MAP_PRUNE,
}

_q.QUERIES.update(RANKSTATS_QUERIES)
_q.ORACLES.update(RANKSTATS_ORACLES)
