"""Pair-fidelity & corpus-profile catalog, round 4 (wave 31): five
operators spanning the dedup-verification, vector-clustering, and
token-profile surfaces —

* ``pair_edit_similarity`` — exact Levenshtein distance + normalized
  similarity for the VERIFIED near-dup pairs: the character-level
  ground truth behind the shingle-Jaccard verdict ("are these docs
  edit-variants or merely vocabulary twins?").  Both engines run their
  native dynamic-programming ``levenshtein`` over identically
  ASCII-projected, length-capped text, so the O(len²) kernel is
  bounded and byte-vs-char semantics can never diverge.
* ``silhouette_score`` — per-cluster simplified silhouette of the IVF
  coarse-quantizer assignment: a(v) = distance to the assigned
  (nearest) centroid, b(v) = distance to the nearest OTHER centroid,
  s = (b − a) / max(a, b) ∈ [0, 1] (a is the global min, so b ≥ a).
  The "is K big enough / are the inverted lists separated?" audit run
  before the IVF index (``ann_ivf_search``) is trusted.
* ``tokenizer_fertility`` — per-language fertility (regex subword
  tokens per whitespace word) and bytes-per-token: the tokenizer-cost
  profile that decides per-language sampling budgets before a
  training run.
* ``oov_rate`` — per-source out-of-vocabulary token rate against the
  corpus top-V word vocabulary: the "will this source shred into
  UNKs?" screen next to ``vocab_overlap``'s pairwise view.
* ``source_minhash_sim`` — source×source Jaccard similarity matrix
  estimated from per-SOURCE MinHash signatures (min over every
  shingle in the source, per seed): the corpus-level provenance
  overlap report, computable in one aggregation pass without any
  doc-level pair join — the sketch-union trick that works at any
  corpus size because the signature state is K hashes per source.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_fidelity_wave.py.

Cross-engine float policy: edit similarity / fertility / OOV rate /
minhash estimate are half-up integer micro-unit divisions of exact
BIGINT counts ((2·10⁶·num + den) DIV (2·den)); silhouette quantizes
each squared element difference to a nano-unit BIGINT FIRST (the
``embedding_norm_audit`` doctrine) so a/b are sqrt of deterministic
integers and only the final single-expression ratio is float.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the dedup-verify family
(``dedup_minhash_verify`` queries.py — pair set reused verbatim), the
IVF family (``ann_ivf_assign`` queries.py:1288 — same centroid
contract and argmin tie order), and the token-profile family
(``token_count`` queries.py:2233 — same regex pre-tokenizer).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import (
    _IVF_K,
    ORACLE_DEDUP_MINHASH_VERIFY,
    _t,
    q_dedup_minhash_verify,
)

# Edit-distance text cap: the DP kernel is O(cap²) per pair — bounded
# compute per verified pair regardless of document length.  512 chars
# of ASCII-projected prefix is the similarity-relevant window (near-dup
# edit variants diverge early or not at all).
_PES_CAP = 512
# Per-source MinHash signature width: 32 seeds → est. Jaccard
# granularity 1/32, plenty for a provenance-overlap report.
_SRC_MH_SEEDS = 32
# OOV vocabulary size: corpus top-V word types (count desc, word asc).
_OOV_VOCAB = 1000


# ---------------------------------------------------------------------------
# pair_edit_similarity
# ---------------------------------------------------------------------------


def q_pair_edit_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance + half-up micro-unit similarity
    1 − lev/max(len) for every verified near-dup pair.

    Both engines ASCII-project the text first (strip every byte
    outside 0x20–0x7e): Spark's ``levenshtein`` counts CHARACTER
    edits, DuckDB's counts BYTE edits — identical only when char ==
    byte, which the projection guarantees (and the fixtures are ASCII
    anyway).  The prefix cap bounds the O(len²) DP per pair.

    Scale: verified pairs are a vanishing fraction of a 100 TB corpus
    (the ``dedup_minhash_verify`` invariant); two equi-joins fetch the
    capped texts and the DP kernel is map-side, O(cap²) per pair.
    """
    pairs = q_dedup_minhash_verify(spark, sf_dir).select("doc_a", "doc_b")
    t = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.substring(
            F.regexp_replace(
                F.coalesce(F.col("text"), F.lit("")), r"[^\x20-\x7e]", ""
            ),
            1,
            _PES_CAP,
        ).alias("s"),
    )
    j = (
        pairs.join(
            t.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")),
            "doc_a",
        )
        .join(
            t.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("sa", "sb").cast("bigint").alias("lev_dist"),
            F.greatest(F.length("sa"), F.length("sb"))
            .cast("bigint")
            .alias("max_len"),
        )
    )
    return j.select(
        "doc_a",
        "doc_b",
        "lev_dist",
        "max_len",
        F.when(
            F.col("max_len") > 0,
            F.expr(
                "(2 * 1000000 * (max_len - lev_dist) + max_len) DIV (2 * max_len)"
            ),
        )
        .otherwise(F.lit(1000000))
        .cast("bigint")
        .alias("sim_micro"),
    )


ORACLE_PAIR_EDIT_SIMILARITY = f"""
WITH verified AS ({ORACLE_DEDUP_MINHASH_VERIFY}),
t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         substr(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7e]', '', 'g'),
                1, {_PES_CAP}) AS s
  FROM documents),
j AS (
  SELECT v.doc_a, v.doc_b,
         CAST(levenshtein(a.s, b.s) AS BIGINT) AS lev_dist,
         CAST(greatest(length(a.s), length(b.s)) AS BIGINT) AS max_len
  FROM (SELECT doc_a, doc_b FROM verified) v
  JOIN t a ON a.doc_id = v.doc_a
  JOIN t b ON b.doc_id = v.doc_b)
SELECT doc_a, doc_b, lev_dist, max_len,
       CAST(CASE WHEN max_len > 0
            THEN (2 * 1000000 * (max_len - lev_dist) + max_len) // (2 * max_len)
            ELSE 1000000 END AS BIGINT) AS sim_micro
FROM j
"""


# ---------------------------------------------------------------------------
# silhouette_score
# ---------------------------------------------------------------------------


def q_silhouette_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette of the IVF assignment.

    Distance doctrine: each element's squared difference is quantized
    to a nano-unit BIGINT (floor(d²·10⁹ + 0.5) — HALF_UP) BEFORE the
    per-vector reduction, so d²(v, c) is an exact integer on both
    engines; a = sqrt(min), b = sqrt(second-min) are then sqrts of
    deterministic integers and s = (b − a)/max(a, b) is a fixed
    three-op float expression — identical IEEE on numpy and DuckDB —
    rounded half-up to micro-units.  Ties break to the lowest centroid
    id (numpy argmin takes the first minimum over cid-ordered columns;
    the oracle orders by (d2q, centroid_id)).

    Scale: the K centroids ride the ``mapInPandas`` closure (O(K·dim));
    the (n, K) distance matrix is one vectorized broadcast-subtract per
    Arrow batch INSIDE the scan stage (the ``_ivf_assignment`` dense-
    math doctrine — no crossJoin row expansion, no per-vector window);
    the only shuffle is the K-row partial-agg rollup.
    """
    cents = sorted(
        (int(r["vec_id"]), [float(v) for v in r["emb"]])
        for r in _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _IVF_K)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .collect()
    )
    cids = np.array([c for c, _ in cents], dtype="int64")
    cmat = np.array([v for _, v in cents], dtype="float64")
    k = len(cents)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or k == 0:
                continue
            m = np.array(pdf["emb"].tolist(), dtype="float64")
            diff = m[:, None, :] - cmat[None, :, :]
            d2q = np.floor(diff * diff * 1e9 + 0.5).astype("int64").sum(axis=2)
            order = np.argsort(d2q, axis=1, kind="stable")
            aq = d2q[np.arange(len(m)), order[:, 0]]
            assigned = cids[order[:, 0]]
            if k == 1:
                s_micro = np.zeros(len(m), dtype="int64")
            else:
                bq = d2q[np.arange(len(m)), order[:, 1]]
                a = np.sqrt(aq.astype("float64"))
                b = np.sqrt(bq.astype("float64"))
                denom = np.maximum(a, b)
                s = np.where(denom > 0, (b - a) / np.where(denom > 0, denom, 1.0), 0.0)
                s_micro = np.floor(s * 1e6 + 0.5).astype("int64")
            yield pd.DataFrame({"centroid_id": assigned, "s_micro": s_micro})

    pts = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(score, "centroid_id long, s_micro long")
    )
    return (
        pts.groupBy("centroid_id")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("s_micro").cast("bigint").alias("sum_s"),
            F.min("s_micro").alias("min_s_micro"),
            F.max("s_micro").alias("max_s_micro"),
        )
        .select(
            "centroid_id",
            "n_vecs",
            F.round(F.col("sum_s").cast("double") / F.col("n_vecs"), 0)
            .cast("bigint")
            .alias("mean_s_micro"),
            "min_s_micro",
            "max_s_micro",
        )
    )


ORACLE_SILHOUETTE_SCORE = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < {_IVF_K}),
el AS (
  SELECT e.vec_id, c.centroid_id,
         (SELECT CAST(sum(CAST(floor((a - b) * (a - b) * 1e9 + 0.5) AS BIGINT))
                 AS BIGINT)
          FROM (SELECT unnest(CAST(e.embedding AS DOUBLE[])) a,
                       unnest(c.cvec) b)) AS d2q
  FROM embeddings e CROSS JOIN cents c),
rk AS (
  SELECT vec_id, centroid_id, d2q,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2q, centroid_id) AS rn
  FROM el),
asg AS (SELECT vec_id, centroid_id, d2q AS aq FROM rk WHERE rn = 1),
oth AS (
  SELECT r.vec_id, min(r.d2q) AS bq
  FROM rk r JOIN asg g ON r.vec_id = g.vec_id AND r.centroid_id <> g.centroid_id
  GROUP BY r.vec_id),
s AS (
  SELECT g.centroid_id,
         CASE WHEN o.bq IS NULL THEN CAST(0 AS BIGINT)
              WHEN greatest(sqrt(CAST(g.aq AS DOUBLE)), sqrt(CAST(o.bq AS DOUBLE))) > 0
              THEN CAST(floor((sqrt(CAST(o.bq AS DOUBLE)) - sqrt(CAST(g.aq AS DOUBLE)))
                        / greatest(sqrt(CAST(g.aq AS DOUBLE)), sqrt(CAST(o.bq AS DOUBLE)))
                        * 1e6 + 0.5) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS s_micro
  FROM asg g LEFT JOIN oth o ON o.vec_id = g.vec_id)
SELECT centroid_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(round(CAST(sum(s_micro) AS DOUBLE) / count(*), 0) AS BIGINT)
         AS mean_s_micro,
       min(s_micro) AS min_s_micro,
       max(s_micro) AS max_s_micro
FROM s
GROUP BY centroid_id
"""


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer-cost profile: whitespace words, regex
    subword tokens (the ``token_count`` GPT-2-style pre-tokenizer
    ``\\w+|[^\\w\\s]``), raw bytes, and two half-up micro-unit ratios —
    fertility (tokens/word) and bytes/token.

    Scale: map-side string ops + ONE partial-aggregated groupBy(lang);
    the lang key space is tiny so the shuffle is K rows per partition.
    """
    d = _t(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    g = (
        d.select(
            F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
            F.size(F.split(txt, " ")).cast("bigint").alias("w"),
            F.size(
                F.expr(r"regexp_extract_all(coalesce(text, ''), '\\w+|[^\\w\\s]', 0)")
            )
            .cast("bigint")
            .alias("r"),
            F.octet_length(txt).cast("bigint").alias("b"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("r").alias("n_regex_tokens"),
            F.sum("b").alias("n_bytes"),
        )
    )
    return g.select(
        "lang",
        "n_docs",
        "n_words",
        "n_regex_tokens",
        "n_bytes",
        F.expr(
            "(2 * 1000000 * n_regex_tokens + n_words) DIV (2 * n_words)"
        )
        .cast("bigint")
        .alias("fertility_micro"),
        F.when(
            F.col("n_regex_tokens") > 0,
            F.expr(
                "(2 * 1000000 * n_bytes + n_regex_tokens) DIV (2 * n_regex_tokens)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("bytes_per_tok_micro"),
    )


ORACLE_TOKENIZER_FERTILITY = r"""
WITH per AS (
  SELECT coalesce(lang, '') AS lang,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(coalesce(text, ''), '\w+|[^\w\s]', 0)) AS BIGINT) AS r,
         CAST(strlen(coalesce(text, '')) AS BIGINT) AS b
  FROM documents),
g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS n_words,
         CAST(sum(r) AS BIGINT) AS n_regex_tokens,
         CAST(sum(b) AS BIGINT) AS n_bytes
  FROM per GROUP BY lang)
SELECT lang, n_docs, n_words, n_regex_tokens, n_bytes,
       CAST((2 * 1000000 * n_regex_tokens + n_words) // (2 * n_words) AS BIGINT)
         AS fertility_micro,
       CAST(CASE WHEN n_regex_tokens > 0
            THEN (2 * 1000000 * n_bytes + n_regex_tokens) // (2 * n_regex_tokens)
            ELSE 0 END AS BIGINT) AS bytes_per_tok_micro
FROM g
"""


# ---------------------------------------------------------------------------
# oov_rate
# ---------------------------------------------------------------------------


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary token rate against the corpus
    top-{V} word vocabulary (count desc, word asc — the boundary tie
    is deterministic).

    Scale: vocabulary selection is a distributed TopK
    (TakeOrderedAndProject — never a single-partition global sort);
    the V-row vocab is then BROADCAST into the token-instance scan, so
    the per-source rollup is one partial-aggregated groupBy.  Two
    passes over the token instances (df count + membership probe) —
    the same trade ``tfidf_topk`` documents.
    """
    d = _t(spark, sf_dir, "documents")
    inst = d.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    vocab = (
        inst.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(_OOV_VOCAB)
        .select("tok", F.lit(1).alias("in_v"))
    )
    j = inst.join(F.broadcast(vocab), "tok", "left")
    g = j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
    )
    return g.select(
        "source",
        "n_tokens",
        "n_oov",
        F.expr("(2 * 1000000 * n_oov + n_tokens) DIV (2 * n_tokens)")
        .cast("bigint")
        .alias("oov_micro"),
    )


ORACLE_OOV_RATE = f"""
WITH inst AS (
  SELECT coalesce(source, '') AS source, tok
  FROM (SELECT source, unnest(string_split(coalesce(text, ''), ' ')) AS tok
        FROM documents)
  WHERE tok <> ''),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS n FROM inst GROUP BY tok
    ORDER BY n DESC, tok ASC LIMIT {_OOV_VOCAB})),
g AS (
  SELECT i.source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM inst i LEFT JOIN vocab v ON v.tok = i.tok
  GROUP BY i.source)
SELECT source, n_tokens, n_oov,
       CAST((2 * 1000000 * n_oov + n_tokens) // (2 * n_tokens) AS BIGINT)
         AS oov_micro
FROM g
"""


# ---------------------------------------------------------------------------
# source_minhash_sim
# ---------------------------------------------------------------------------


def _src_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, sh) 3-word shingle stream with the SOURCE key inline — no
    doc join, no distinct: min() ignores multiplicity, so the signature
    aggregation consumes the raw explode stream zero-shuffle."""
    # _spread BEFORE the split/explode/md5 pyramid: the K-seed md5 over
    # every shingle occurrence is the most CPU-heavy map stage in the
    # catalog, and it inherits the scan's split count (1 task on the
    # single-row-group fixture).  Narrow projection first so only
    # (source, text) crosses the conditional exchange; at scale the
    # helper is a no-op (guide §2.5).
    d = _q._spread(
        _t(spark, sf_dir, "documents").select("source", "text")
    )
    toks = d.select(
        F.coalesce(F.col("source"), F.lit("")).alias("src"),
        F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("l"),
    )
    return toks.select(
        "src",
        F.explode(
            F.when(
                F.size("l") >= 3, F.sequence(F.lit(1), F.size("l") - 2)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        "l",
    ).select(
        "src",
        F.concat_ws(
            " ",
            F.element_at("l", F.col("i")),
            F.element_at("l", F.col("i") + 1),
            F.element_at("l", F.col("i") + 2),
        ).alias("sh"),
    )


def q_source_minhash_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source×source Jaccard estimate from per-source MinHash
    signatures: for each of {K} seeds, the signature component is the
    min of md5(seed ':' shingle) over EVERY shingle any document of
    the source contains (the mergeable sketch-union property — a
    source's signature is the element-wise min of its docs'
    signatures); the pairwise estimate is the matching-seed fraction.

    Scale: one partial-aggregated groupBy(source) computes all {K}
    mins in a single pass (the ``_minhash_bands`` doctrine — never a
    seed crossJoin); the pair join is over the SOURCE table, whose
    cardinality is bounded (hundreds at web scale), so the
    BroadcastNestedLoopJoin on src < src is O(S²) over S rows — not a
    data-sized product.
    """
    sh = _src_shingles(spark, sf_dir)
    sig = sh.groupBy("src").agg(
        *[
            F.min(F.md5(F.concat_ws(":", F.lit(k), F.col("sh")))).alias(f"m{k}")
            for k in range(_SRC_MH_SEEDS)
        ]
    )
    a = sig.alias("a")
    b = sig.alias("b")
    matches = sum(
        F.when(F.col(f"a.m{k}") == F.col(f"b.m{k}"), 1).otherwise(0)
        for k in range(_SRC_MH_SEEDS)
    )
    return (
        a.join(b, F.col("a.src") < F.col("b.src"))
        .select(
            F.col("a.src").alias("src_a"),
            F.col("b.src").alias("src_b"),
            matches.cast("bigint").alias("n_match"),
        )
        .select(
            "src_a",
            "src_b",
            "n_match",
            F.expr(
                f"(2 * 1000000 * n_match + {_SRC_MH_SEEDS}) DIV (2 * {_SRC_MH_SEEDS})"
            )
            .cast("bigint")
            .alias("est_jaccard_micro"),
        )
    )


def _src_minhash_sql() -> str:
    mins = ",\n         ".join(
        f"min(md5('{k}:' || sh)) AS m{k}" for k in range(_SRC_MH_SEEDS)
    )
    match_expr = " + ".join(
        f"(CASE WHEN a.m{k} = b.m{k} THEN 1 ELSE 0 END)"
        for k in range(_SRC_MH_SEEDS)
    )
    return f"""
WITH toks AS (
  SELECT coalesce(source, '') AS src,
         string_split(coalesce(text, ''), ' ') AS l
  FROM documents),
sh AS (
  SELECT src,
         list_extract(l, i) || ' ' || list_extract(l, i+1) || ' ' || list_extract(l, i+2) AS sh
  FROM (SELECT src, l, unnest(generate_series(1, len(l) - 2)) AS i
        FROM toks WHERE len(l) >= 3)),
sig AS (
  SELECT src,
         {mins}
  FROM sh GROUP BY src)
SELECT a.src AS src_a, b.src AS src_b,
       CAST({match_expr} AS BIGINT) AS n_match,
       CAST((2 * 1000000 * ({match_expr}) + {_SRC_MH_SEEDS})
            // (2 * {_SRC_MH_SEEDS}) AS BIGINT) AS est_jaccard_micro
FROM sig a JOIN sig b ON a.src < b.src
"""


ORACLE_SOURCE_MINHASH_SIM = _src_minhash_sql()


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

FIDELITY_QUERIES = {
    "pair_edit_similarity": q_pair_edit_similarity,
    "silhouette_score": q_silhouette_score,
    "tokenizer_fertility": q_tokenizer_fertility,
    "oov_rate": q_oov_rate,
    "source_minhash_sim": q_source_minhash_sim,
}

FIDELITY_ORACLES = {
    "pair_edit_similarity": ORACLE_PAIR_EDIT_SIMILARITY,
    "silhouette_score": ORACLE_SILHOUETTE_SCORE,
    "tokenizer_fertility": ORACLE_TOKENIZER_FERTILITY,
    "oov_rate": ORACLE_OOV_RATE,
    "source_minhash_sim": ORACLE_SOURCE_MINHASH_SIM,
}

_q.QUERIES.update(FIDELITY_QUERIES)
_q.ORACLES.update(FIDELITY_ORACLES)
