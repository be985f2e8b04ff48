"""Generation-evaluation & selection catalog, round 4 (wave 49):
five operators spanning the MT-metric, character-metric, diversity-
audit, calibration-scalar, and bandit-selection surfaces —

* ``bleu_pairs`` — corpus BLEU-2 per verified near-dup pair (doc_a =
  reference, doc_b = candidate): clipped multiset n-gram precisions
  p₁/p₂ are exact integer ratios, the brevity penalty and geometric
  mean are one row-local expression per pair.  The precision twin of
  ``pair_ngram_recall``'s ROUGE.
* ``chrf_pairs`` — chrF (character 3-gram F_{β=2}) per verified
  pair, computed on space-stripped text: char-trigram multisets are
  built map-side, overlap is the standard min-count sum, and
  P/R/chrF are row-local.  Catches morphological closeness the
  word-level metrics miss.
* ``self_bleu_lite`` — per-source diversity audit: the share of each
  doc's DISTINCT bigrams that also appear in ≥ 2 docs of the source
  (type-level Self-BLEU-2, documented simplification — no per-pair
  references).  High = templated/homogeneous source.  The
  generation-diversity companion to ``ngram_diversity`` (which
  counts types, not cross-doc reuse).
* ``ece_score`` — expected calibration error of the length-bucket
  en-rate classifier under an even/odd doc_id split (train on even,
  score odd): confidence = max(p̂, 1−p̂), 10 equal-width confidence
  bins, ECE = Σ (n_b/N)·|acc_b − conf̄_b| with per-bin terms from
  exact integer sums.  The scalar companion to
  ``calibration_curve`` / ``isotonic_calibration``.
* ``ucb_arm_ranking`` — UCB1 scores treating each source as a bandit
  arm (pulls = docs, reward = en rate): score = r̄ + √(2·ln N / n_s),
  ranked.  The online data-mixing selector — which source to sample
  next when exploration still matters.  Companion to
  ``domain_mix_weights`` (the offline allocation).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_evalmetrics_wave.py.

Cross-engine float policy (the corr_matrix / zipf_fit doctrine):
all gram/bin counts are exact BIGINTs; per-doc diversity shares and
per-bin calibration terms micro-quantize before their cross-row
sums; BLEU/chrF/UCB finals are row-local IEEE on exact integers.

Scale notes: pair metrics broadcast the (vanishing) verified pair
set and join gram tables on (doc, n, gram) — candidate-bounded,
never all-pairs; ``self_bleu_lite`` joins the doc-bigram type table
against the source-level ≥2-doc type table (both partial-agg
outputs); ``ece_score`` is two half-corpus aggs + a 10-row bin
frame; ``ucb_arm_ranking`` ranks a #sources frame.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ECE confidence bins.
_ECE_BINS = 10

# ece length-bucket width (the cochran grid).
_ECE_W = 100
_ECE_K = 6

_TOKARR = "filter(split(coalesce(text, ''), ' '), x -> x <> '')"
_TOKARR_DUCK = (
    "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"
)


def _grams12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n, gram, cnt) for n = 1, 2 over empty-filtered tokens."""
    base = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr(_TOKARR).alias("arr"),
    )
    uni = base.select(
        "doc_id", F.lit(1).alias("n"), F.explode("arr").alias("gram")
    )
    bi = base.where(F.expr("size(arr) >= 2")).select(
        "doc_id",
        F.lit(2).alias("n"),
        F.explode(
            F.expr(
                """
                transform(sequence(1, size(arr) - 1),
                  i -> concat(element_at(arr, i), ' ',
                              element_at(arr, i + 1)))
                """
            )
        ).alias("gram"),
    )
    return (
        uni.unionByName(bi)
        .groupBy("doc_id", "n", "gram")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


_GRAMS12_DUCK = f"""
  SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, 1 AS n,
           unnest({_TOKARR_DUCK}) AS gram
    FROM documents
    UNION ALL
    SELECT CAST(doc_id AS BIGINT) AS doc_id, 2 AS n,
           unnest(list_transform(range(1, len(arr)),
                  i -> arr[i] || ' ' || arr[i + 1])) AS gram
    FROM (SELECT doc_id, {_TOKARR_DUCK} AS arr FROM documents)
    WHERE len(arr) >= 2)
  GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# bleu_pairs — clipped-precision BLEU-2 per verified near-dup pair
# ---------------------------------------------------------------------------


def q_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 with brevity penalty, doc_a = reference, doc_b =
    candidate: p_n = Σ min(c_cand, c_ref)/Σ c_cand (exact integers),
    BP = min(1, e^(1 − ref_len/cand_len)),
    BLEU = BP·√(p₁·p₂); degenerate precisions yield 0.0.

    Scale: gram partial agg + pair-broadcast overlap equi-join —
    candidate-bounded, never all-pairs.
    """
    pairs = _q.q_dedup_minhash_verify(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    # persisted: four branches (tot, cand, ref, and the length joins
    # through tot) read the gram counts — unpersisted each re-ran the
    # 1+2-gram explode + groupBy
    grams = _q._persist_tracked(_grams12(spark, sf_dir))
    tot = _q._persist_tracked(grams.groupBy("doc_id", "n").agg(
        F.sum("cnt").cast("bigint").alias("tot")
    ))
    cand = grams.join(
        F.broadcast(pairs), grams.doc_id == pairs.doc_b
    ).select("doc_a", "doc_b", "n", "gram", F.col("cnt").alias("cb"))
    ref = grams.select(
        F.col("doc_id").alias("ra"),
        F.col("n").alias("rn"),
        F.col("gram").alias("rg"),
        F.col("cnt").alias("ca"),
    )
    ov = (
        cand.join(
            ref,
            (cand.doc_a == ref.ra)
            & (cand.n == ref.rn)
            & (cand.gram == ref.rg),
        )
        .groupBy("doc_a", "doc_b", "n")
        .agg(F.sum(F.expr("least(ca, cb)")).cast("bigint").alias("clip"))
    )
    base = (
        pairs.select("doc_a", "doc_b")
        .withColumn("n", F.explode(F.array(F.lit(1), F.lit(2))))
        .join(ov, ["doc_a", "doc_b", "n"], "left")
        .join(
            tot.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n"),
                F.col("tot").alias("cand_tot"),
            ),
            ["doc_b", "n"],
            "left",
        )
        .join(
            tot.where(F.col("n") == 1).select(
                F.col("doc_id").alias("doc_a"),
                F.col("tot").alias("ref_len"),
            ),
            "doc_a",
            "left",
        )
        .join(
            tot.where(F.col("n") == 1).select(
                F.col("doc_id").alias("doc_b"),
                F.col("tot").alias("cand_len"),
            ),
            "doc_b",
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            "n",
            F.coalesce("clip", F.lit(0)).cast("bigint").alias("clip"),
            F.coalesce("cand_tot", F.lit(0)).cast("bigint").alias("ct"),
            F.coalesce("ref_len", F.lit(0)).cast("bigint").alias("rl"),
            F.coalesce("cand_len", F.lit(0)).cast("bigint").alias("cl"),
        )
    )
    per = base.groupBy("doc_a", "doc_b").agg(
        F.max(F.expr("CASE WHEN n = 1 THEN clip END"))
        .cast("bigint")
        .alias("c1"),
        F.max(F.expr("CASE WHEN n = 1 THEN ct END"))
        .cast("bigint")
        .alias("t1"),
        F.max(F.expr("CASE WHEN n = 2 THEN clip END"))
        .cast("bigint")
        .alias("c2"),
        F.max(F.expr("CASE WHEN n = 2 THEN ct END"))
        .cast("bigint")
        .alias("t2"),
        F.max("rl").cast("bigint").alias("rl"),
        F.max("cl").cast("bigint").alias("cl"),
    )
    return per.select(
        "doc_a",
        "doc_b",
        F.expr(
            """
            CASE WHEN t1 = 0 THEN 0.0 ELSE
              (2000000 * c1 + t1) DIV (2 * t1) / 1e6 END
            """
        ).alias("p1"),
        F.expr(
            """
            CASE WHEN t2 = 0 THEN 0.0 ELSE
              (2000000 * c2 + t2) DIV (2 * t2) / 1e6 END
            """
        ).alias("p2"),
        F.expr(
            """
            CASE WHEN cl = 0 THEN 0.0 ELSE
              CAST(floor(least(1.0,
                exp(1.0 - CAST(rl AS DOUBLE) / cl)) * 1e6 + 0.5)
                AS BIGINT) / 1e6
            END
            """
        ).alias("bp"),
        F.expr(
            """
            CASE WHEN t1 = 0 OR t2 = 0 OR c1 = 0 OR c2 = 0 OR cl = 0
              THEN 0.0 ELSE
              CAST(floor(least(1.0, exp(1.0 - CAST(rl AS DOUBLE) / cl))
                * sqrt((CAST(c1 AS DOUBLE) / t1)
                       * (CAST(c2 AS DOUBLE) / t2)) * 1e6 + 0.5)
                AS BIGINT) / 1e6
            END
            """
        ).alias("bleu2"),
    ).orderBy("doc_a", "doc_b")


ORACLE_BLEU_PAIRS = f"""
WITH pairs AS ({{verify}}),
grams AS ({_GRAMS12_DUCK}),
tot AS (
  SELECT doc_id, n, CAST(sum(cnt) AS BIGINT) AS tot
  FROM grams GROUP BY 1, 2),
ov AS (
  SELECT p.doc_a, p.doc_b, g.n,
         CAST(sum(least(r.cnt, g.cnt)) AS BIGINT) AS clip
  FROM pairs p
  JOIN grams g ON g.doc_id = p.doc_b
  JOIN grams r ON r.doc_id = p.doc_a AND r.n = g.n AND r.gram = g.gram
  GROUP BY 1, 2, 3),
base AS (
  SELECT p.doc_a, p.doc_b, nn.n,
         CAST(coalesce(ov.clip, 0) AS BIGINT) AS clip,
         CAST(coalesce(ct.tot, 0) AS BIGINT) AS ct,
         CAST(coalesce(rl.tot, 0) AS BIGINT) AS rl,
         CAST(coalesce(cl.tot, 0) AS BIGINT) AS cl
  FROM pairs p
  CROSS JOIN (SELECT unnest([1, 2]) AS n) nn
  LEFT JOIN ov ON ov.doc_a = p.doc_a AND ov.doc_b = p.doc_b
              AND ov.n = nn.n
  LEFT JOIN tot ct ON ct.doc_id = p.doc_b AND ct.n = nn.n
  LEFT JOIN tot rl ON rl.doc_id = p.doc_a AND rl.n = 1
  LEFT JOIN tot cl ON cl.doc_id = p.doc_b AND cl.n = 1),
per AS (
  SELECT doc_a, doc_b,
         CAST(max(CASE WHEN n = 1 THEN clip END) AS BIGINT) AS c1,
         CAST(max(CASE WHEN n = 1 THEN ct END) AS BIGINT) AS t1,
         CAST(max(CASE WHEN n = 2 THEN clip END) AS BIGINT) AS c2,
         CAST(max(CASE WHEN n = 2 THEN ct END) AS BIGINT) AS t2,
         CAST(max(rl) AS BIGINT) AS rl,
         CAST(max(cl) AS BIGINT) AS cl
  FROM base GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CASE WHEN t1 = 0 THEN 0.0 ELSE
         (2000000 * c1 + t1) // (2 * t1) / 1e6 END AS p1,
       CASE WHEN t2 = 0 THEN 0.0 ELSE
         (2000000 * c2 + t2) // (2 * t2) / 1e6 END AS p2,
       CASE WHEN cl = 0 THEN 0.0 ELSE
         CAST(floor(least(1.0, exp(1.0 - CAST(rl AS DOUBLE) / cl))
           * 1e6 + 0.5) AS BIGINT) / 1e6
       END AS bp,
       CASE WHEN t1 = 0 OR t2 = 0 OR c1 = 0 OR c2 = 0 OR cl = 0
         THEN 0.0 ELSE
         CAST(floor(least(1.0, exp(1.0 - CAST(rl AS DOUBLE) / cl))
           * sqrt((CAST(c1 AS DOUBLE) / t1)
                  * (CAST(c2 AS DOUBLE) / t2)) * 1e6 + 0.5)
           AS BIGINT) / 1e6
       END AS bleu2
FROM per ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# chrf_pairs — char-3-gram F_{beta=2} per verified pair
# ---------------------------------------------------------------------------


def q_chrf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF (char 3-grams, β = 2) on space-stripped text per verified
    pair: P = overlap/cand, R = overlap/ref (exact integers),
    chrF = 5PR/(4P + R), zero-guarded.

    Scale: map-side char-trigram multisets, pair-broadcast overlap
    equi-join on (doc, gram).
    """
    # _spread before the char-trigram explode (the heaviest map stage
    # here; no-op at scale — guide §2.5); persisted because three
    # branches (tot, cand, ref) read the trigram counts and unpersisted
    # each re-ran the explode + groupBy
    tri = _q._persist_tracked(
        _q._spread(
            _t(spark, sf_dir, "documents")
            .select(
                F.col("doc_id").cast("bigint").alias("doc_id"),
                F.expr("replace(coalesce(text, ''), ' ', '')").alias("s"),
            )
            .where(F.expr("length(s) >= 3"))
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(s) - 2),"
                    " i -> substring(s, i, 3))"
                )
            ).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    pairs = _q.q_dedup_minhash_verify(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    tot = tri.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("tot")
    )
    cand = tri.join(
        F.broadcast(pairs), tri.doc_id == pairs.doc_b
    ).select("doc_a", "doc_b", "gram", F.col("cnt").alias("cb"))
    ref = tri.select(
        F.col("doc_id").alias("ra"),
        F.col("gram").alias("rg"),
        F.col("cnt").alias("ca"),
    )
    ov = (
        cand.join(ref, (cand.doc_a == ref.ra) & (cand.gram == ref.rg))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.expr("least(ca, cb)")).cast("bigint").alias("clip"))
    )
    per = (
        pairs.join(ov, ["doc_a", "doc_b"], "left")
        .join(
            tot.select(
                F.col("doc_id").alias("doc_a"),
                F.col("tot").alias("ref_tot"),
            ),
            "doc_a",
            "left",
        )
        .join(
            tot.select(
                F.col("doc_id").alias("doc_b"),
                F.col("tot").alias("cand_tot"),
            ),
            "doc_b",
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("clip", F.lit(0)).cast("bigint").alias("clip"),
            F.coalesce("ref_tot", F.lit(0)).cast("bigint").alias("rt"),
            F.coalesce("cand_tot", F.lit(0)).cast("bigint").alias("ct"),
        )
    )
    return per.select(
        "doc_a",
        "doc_b",
        F.expr(
            """
            CASE WHEN ct = 0 THEN 0.0 ELSE
              (2000000 * clip + ct) DIV (2 * ct) / 1e6 END
            """
        ).alias("precision"),
        F.expr(
            """
            CASE WHEN rt = 0 THEN 0.0 ELSE
              (2000000 * clip + rt) DIV (2 * rt) / 1e6 END
            """
        ).alias("recall"),
        F.expr(
            """
            CASE WHEN clip = 0 OR ct = 0 OR rt = 0 THEN 0.0 ELSE
              CAST(floor(5.0 * (CAST(clip AS DOUBLE) / ct)
                * (CAST(clip AS DOUBLE) / rt)
                / (4.0 * CAST(clip AS DOUBLE) / ct
                   + CAST(clip AS DOUBLE) / rt) * 1e6 + 0.5)
                AS BIGINT) / 1e6
            END
            """
        ).alias("chrf"),
    ).orderBy("doc_a", "doc_b")


ORACLE_CHRF_PAIRS = """
WITH pairs AS ({verify}),
tri AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id,
               unnest(list_transform(range(1, length(s) - 1),
                      i -> substring(s, i, 3))) AS gram
        FROM (SELECT doc_id,
                     replace(coalesce(text, ''), ' ', '') AS s
              FROM documents)
        WHERE length(s) >= 3)
  GROUP BY 1, 2),
tot AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS tot FROM tri GROUP BY 1),
ov AS (
  SELECT p.doc_a, p.doc_b,
         CAST(sum(least(r.cnt, g.cnt)) AS BIGINT) AS clip
  FROM pairs p
  JOIN tri g ON g.doc_id = p.doc_b
  JOIN tri r ON r.doc_id = p.doc_a AND r.gram = g.gram
  GROUP BY 1, 2),
per AS (
  SELECT p.doc_a, p.doc_b,
         CAST(coalesce(ov.clip, 0) AS BIGINT) AS clip,
         CAST(coalesce(rt.tot, 0) AS BIGINT) AS rt,
         CAST(coalesce(ct.tot, 0) AS BIGINT) AS ct
  FROM pairs p
  LEFT JOIN ov ON ov.doc_a = p.doc_a AND ov.doc_b = p.doc_b
  LEFT JOIN tot rt ON rt.doc_id = p.doc_a
  LEFT JOIN tot ct ON ct.doc_id = p.doc_b)
SELECT doc_a, doc_b,
       CASE WHEN ct = 0 THEN 0.0 ELSE
         (2000000 * clip + ct) // (2 * ct) / 1e6 END AS precision,
       CASE WHEN rt = 0 THEN 0.0 ELSE
         (2000000 * clip + rt) // (2 * rt) / 1e6 END AS recall,
       CASE WHEN clip = 0 OR ct = 0 OR rt = 0 THEN 0.0 ELSE
         CAST(floor(5.0 * (CAST(clip AS DOUBLE) / ct)
           * (CAST(clip AS DOUBLE) / rt)
           / (4.0 * CAST(clip AS DOUBLE) / ct
              + CAST(clip AS DOUBLE) / rt) * 1e6 + 0.5) AS BIGINT)
           / 1e6
       END AS chrf
FROM per ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# self_bleu_lite — cross-doc bigram reuse share per source
# ---------------------------------------------------------------------------


def q_self_bleu_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: mean over docs of the share of the doc's DISTINCT
    bigrams that occur in ≥ 2 docs of that source (type-level
    Self-BLEU-2 — the reference set is "the other docs", realized as
    the shared-type table; documented simplification).  Per-doc
    shares micro-quantize before the source mean.

    Scale: one (source, doc, bigram) distinct agg, one source-level
    ≥2-doc type table, one co-partitioned join back — no doc pairs.
    """
    bg = (
        _t(spark, sf_dir, "documents")
        .select(
            F.coalesce("source", F.lit("")).alias("g"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.expr(_TOKARR).alias("arr"),
        )
        .where(F.expr("size(arr) >= 2"))
        .select(
            "g",
            "doc_id",
            F.explode(
                F.expr(
                    """
                    array_distinct(transform(sequence(1, size(arr) - 1),
                      i -> concat(element_at(arr, i), ' ',
                                  element_at(arr, i + 1))))
                    """
                )
            ).alias("bgm"),
        )
    )
    shared = (
        bg.groupBy("g", "bgm")
        .agg(F.count("*").cast("bigint").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("g", "bgm", F.lit(1).alias("sh"))
    )
    per_doc = (
        bg.join(shared, ["g", "bgm"], "left")
        .groupBy("g", "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bg"),
            F.sum(F.coalesce("sh", F.lit(0))).cast("bigint").alias("n_sh"),
        )
        .select(
            "g",
            F.expr("(2000000 * n_sh + n_bg) DIV (2 * n_bg)")
            .cast("bigint")
            .alias("share_u"),
        )
    )
    return (
        per_doc.groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("share_u").cast("bigint").alias("s1"),
            F.min("share_u").cast("bigint").alias("mn"),
            F.max("share_u").cast("bigint").alias("mx"),
        )
        .select(
            F.col("g").alias("source"),
            "n_docs",
            F.expr("(2 * s1 + n_docs) DIV (2 * n_docs) / 1e6").alias(
                "mean_reuse"
            ),
            F.expr("mn / 1e6").alias("min_reuse"),
            F.expr("mx / 1e6").alias("max_reuse"),
        )
        .orderBy("source")
    )


ORACLE_SELF_BLEU_LITE = f"""
WITH bg AS (
  SELECT DISTINCT coalesce(source, '') AS g,
         CAST(doc_id AS BIGINT) AS doc_id,
         unnest(list_transform(range(1, len(arr)),
                i -> arr[i] || ' ' || arr[i + 1])) AS bgm
  FROM (SELECT source, doc_id, {_TOKARR_DUCK} AS arr FROM documents)
  WHERE len(arr) >= 2),
shared AS (
  SELECT g, bgm, 1 AS sh
  FROM bg GROUP BY g, bgm HAVING count(*) >= 2),
per_doc AS (
  SELECT bg.g,
         CAST((2000000 * sum(coalesce(sh, 0)) + count(*))
           // (2 * count(*)) AS BIGINT) AS share_u
  FROM bg LEFT JOIN shared USING (g, bgm)
  GROUP BY bg.g, bg.doc_id)
SELECT g AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       (2 * sum(share_u) + count(*)) // (2 * count(*)) / 1e6
         AS mean_reuse,
       CAST(min(share_u) AS BIGINT) / 1e6 AS min_reuse,
       CAST(max(share_u) AS BIGINT) / 1e6 AS max_reuse
FROM per_doc GROUP BY g ORDER BY source
"""


# ---------------------------------------------------------------------------
# ece_score — expected calibration error under an even/odd split
# ---------------------------------------------------------------------------


def q_ece_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECE of the length-bucket en-rate classifier: rates fit on even
    doc_ids (add-one smoothed), scored on odd doc_ids; confidence =
    max(p̂, 1−p̂), 10 equal-width bins (floor(conf·10) capped at 9),
    ECE = Σ (n_b/N)·|acc_b − conf̄_b|.  Per-row confidences are
    micro-quantized at fit time (rates are rationals of exact
    counts); bin terms are exact-integer derived.

    Scale: two half-corpus partial aggs, one ≤``_ECE_K``-row rate
    broadcast, one 10-row bin frame.
    """
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"least(n_chars DIV {_ECE_W}, {_ECE_K - 1})").alias("b"),
        (F.col("lang") == "en").cast("bigint").alias("y"),
    )
    rates = (
        docs.where(F.expr("doc_id % 2 = 0"))
        .groupBy("b")
        .agg(
            F.count("*").cast("bigint").alias("n_tr"),
            F.sum("y").cast("bigint").alias("e_tr"),
        )
        .select(
            "b",
            F.expr(
                "CAST(floor(CAST(e_tr + 1 AS DOUBLE) / (n_tr + 2) * 1e6"
                " + 0.5) AS BIGINT)"
            ).alias("pq"),
        )
    )
    scored = (
        docs.where(F.expr("doc_id % 2 = 1"))
        .join(F.broadcast(rates), "b")
        .select(
            "y",
            F.expr("greatest(pq, 1000000 - pq)").alias("confq"),
            F.expr("CASE WHEN pq >= 500000 THEN 1 ELSE 0 END").alias(
                "pred"
            ),
        )
        .select(
            F.expr(
                f"least(confq * {_ECE_BINS} DIV 1000000, {_ECE_BINS - 1})"
            ).alias("bin"),
            "confq",
            F.expr("CASE WHEN pred = y THEN 1 ELSE 0 END").alias("ok"),
        )
    )
    bins = scored.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum("confq").cast("bigint").alias("cq"),
        F.sum("ok").cast("bigint").alias("okc"),
    )
    agg = bins.groupBy().agg(
        F.count("*").cast("bigint").alias("n_bins_used"),
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum(
            F.expr(
                """
                CAST(floor(abs(CAST(okc AS DOUBLE) / n_b
                  - CAST(cq AS DOUBLE) / n_b / 1e6) * n_b * 1e6 + 0.5)
                  AS BIGINT)
                """
            )
        )
        .cast("bigint")
        .alias("werr"),
    )
    return agg.select(
        "n",
        "n_bins_used",
        F.expr(
            "CAST(floor(CAST(werr AS DOUBLE) / n + 0.5) AS BIGINT) / 1e6"
        ).alias("ece"),
    )


ORACLE_ECE_SCORE = f"""
WITH docs AS (
  SELECT doc_id, least(n_chars // {_ECE_W}, {_ECE_K - 1}) AS b,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM documents),
rates AS (
  SELECT b,
         CAST(floor(CAST(sum(y) + 1 AS DOUBLE) / (count(*) + 2) * 1e6
           + 0.5) AS BIGINT) AS pq
  FROM docs WHERE doc_id % 2 = 0 GROUP BY b),
scored AS (
  SELECT least(greatest(pq, 1000000 - pq) * {_ECE_BINS} // 1000000,
               {_ECE_BINS - 1}) AS bin,
         greatest(pq, 1000000 - pq) AS confq,
         CASE WHEN (CASE WHEN pq >= 500000 THEN 1 ELSE 0 END) = y
           THEN 1 ELSE 0 END AS ok
  FROM docs JOIN rates USING (b)
  WHERE doc_id % 2 = 1),
bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(confq) AS BIGINT) AS cq,
         CAST(sum(ok) AS BIGINT) AS okc
  FROM scored GROUP BY bin),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bins_used,
         CAST(sum(n_b) AS BIGINT) AS n,
         CAST(sum(CAST(floor(abs(CAST(okc AS DOUBLE) / n_b
             - CAST(cq AS DOUBLE) / n_b / 1e6) * n_b * 1e6 + 0.5)
           AS BIGINT)) AS BIGINT) AS werr
  FROM bins)
SELECT n, n_bins_used,
       CAST(floor(CAST(werr AS DOUBLE) / n + 0.5) AS BIGINT) / 1e6
         AS ece
FROM agg
"""


# ---------------------------------------------------------------------------
# ucb_arm_ranking — UCB1 scores over sources as bandit arms
# ---------------------------------------------------------------------------


def q_ucb_arm_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 per source arm: score = r̄ + √(2·ln N / n_s) on exact
    counts, ranked descending (ties → source asc).  The arm a
    sequential data-mixer samples next.

    Scale: one per-source agg, a 1-row total broadcast, one rank
    window over the #sources frame.
    """
    per = (
        _t(spark, sf_dir, "documents")
        .groupBy(F.coalesce("source", F.lit("")).alias("source"))
        .agg(
            F.count("*").cast("bigint").alias("n_s"),
            F.sum((F.col("lang") == "en").cast("bigint"))
            .cast("bigint")
            .alias("e_s"),
        )
    )
    tot = per.groupBy().agg(F.sum("n_s").cast("bigint").alias("n"))
    scored = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.expr(
            "CAST(floor(CAST(e_s AS DOUBLE) / n_s * 1e6 + 0.5) AS BIGINT)"
            " / 1e6"
        ).alias("rate"),
        F.expr(
            """
            CAST(floor((CAST(e_s AS DOUBLE) / n_s
              + sqrt(2.0 * ln(CAST(n AS DOUBLE)) / n_s)) * 1e6 + 0.5)
              AS BIGINT) / 1e6
            """
        ).alias("ucb_score"),
    )
    wr = Window.orderBy(F.col("ucb_score").desc(), "source")
    return scored.withColumn(
        "rank", F.row_number().over(wr).cast("int")
    ).orderBy("rank")


ORACLE_UCB_ARM_RANKING = """
WITH per AS (
  SELECT coalesce(source, '') AS source,
         CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS e_s
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM per),
scored AS (
  SELECT source, n_s,
         CAST(floor(CAST(e_s AS DOUBLE) / n_s * 1e6 + 0.5) AS BIGINT)
           / 1e6 AS rate,
         CAST(floor((CAST(e_s AS DOUBLE) / n_s
           + sqrt(2.0 * ln(CAST(n AS DOUBLE)) / n_s)) * 1e6 + 0.5)
           AS BIGINT) / 1e6 AS ucb_score
  FROM per, tot)
SELECT source, n_s, rate, ucb_score,
       CAST(row_number() OVER (ORDER BY ucb_score DESC, source)
         AS INTEGER) AS rank
FROM scored ORDER BY rank
"""


EVALMETRICS_QUERIES = {
    "bleu_pairs": q_bleu_pairs,
    "chrf_pairs": q_chrf_pairs,
    "self_bleu_lite": q_self_bleu_lite,
    "ece_score": q_ece_score,
    "ucb_arm_ranking": q_ucb_arm_ranking,
}

EVALMETRICS_ORACLES = {
    "bleu_pairs": ORACLE_BLEU_PAIRS.format(
        verify=_q.ORACLE_DEDUP_MINHASH_VERIFY
    ),
    "chrf_pairs": ORACLE_CHRF_PAIRS.format(
        verify=_q.ORACLE_DEDUP_MINHASH_VERIFY
    ),
    "self_bleu_lite": ORACLE_SELF_BLEU_LITE,
    "ece_score": ORACLE_ECE_SCORE,
    "ucb_arm_ranking": ORACLE_UCB_ARM_RANKING,
}

_q.QUERIES.update(EVALMETRICS_QUERIES)
_q.ORACLES.update(EVALMETRICS_ORACLES)
