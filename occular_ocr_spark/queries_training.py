"""Training-set assembly catalog, round 4 (waves 4 + 8): operators the
fine-tuning side of a data platform runs after curation —

* ``preference_pairs`` — RLHF/DPO preference-pair construction: within
  each group (source domain here), documents rank by a deterministic
  quality proxy and consecutive ranks pair off as (chosen, rejected)
  with their score margin.  The distributed shape is the one that
  matters at scale: one rank window PER GROUP (hash-partitioned, never
  global) and a single partial-agg pairing by (group, pair_id) using
  max_by/min_by — no self-join of the ranked stream.
* ``padding_waste`` — per-length-bucket padding-efficiency report for
  fixed-shape batching: documents bucket by next-power-of-two token
  length; padded = bucket_cap * docs, waste = padded - real.  The
  exact-integer companion evidence for why ``pack_sequences``
  (queries_pipeline.py) exists: the waste column IS the tokens packing
  recovers.  One map-side projection into a bounded-key partial agg.
* ``epoch_shuffle`` (wave 8) — seeded deterministic epoch shuffle:
  a global pseudo-random permutation as a computed column via the
  two-level rank over a portable md5-derived 16-bit key; no global
  sort, no engine-native hash, reproducible from the row alone.

House contract: DuckDB value-hash oracle with identical aliases and
quantization, self-registration into queries.QUERIES / ORACLES on
import, plan assertions in tests/test_plans.py.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chosen, rejected) preference pairs per source group.

    Score = the deterministic quality proxy ``n_chars`` (ties broken by
    doc_id so the rank is total); rank r pairs with rank r+1 when r is
    odd, chosen = the higher-scored member.  Groups with an odd member
    count drop their last rank — standard pairing semantics.

    Plan: the per-source rank uses the two-level decomposition
    (score_deciles / epoch_shuffle house pattern) — source cardinality
    is FIXED by the corpus model, so a window partitioned solely by
    source funnels n/|sources| rows through one task's sort (VERDICT
    r5 "What's wrong" #1).  Level 1: per-(source, score) counts
    (partial agg; scores are bounded ints, so the compressed table and
    its per-source prefix window are bounded).  Level 2: row_number
    within each (source, score) group (parallel, doc_id tiebreak).
    Pairing stays ONE partial-agg groupBy on (source, pair_id) with
    max_by/min_by — the ranked rows shuffle once, no self-join.
    """
    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("score")
    )
    vcounts = d.groupBy("source", "score").agg(F.count("*").alias("c"))
    wv = Window.partitionBy("source").orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = vcounts.select(
        "source", "score", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("p")
    )
    wr = Window.partitionBy("source", "score").orderBy("doc_id")
    ranked = d.join(F.broadcast(prefix), ["source", "score"]).select(
        "source",
        "doc_id",
        "score",
        (F.col("p") + F.row_number().over(wr)).cast("int").alias("r"),
    )
    paired = ranked.withColumn("pair_id", F.floor((F.col("r") - 1) / 2))
    # r is unique within (source, pair_id): the odd rank is the better
    # member by construction, so r itself is the arg-min/max key — no
    # struct-ordered comparison needed on either engine
    full = paired.groupBy("source", "pair_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("min_by(doc_id, r)").alias("chosen_doc"),
        F.expr("max_by(doc_id, r)").alias("rejected_doc"),
        F.expr("min_by(score, r)").alias("chosen_score"),
        F.expr("max_by(score, r)").alias("rejected_score"),
    )
    return (
        full.where(F.col("n") == 2)
        .select(
            "source",
            F.col("pair_id").cast("bigint").alias("pair_id"),
            "chosen_doc",
            "rejected_doc",
            (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        )
    )


ORACLE_PREFERENCE_PAIRS = """
WITH ranked AS (
  SELECT source, doc_id,
         CAST(n_chars AS BIGINT) AS score,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS r
  FROM documents),
paired AS (
  SELECT *, CAST(floor((r - 1) / 2) AS BIGINT) AS pair_id FROM ranked),
agg AS (
  SELECT source, pair_id, count(*) AS n,
         arg_min(doc_id, r) AS chosen_doc,
         arg_max(doc_id, r) AS rejected_doc,
         arg_min(score, r) AS chosen_score,
         arg_max(score, r) AS rejected_score
  FROM paired GROUP BY 1, 2)
SELECT source, pair_id, chosen_doc, rejected_doc,
       chosen_score - rejected_score AS margin
FROM agg WHERE n = 2
"""


# ---------------------------------------------------------------------------
# padding_waste
# ---------------------------------------------------------------------------

_PW_MIN_CAP = 64  # smallest batch shape


def q_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket padding-efficiency report for fixed-shape batching.

    Token count = the whitespace estimator (shared with
    ``token_count``); bucket cap = next power of two >= tokens
    (floor 64).  ``waste_tokens = cap*docs - real`` is the
    exact-integer cost of rectangular batching — the number
    ``pack_sequences`` exists to reclaim.  All integer arithmetic; the
    one float (waste_ratio) rounds at 6.

    Plan: map-side token count + bit-arithmetic bucketing into a
    bounded-key (log2 of max length) partial agg — one scan, one
    1-row-per-bucket exchange.
    """
    d = _t(spark, sf_dir, "documents")
    toks = F.greatest(
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")), F.lit(1)
    ).cast("bigint")
    # next power of two >= max(toks, _PW_MIN_CAP), as 2^ceil(log2 x)
    x = F.greatest(toks, F.lit(_PW_MIN_CAP))
    cap = F.pow(F.lit(2.0), F.ceil(F.log2(x.cast("double")))).cast("bigint")
    # log2 of an exact power of two is exact in IEEE double on both
    # engines, so ceil() is bit-stable at bucket boundaries
    agg = (
        d.select(toks.alias("toks"), cap.alias("cap"))
        .groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("toks").cast("bigint").alias("real_tokens"),
        )
    )
    padded = F.col("cap") * F.col("docs")
    return agg.select(
        "cap",
        "docs",
        "real_tokens",
        padded.alias("padded_tokens"),
        (padded - F.col("real_tokens")).alias("waste_tokens"),
        F.round((padded - F.col("real_tokens")) / padded, 6).alias(
            "waste_ratio"
        ),
    )


ORACLE_PADDING_WASTE = f"""
WITH t AS (
  SELECT greatest(len(string_split(coalesce(text, ''), ' ')), 1)::BIGINT
           AS toks
  FROM documents),
b AS (
  SELECT toks,
         CAST(pow(2.0, ceil(log2(CAST(greatest(toks, {_PW_MIN_CAP})
                                      AS DOUBLE)))) AS BIGINT) AS cap
  FROM t),
agg AS (
  SELECT cap, CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(toks) AS BIGINT) AS real_tokens
  FROM b GROUP BY 1)
SELECT cap, docs, real_tokens,
       cap * docs AS padded_tokens,
       cap * docs - real_tokens AS waste_tokens,
       round(CAST(cap * docs - real_tokens AS DOUBLE) / (cap * docs), 6)
         AS waste_ratio
FROM agg
"""


# ---------------------------------------------------------------------------
# epoch_shuffle — seeded global permutation without a global sort (wave 8)
# ---------------------------------------------------------------------------

_EPOCH_SEED = 1


def _shuffle_key_expr(dialect: str) -> str:
    """Portable 16-bit shuffle key: first 4 hex digits of
    ``md5(doc_id || ':' || seed)`` decoded by string arithmetic — the
    ``kfold_assign`` / ``sample_stratified`` house trick, so the key is
    the SAME integer on both engines (no engine-native hash anywhere)."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    hexv = (
        lambda j: "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS "
        f"{strtype}) || ':{_EPOCH_SEED}'), {j}, 1)) - 1)"
    )
    return f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded epoch shuffle: a deterministic pseudo-random permutation
    of the corpus (``train_pos`` = global rank of the portable hash
    key, ties broken by doc_id) — the data-loader's per-epoch shuffle,
    reproducible from the row alone and stable across engines, runs,
    and partitionings.

    Complements ``shard_interleave`` (source-balanced round-robin
    order): this is the UNIFORM shuffle a loader applies within a
    mixture, keyed by seed so epoch 2 is a different-but-reproducible
    permutation.

    The global rank is NEVER a single-task ``Window.orderBy`` over the
    corpus — it reuses the ``score_deciles`` two-level decomposition
    with the 16-bit hash key as the first level: per-key counts
    (partial agg, at most 65,536 rows), one tiny ordered prefix-sum
    window over those key rows, then row_number within each key group
    (parallel, doc_id tiebreak).  Everything row-shaped stays
    hash-distributed.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr(_shuffle_key_expr("spark")).cast("int").alias("shuffle_key"),
    )
    vcounts = d.groupBy("shuffle_key").agg(F.count("*").alias("c"))
    wv = Window.orderBy("shuffle_key").rowsBetween(Window.unboundedPreceding, -1)
    prefix = vcounts.select(
        "shuffle_key", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("p")
    )
    wr = Window.partitionBy("shuffle_key").orderBy("doc_id")
    return (
        d.join(F.broadcast(prefix), "shuffle_key")
        .select(
            "doc_id",
            "shuffle_key",
            (F.col("p") + F.row_number().over(wr) - 1)
            .cast("bigint")
            .alias("train_pos"),
        )
    )


ORACLE_EPOCH_SHUFFLE = f"""
WITH keyed AS (
  SELECT doc_id, CAST({_shuffle_key_expr("duck")} AS INT) AS shuffle_key
  FROM documents)
SELECT doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
         AS train_pos
FROM keyed
"""


# ---------------------------------------------------------------------------
# bradley_terry — pairwise-preference strength fit over sources
# ---------------------------------------------------------------------------

_BT_ITERS = 2  # unrolled MM iterations (pagerank_bipartite doctrine)


def _bt_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic match synthesis: adjacent doc_ids from different
    sources play one match; the longer document (n_chars, tie -> lower
    doc_id) wins.  The adjacent-pair join is an equi-join on doc_id+1
    (narrow, co-partitioned after one hash exchange), mirroring the
    cdc_chunks house pattern for synthetic pairings."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    a = d.alias("a")
    b = d.select(
        (F.col("doc_id") - 1).alias("join_id"),
        F.col("source").alias("src_b"),
        F.col("n_chars").alias("nc_b"),
    ).alias("b")
    m = a.join(b, F.col("a.doc_id") == F.col("b.join_id")).where(
        F.col("a.source") != F.col("src_b")
    )
    win_a = (F.col("a.n_chars") > F.col("nc_b")) | (
        F.col("a.n_chars") == F.col("nc_b")
    )  # tie -> the lower doc_id (the left row) wins
    return m.select(
        F.when(win_a, F.col("a.source")).otherwise(F.col("src_b")).alias("w"),
        F.when(win_a, F.col("src_b")).otherwise(F.col("a.source")).alias("l"),
    )


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength ratings over sources from pairwise
    "which document wins" matches — the model behind ranking data
    sources (or annotators, or model checkpoints) from preference
    pairs when no absolute score exists.

    MM fit (Hunter 2004, minorization-maximization):

        p_i <- W_i / Σ_{j≠i} n_ij / (p_i + p_j)

    with p = 1 init and _BT_ITERS unrolled iterations.

    Scale: the corpus-sized work is ONE adjacent-pair equi-join +
    ONE partial-agg groupBy to the S×S win matrix; every MM iteration
    then runs on the ≤ S² pair frame (broadcast joins, partial aggs) —
    iteration cost is independent of corpus size, the kmeans_lloyd /
    pagerank shape.

    Determinism: win counts are exact BIGINT; each iteration's
    per-pair term n_ij/(p_i+p_j) is half-up quantized to integer
    nano-units BEFORE the per-source sum (so group accumulation order
    cannot differ between engines), and ratings are float32-quantized
    between iterations (the kmeans_lloyd doctrine, CAST REAL in the
    oracle).  A source with no matches never enters the win matrix (no
    output row); a zero denominator yields NULL rating via nullif.
    """
    wins = _bt_matches(spark, sf_dir).groupBy("w", "l").agg(
        F.count("*").cast("bigint").alias("n_w")
    )
    # symmetric match counts n_ij (i -> j, both orientations) and
    # per-source total wins
    # sym / n_ij / tot_w are ≤ S²-sized but each reference below
    # (n_ij's two sides, tot_w, every MM iteration, the final report)
    # re-derived them — and through sym, the corpus-sized adjacent-pair
    # join — from scratch.  Release-tracked persists run the corpus
    # pass once; iterations touch only the cached pair frame.
    sym = _q._persist_tracked(
        wins.select(F.col("w").alias("i"), F.col("l").alias("j"), "n_w")
        .unionByName(
            wins.select(
                F.col("l").alias("i"),
                F.col("w").alias("j"),
                F.lit(0).cast("bigint").alias("n_w"),
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("n_w").alias("w_ij"))
    )
    n_ij = _q._persist_tracked(
        sym.alias("x")
        .join(
            sym.select(
                F.col("i").alias("j"),
                F.col("j").alias("i"),
                F.col("w_ij").alias("w_ji"),
            ).alias("y"),
            ["i", "j"],
        )
        .select("i", "j", (F.col("w_ij") + F.col("w_ji")).alias("n_ij"))
    )
    tot_w = _q._persist_tracked(
        sym.groupBy("i").agg(F.sum("w_ij").alias("w_tot"))
    )
    ratings = tot_w.select("i", F.lit(1.0).cast("float").alias("p"))
    for _ in range(_BT_ITERS):
        pj = ratings.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        terms = (
            n_ij.join(F.broadcast(ratings), "i")
            .join(F.broadcast(pj), "j")
            .select(
                "i",
                F.expr(
                    "CAST(floor(n_ij / (CAST(p AS DOUBLE)"
                    " + CAST(p_j AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)"
                ).alias("t"),
            )
        )
        denom = terms.groupBy("i").agg(F.sum("t").alias("d9"))
        ratings = (
            tot_w.join(denom, "i", "left")
            .select(
                "i",
                F.expr(
                    "CAST(w_tot / nullif(d9 / 1e9, 0.0) AS FLOAT)"
                ).alias("p"),
            )
        )
    return (
        tot_w.join(ratings, "i")
        .join(
            n_ij.groupBy("i").agg(F.sum("n_ij").alias("n_matches")),
            "i",
            "left",
        )
        .select(
            F.col("i").alias("source"),
            F.col("w_tot").cast("bigint").alias("n_wins"),
            F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
            F.round(F.col("p").cast("double"), 6).alias("rating"),
        )
    )


def _bt_oracle() -> str:
    it = """
r{k} AS (
  SELECT w.i,
         CAST(w.w_tot / nullif(sum(
           CAST(floor(n.n_ij / (CAST(p_i.p AS DOUBLE) + CAST(p_j.p AS DOUBLE))
                * 1e9 + 0.5) AS BIGINT)
         ) / 1e9, 0.0) AS REAL) AS p
  FROM tot_w w
  LEFT JOIN n_ij n ON n.i = w.i
  LEFT JOIN r{km1} p_i ON p_i.i = n.i
  LEFT JOIN r{km1} p_j ON p_j.i = n.j
  GROUP BY w.i, w.w_tot)"""
    iters = "".join(
        it.format(k=k, km1=k - 1) + "," for k in range(1, _BT_ITERS + 1)
    ).rstrip(",")
    return f"""
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
m AS (
  SELECT CASE WHEN a.n_chars >= b.n_chars THEN a.source ELSE b.source END AS w,
         CASE WHEN a.n_chars >= b.n_chars THEN b.source ELSE a.source END AS l
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND a.source <> b.source),
wins AS (SELECT w, l, CAST(count(*) AS BIGINT) AS n_w FROM m GROUP BY w, l),
sym AS (
  SELECT i, j, CAST(sum(n_w) AS BIGINT) AS w_ij FROM (
    SELECT w AS i, l AS j, n_w FROM wins
    UNION ALL SELECT l AS i, w AS j, 0 AS n_w FROM wins
  ) GROUP BY i, j),
n_ij AS (
  SELECT x.i, x.j, x.w_ij + y.w_ij AS n_ij
  FROM sym x JOIN sym y ON y.i = x.j AND y.j = x.i),
tot_w AS (SELECT i, CAST(sum(w_ij) AS BIGINT) AS w_tot FROM sym GROUP BY i),
r0 AS (SELECT i, CAST(1.0 AS REAL) AS p FROM tot_w),{iters}
SELECT w.i AS source,
       w.w_tot AS n_wins,
       CAST(coalesce((SELECT sum(n.n_ij) FROM n_ij n WHERE n.i = w.i), 0)
            AS BIGINT) AS n_matches,
       round(CAST(r.p AS DOUBLE), 6) AS rating
FROM tot_w w JOIN r{_BT_ITERS} r ON r.i = w.i
"""


ORACLE_BRADLEY_TERRY = _bt_oracle()


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# weighted_sample_es — Efraimidis–Spirakis weighted sample without replacement
# ---------------------------------------------------------------------------

_WES_K = 25  # sample size


def _wes_hash16(dialect: str) -> str:
    """First 16 bits of md5(doc_id ':es') — the portable hash family
    (bootstrap_ci / dp_noisy_counts), keyed for this sampler."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"

    def hexv(j: int) -> str:
        return (
            f"(instr('0123456789abcdef', substr(md5("
            f"CAST(doc_id AS {strtype}) || ':es'"
            f"), {j}, 1)) - 1)"
        )

    return f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"


def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, k = 25, weight = n_chars —
    the Efraimidis–Spirakis A-ES scheme (IPL 2006): each item draws
    u ∈ (0,1) and the k LARGEST keys u^(1/w) win; equivalently the k
    largest ln(u)/w, which is what both engines compute (one ln of an
    exact dyadic rational from the portable 16-bit hash, no pow).
    This is THE distributed weighted sampler: key assignment is
    map-side, selection is a global top-k — no sequential pass, no
    rejection loop, exactly k rows, inclusion probability
    proportional-ish to weight.

    Determinism: keys quantize to integer PICO-units
    (floor(ln(u)/w · 10^12) — BIGINT-safe: |ln u| < 12, w >= 1) before
    ranking, doc_id breaks ties, so the selected SET and its order are
    bit-stable across engines (the house ln-at-the-surface contract).

    Scale: one scan, map-side key, TakeOrdered(k) — the same shape as
    sample_k_per_group's global variant; never a full sort.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.greatest(F.col("n_chars").cast("bigint"), F.lit(1)).alias("w"),
    )
    h = F.expr(_wes_hash16("spark"))
    u = (h + F.lit(0.5)) / F.lit(65536.0)
    keyed = d.select(
        "doc_id",
        "w",
        F.floor(F.log(u) / F.col("w") * F.lit(1e12)).cast("bigint").alias(
            "key_p"
        ),
    )
    top = keyed.orderBy(F.col("key_p").desc(), "doc_id").limit(_WES_K)
    wr = Window.orderBy(F.col("key_p").desc(), "doc_id")
    return top.select(
        "doc_id", "w", F.row_number().over(wr).cast("int").alias("rank")
    )


ORACLE_WEIGHTED_SAMPLE_ES = f"""
WITH keyed AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         greatest(CAST(n_chars AS BIGINT), 1) AS w,
         CAST(floor(ln((({_wes_hash16("duckdb")}) + 0.5) / 65536.0)
                    / greatest(CAST(n_chars AS BIGINT), 1) * 1e12)
              AS BIGINT) AS key_p
  FROM documents),
top AS (
  SELECT doc_id, w, key_p FROM keyed
  ORDER BY key_p DESC, doc_id LIMIT {_WES_K})
SELECT doc_id, w,
       CAST(row_number() OVER (ORDER BY key_p DESC, doc_id) AS INT) AS rank
FROM top
"""


TRAINING_QUERIES = {
    "preference_pairs": q_preference_pairs,
    "padding_waste": q_padding_waste,
    "epoch_shuffle": q_epoch_shuffle,
    "bradley_terry": q_bradley_terry,
    "weighted_sample_es": q_weighted_sample_es,
}

TRAINING_ORACLES = {
    "preference_pairs": ORACLE_PREFERENCE_PAIRS,
    "padding_waste": ORACLE_PADDING_WASTE,
    "epoch_shuffle": ORACLE_EPOCH_SHUFFLE,
    "bradley_terry": ORACLE_BRADLEY_TERRY,
    "weighted_sample_es": ORACLE_WEIGHTED_SAMPLE_ES,
}

_q.QUERIES.update(TRAINING_QUERIES)
_q.ORACLES.update(TRAINING_ORACLES)
