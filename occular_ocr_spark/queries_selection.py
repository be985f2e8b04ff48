"""Data-selection & ops-hygiene catalog, round 4 (wave 26): five
operators a pretraining platform runs when choosing, auditing, and
load-balancing what it trains on —

* ``dsir_weights`` — DSIR importance weights (Xie et al. 2023, "Data
  Selection with Importance Resampling"), one model class down: the
  per-document log importance ratio between an add-one-smoothed
  unigram LM of the TARGET domain (the lexicographically smallest
  ``source``) and the raw-corpus LM.  The standard cheap scorer for
  "sample raw data to look like the target domain".
* ``ngram_novelty`` — per-document fraction of its distinct 3-word
  shingles that FIRST appear in that document (min doc_id over the
  corpus): the novelty signal curriculum/selection pipelines use to
  down-weight documents that only restate earlier content.
* ``daily_anomaly_mad`` — robust daily-volume anomaly flags: a day is
  anomalous when |count − median| > 3·MAD, evaluated entirely in
  scaled integers (2× / 4× multiples), so the flag carries zero
  floating-point risk.
* ``adjacent_turn_runs`` — per-conversation runs of consecutive
  verbatim-identical turns (gaps-and-islands on the turn fingerprint):
  the adjacency-sensitive degeneracy signal that
  ``turn_self_repetition`` (bag-level) cannot see.
* ``shard_skew_report`` — token/document balance audit of the
  ``_SHARDS``-way portable-hash sharding (the ``kfold_assign`` hash):
  per-shard counts plus the signed relative token skew vs the uniform
  share.  The report that decides whether a layout needs salting
  before a 1000-executor run.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the curation family
(``unigram_logprob`` queries_curation.py, ``domain_mix_weights``
queries.py), the dedup family (``_shingles`` queries.py), the drift
family (``cusum_drift`` queries_drift.py), the transcript family
(``turn_self_repetition`` queries_corpus.py), and the warehouse family
(``kfold_assign`` queries_round4.py, ``zorder_cluster``
queries_scale.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weight per document: with target counts
    c_t / N_t (documents whose ``source`` is the corpus-minimum one)
    and raw counts c_r / N_r over the shared vocabulary V,

        log_weight(d) = Σ_tok [ ln(c_t+1) − ln(N_t+V)
                               − ln(c_r+1) + ln(N_r+V) ]

    — add-one smoothing keeps every term finite, and each ln argument
    is an EXACT integer, so both engines take ln of identical doubles;
    the only cross-engine freedom is the per-document summation order,
    far below the 6-dp rounding quantum (the ``unigram_logprob``
    precedent).

    Scale: ONE token pass builds both LMs (conditional partial aggs in
    the same groupBy(tok)); the vocabulary and the 1-row totals
    broadcast back onto the token stream, so scoring is map-side; the
    per-doc sum reuses the doc_id partitioning.  Same exchange budget
    as ``unigram_logprob``.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source", "text"
    )
    d = d.repartition(
        d.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    tgt = d.agg(F.min("source").alias("tgt_src"))
    tok = d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("tok"))
    vocab = (
        tok.crossJoin(F.broadcast(tgt))
        .groupBy("tok")
        .agg(
            F.count("*").alias("c_raw"),
            F.sum(
                F.when(F.col("source") == F.col("tgt_src"), 1).otherwise(0)
            ).alias("c_tgt"),
        )
    )
    totals = vocab.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count("*").alias("v_size"),
    )
    term = (
        F.log(F.col("c_tgt") + 1)
        - F.log(F.col("n_tgt") + F.col("v_size"))
        - F.log(F.col("c_raw") + 1)
        + F.log(F.col("n_raw") + F.col("v_size"))
    )
    return (
        tok.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum(term), 6).alias("log_weight"),
        )
    )


ORACLE_DSIR_WEIGHTS = """
WITH tgt AS (SELECT min(source) AS tgt_src FROM documents),
tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
  FROM documents),
vocab AS (
  SELECT tok, count(*) AS c_raw,
         sum(CASE WHEN source = (SELECT tgt_src FROM tgt) THEN 1 ELSE 0 END)
           AS c_tgt
  FROM tok GROUP BY tok),
tot AS (
  SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt, count(*) AS v_size
  FROM vocab)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(  ln(CAST(v.c_tgt + 1 AS DOUBLE))
                 - ln(CAST(o.n_tgt + o.v_size AS DOUBLE))
                 - ln(CAST(v.c_raw + 1 AS DOUBLE))
                 + ln(CAST(o.n_raw + o.v_size AS DOUBLE))), 6) AS log_weight
FROM tok t JOIN vocab v USING (tok) CROSS JOIN tot o
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: of a document's distinct 3-word
    shingles, the fraction whose corpus-wide FIRST occurrence
    (min doc_id) is this document — 1.0 means all-new content, 0.0
    means every shingle restates an earlier document.  Documents with
    fewer than 3 tokens carry no shingles and are absent, mirroring
    the dedup family.

    Scale: reuses the dedup family's distinct-shingle stream; the
    first-occurrence table is ONE partial-aggregated min per shingle
    key, joined back on the same key (two shuffles on the shingle
    hash, both combiner-reduced), then a per-doc partial agg.  Exact
    integers until the final division rounds to 6.
    """
    sh = _q._shingles(spark, sf_dir)
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(
                (F.col("doc_id") == F.col("first_doc")).cast("int")
            ).cast("bigint").alias("n_novel"),
        )
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


ORACLE_NGRAM_NOVELTY = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         list_extract(l, i) || ' ' || list_extract(l, i+1) || ' ' ||
           list_extract(l, i+2) AS sh
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
        FROM toks WHERE len(l) >= 3)),
first AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh)
SELECT CAST(s.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(CAST(sum(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty
FROM sh s JOIN first f USING (sh)
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# daily_anomaly_mad
# ---------------------------------------------------------------------------


def q_daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly flags: day d is anomalous iff
    |n_d − median(n)| > 3 · MAD (MAD = median absolute deviation).
    Both medians interpolate lower/upper-middle averages, so they are
    multiples of ½; the whole test is carried in scaled INTEGERS
    (dev2 = |2n − 2·med|, mad4 = 2·median(dev2), flag ⇔
    2·dev2 > 3·mad4) — zero floating-point risk in the flag.

    Scale: the daily rollup is a partial-aggregated groupBy to one row
    per day — at any corpus age that is ≤ tens of thousands of rows,
    so the two exact medians aggregate a DAY-BOUNDED set, never row
    data (the documented bound; contrast ``group_quantiles_dist`` for
    percentiles over unbounded groups).  The 1-row stats broadcast
    back onto the day rows.
    """
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    med2 = (F.lit(2) * F.percentile("n_events", F.lit(0.5))).cast("bigint")
    stats1 = daily.agg(med2.alias("med2"))
    dev = daily.crossJoin(F.broadcast(stats1)).withColumn(
        "dev2", F.abs(F.lit(2) * F.col("n_events") - F.col("med2"))
    )
    mad4 = (F.lit(2) * F.percentile("dev2", F.lit(0.5))).cast("bigint")
    stats2 = dev.agg(mad4.alias("mad4"))
    return (
        dev.crossJoin(F.broadcast(stats2))
        .select(
            "day",
            "n_events",
            F.col("dev2").cast("bigint").alias("dev2"),
            (F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad4")).alias(
                "is_anomaly"
            ),
        )
    )


ORACLE_DAILY_ANOMALY_MAD = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
s1 AS (SELECT CAST(2 * quantile_cont(n_events, 0.5) AS BIGINT) AS med2
       FROM daily),
dev AS (
  SELECT day, n_events, abs(2 * n_events - med2) AS dev2
  FROM daily CROSS JOIN s1),
s2 AS (SELECT CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4 FROM dev)
SELECT day, n_events, CAST(dev2 AS BIGINT) AS dev2,
       (2 * dev2 > 3 * mad4) AS is_anomaly
FROM dev CROSS JOIN s2
"""


# ---------------------------------------------------------------------------
# adjacent_turn_runs
# ---------------------------------------------------------------------------


def q_adjacent_turn_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation runs of consecutive verbatim-identical turns
    (gaps-and-islands: island = turn_idx − row_number within
    (conv, fingerprint)): run count ≥ 2, longest run, and the number
    of adjacent duplicate pairs Σ(run − 1).  The adjacency-sensitive
    loop signal — a conversation alternating A,B,A,B has repetition
    but NO adjacent runs, and this op tells them apart.

    Scale: both windows partition on conv (state = one conversation's
    turns, human-bounded); the rollups are partial-aggregated
    groupBys.  All integers — no float anywhere.
    """
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        F.floor(F.col("doc_id") / 10).cast("bigint").alias("conv"),
        (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
    )
    wr = Window.partitionBy("conv", "fp").orderBy("turn_idx")
    runs = (
        t.withColumn(
            "island", F.col("turn_idx") - F.row_number().over(wr)
        )
        .groupBy("conv", "fp", "island")
        .agg(F.count("*").alias("run_len"))
    )
    return runs.groupBy("conv").agg(
        F.sum("run_len").cast("bigint").alias("n_turns"),
        F.sum((F.col("run_len") >= 2).cast("int")).cast("bigint").alias(
            "n_runs_ge2"
        ),
        F.max("run_len").cast("bigint").alias("max_run"),
        F.sum(F.col("run_len") - 1).cast("bigint").alias("n_adjacent_dups"),
    )


ORACLE_ADJACENT_TURN_RUNS = """
WITH t AS (
  SELECT doc_id // 10 AS conv, CAST(doc_id % 10 AS INT) AS turn_idx,
         md5(coalesce(text, '')) AS fp
  FROM documents),
isl AS (
  SELECT conv, fp,
         turn_idx - row_number() OVER (
           PARTITION BY conv, fp ORDER BY turn_idx) AS island
  FROM t),
runs AS (
  SELECT conv, fp, island, count(*) AS run_len
  FROM isl GROUP BY conv, fp, island
)
SELECT CAST(conv AS BIGINT) AS conv,
       CAST(sum(run_len) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN run_len >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_runs_ge2,
       CAST(max(run_len) AS BIGINT) AS max_run,
       CAST(sum(run_len - 1) AS BIGINT) AS n_adjacent_dups
FROM runs GROUP BY conv
"""


# ---------------------------------------------------------------------------
# shard_skew_report
# ---------------------------------------------------------------------------

_SHARDS = 32


def _shard_skew_sql(dialect: str = "duck") -> str:
    """Dual-dialect SQL (the ``kfold_assign`` pattern): shard =
    md5-hash16(doc_id) mod ``_SHARDS`` — identical integers on both
    engines, stable under renumbering."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    ntoks = (
        "size(split(text, ' '))"
        if dialect == "spark"
        else "len(string_split(text, ' '))"
    )
    hexv = (
        lambda j: f"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS {strtype})), {j}, 1)) - 1)"
    )
    h16 = f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"
    return f"""
WITH per_shard AS (
  SELECT CAST({h16} % {_SHARDS} AS INT) AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({ntoks}) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY 1),
tot AS (SELECT sum(n_tokens) AS t_tokens FROM per_shard)
SELECT shard, n_docs, n_tokens,
       round(CAST(n_tokens * {_SHARDS} - t_tokens AS DOUBLE) / t_tokens, 6)
         AS token_skew
FROM per_shard CROSS JOIN tot
"""


def q_shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance audit of the ``_SHARDS``-way portable-hash layout:
    per-shard document/token counts plus the signed relative token
    skew vs the uniform share, (n·S − T)/T — the number that says
    whether this sharding feeds 1000 executors evenly or needs a salt.

    Scale: map-side shard arithmetic into an S-row partial agg; the
    1-row total broadcasts back.  The skew division is the only float,
    on exact integers, rounded to 6.
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_shard_skew_sql("spark"))


ORACLE_SHARD_SKEW_REPORT = _shard_skew_sql("duck")


SELECTION_QUERIES = {
    "dsir_weights": q_dsir_weights,
    "ngram_novelty": q_ngram_novelty,
    "daily_anomaly_mad": q_daily_anomaly_mad,
    "adjacent_turn_runs": q_adjacent_turn_runs,
    "shard_skew_report": q_shard_skew_report,
}

SELECTION_ORACLES = {
    "dsir_weights": ORACLE_DSIR_WEIGHTS,
    "ngram_novelty": ORACLE_NGRAM_NOVELTY,
    "daily_anomaly_mad": ORACLE_DAILY_ANOMALY_MAD,
    "adjacent_turn_runs": ORACLE_ADJACENT_TURN_RUNS,
    "shard_skew_report": ORACLE_SHARD_SKEW_REPORT,
}

_q.QUERIES.update(SELECTION_QUERIES)
_q.ORACLES.update(SELECTION_ORACLES)
