"""Drift & corpus-hygiene catalog, round 4 (wave 3): six operators a
web-scale training-data platform runs between extraction and training —
distribution-drift monitors, statistical QA, and per-domain hygiene.

* ``psi_drift`` — Population Stability Index between a reference and a
  current document population (here: doc_id parity halves over the
  ``n_chars`` length distribution, 10 fixed-width bins).  PSI is the
  standard "did my corpus mix shift between snapshots" dial; the
  Laplace-smoothed per-bin contributions are the debugging surface.
* ``ks_statistic`` — two-sample Kolmogorov-Smirnov D over the events
  value distribution, computed as a *distributed ECDF*: exact integer
  cents quantization, per-value counts, then the house two-level
  prefix-sum (bounded per-bucket offsets + within-bucket window) so no
  global single-task window ever materializes.  The D numerator stays
  in exact integer arithmetic (``|cum_a*n_b - cum_b*n_a|``) until one
  final division.
* ``boilerplate_scrub`` — RefinedWeb-style per-source boilerplate line
  detection: sentences appearing in >= 20% of a source's documents
  (and >= 3 absolute) are flagged.  Headers/footers are synthesized
  deterministically in-query (house pattern, cf. ``link_extract``'s
  URL synthesis, queries_transcript.py) since the fixture corpus has
  no natural shared lines.
* ``corr_matrix`` — one-pass Pearson correlation matrix over the four
  numeric lineitem measures: a single partial-aggregate scan collects
  exact-integer (cents-quantized, decimal(38)-summed) moment sums; the
  6 pairwise correlations are then pure arithmetic on one row.
* ``domain_blocklist`` — suffix-exploded domain blocklist matching:
  each host expands to its >= 2-label dot-suffixes map-side and
  equi-joins a broadcast blocklist — the scalable form of the
  ``host LIKE '%.' || domain`` anti-pattern (which cannot use a hash
  join and scans the blocklist per row).
* ``zscore_outliers`` — per-event-type z-score outliers over exact
  integer moment sums (the same determinism trick as ``corr_matrix``);
  the groupwise stats broadcast back onto the event stream map-side.

House contract (same as queries_mining / queries_analytics): the Spark
plan is the 100 TB design, a DuckDB oracle replays the exact semantics
bit-for-bit (shared quantization, exact integer numerators, round(,6)
on every float surface), and the module self-registers into
queries.QUERIES / queries.ORACLES on import.

Reference parity: the reference engine (Bodhi42/Occular-ocr) is a
per-document extractor with no corpus-level layer; these are axis-B
net-new operators for the north rule's training-data platform
(SURVEY.md §2, "LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------

_PSI_BIN_W = 120  # fixed-width n_chars bins
_PSI_BINS = 10


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots.

    Reference population = even doc_ids, current = odd (a deterministic
    stand-in for "last week's crawl vs this week's"); the monitored
    statistic is the document length ``n_chars`` in 10 fixed-width
    bins (top bin open-ended).  Laplace smoothing (+0.5 per bin,
    +0.5*10 per total) keeps empty-on-one-side bins finite — the
    textbook PSI recipe.

    Plan: one map-side projection (bin + side flags) into one
    partial-agg groupBy over <= 10 bin keys; the total row counts come
    from a window over those <= 10 rows (bounded frame, never raw
    data).  Zero joins, zero Python; at 100 TB this is a single
    scan-and-combine.
    """
    d = _t(spark, sf_dir, "documents")
    binned = d.select(
        F.least(
            F.floor(F.col("n_chars") / _PSI_BIN_W), F.lit(_PSI_BINS - 1)
        ).alias("bin"),
        F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0).alias("is_ref"),
    )
    agg = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("bigint").alias("c_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("c_cur"),
    )
    w = Window.partitionBy()  # <= 10 rows: bounded global frame
    p_ref = (F.col("c_ref") + 0.5) / (F.sum("c_ref").over(w) + 0.5 * _PSI_BINS)
    p_cur = (F.col("c_cur") + 0.5) / (F.sum("c_cur").over(w) + 0.5 * _PSI_BINS)
    return agg.select(
        "bin",
        "c_ref",
        "c_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias(
            "psi_contrib"
        ),
    )


ORACLE_PSI_DRIFT = f"""
WITH binned AS (
  SELECT CAST(least(floor(n_chars / {_PSI_BIN_W}), {_PSI_BINS - 1}) AS BIGINT)
           AS bin,
         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref
  FROM documents),
agg AS (
  SELECT bin,
         CAST(sum(is_ref) AS BIGINT) AS c_ref,
         CAST(sum(1 - is_ref) AS BIGINT) AS c_cur
  FROM binned GROUP BY bin),
tot AS (
  SELECT bin, c_ref, c_cur,
         (c_ref + 0.5) / (sum(c_ref) OVER () + 0.5 * {_PSI_BINS}) AS p_ref,
         (c_cur + 0.5) / (sum(c_cur) OVER () + 0.5 * {_PSI_BINS}) AS p_cur
  FROM agg)
SELECT bin, c_ref, c_cur,
       round(p_ref, 6) AS p_ref,
       round(p_cur, 6) AS p_cur,
       round((p_ref - p_cur) * ln(p_ref / p_cur), 6) AS psi_contrib
FROM tot
"""


# ---------------------------------------------------------------------------
# ks_statistic
# ---------------------------------------------------------------------------

_KS_BUCKET = 4096  # cents per ECDF prefix-sum bucket


def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the event-value
    distributions of two user cohorts (user_id parity halves).

    The ECDFs are built distributed: values quantize to exact integer
    cents (``floor(v*100 + 0.5)`` — identical on both engines), counts
    collapse per distinct cent, and the cumulative sums use the house
    two-level prefix sum (cf. ``pack_sequences``,
    queries_pipeline.py): per-bucket totals (range/{_KS_BUCKET} rows)
    carry the cross-bucket offsets through a bounded window, and the
    within-bucket window is hash-partitioned by bucket.  No global
    single-task window touches the raw rows.

    Determinism: D's numerator ``max |cum_a*n_b - cum_b*n_a|`` is exact
    BIGINT arithmetic; the only float op is the final division,
    rounded to 6.
    """
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    side = F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)
    per_v = (
        ev.select(v.alias("v"), side.alias("is_a"))
        .groupBy("v")
        .agg(
            F.sum("is_a").cast("bigint").alias("c_a"),
            F.sum(1 - F.col("is_a")).cast("bigint").alias("c_b"),
        )
        .withColumn("bucket", F.floor(F.col("v") / _KS_BUCKET))
    )
    # level 1: per-bucket totals -> exclusive cross-bucket offsets
    # (window over #buckets rows, a bounded frame)
    wb = Window.partitionBy().orderBy("bucket")
    bucket_tot = per_v.groupBy("bucket").agg(
        F.sum("c_a").alias("t_a"),
        F.sum("c_b").alias("t_b"),
    )
    offs = bucket_tot.select(
        "bucket",
        F.coalesce(
            F.sum("t_a").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("off_a"),
        F.coalesce(
            F.sum("t_b").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("off_b"),
        F.sum("t_a").over(Window.partitionBy()).alias("n_a"),
        F.sum("t_b").over(Window.partitionBy()).alias("n_b"),
    )
    # level 2: within-bucket cumsum, partitioned by bucket
    wv = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_v.join(F.broadcast(offs), "bucket").select(
        (F.col("off_a") + F.sum("c_a").over(wv)).alias("cum_a"),
        (F.col("off_b") + F.sum("c_b").over(wv)).alias("cum_b"),
        "n_a",
        "n_b",
    )
    return cum.groupBy("n_a", "n_b").agg(
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        )
        .cast("bigint")
        .alias("d_num")
    ).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "d_num",
        F.round(
            F.col("d_num") / (F.col("n_a").cast("double") * F.col("n_b")), 6
        ).alias("d_stat"),
    )


ORACLE_KS_STATISTIC = """
WITH per_v AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_a,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
           AS c_b
  FROM events WHERE value IS NOT NULL GROUP BY 1),
cum AS (
  SELECT sum(c_a) OVER (ORDER BY v) AS cum_a,
         sum(c_b) OVER (ORDER BY v) AS cum_b,
         sum(c_a) OVER () AS n_a,
         sum(c_b) OVER () AS n_b
  FROM per_v)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num,
       round(CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * n_b), 6) AS d_stat
FROM cum GROUP BY n_a, n_b
"""


# ---------------------------------------------------------------------------
# boilerplate_scrub
# ---------------------------------------------------------------------------

_BP_MIN_DOCS = 3  # absolute floor
_BP_PCT10 = 2  # flag when n_docs * 10 >= source_docs * 2  (>= 20%)


def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate sentence detection (RefinedWeb-style):
    a sentence appearing in >= 20% of a source's documents (and >= 3
    absolute) is boilerplate to scrub before training.

    The fixture corpus has no natural shared lines, so headers/footers
    are synthesized deterministically in-query (house pattern —
    ``link_extract``'s URL synthesis): ~3/4 of docs gain a per-source
    copyright footer, ~1/5 a per-source subscribe header.  Both
    engines see the identical payload.

    Plan: map-side split + explode, one partial-agg distinct-doc count
    per (source, sentence), then a broadcast join against the 1-row-
    per-source doc totals.  The >= 20% test stays in exact integer
    arithmetic (``n_docs*10 >= src_docs*2``).
    """
    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    payload = F.when(
        doc % 4 == 1, base
    ).otherwise(
        F.concat(base, F.lit(". (c) "), F.col("source"), F.lit(" rights reserved"))
    )
    payload = F.when(
        doc % 5 == 0,
        F.concat(
            F.lit("subscribe to "), F.col("source"), F.lit(" newsletter. "), payload
        ),
    ).otherwise(payload)
    sents = d.select(
        "doc_id",
        "source",
        F.explode(F.split(payload, "\\. ")).alias("sent0"),
    ).select("doc_id", "source", F.trim("sent0").alias("sentence"))
    sents = sents.where(F.length("sentence") >= 8)
    per_sent = sents.groupBy("source", "sentence").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    src_tot = d.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("src_docs")
    )
    return (
        per_sent.join(F.broadcast(src_tot), "source")
        .where(
            (F.col("n_docs") >= _BP_MIN_DOCS)
            & (F.col("n_docs") * 10 >= F.col("src_docs") * _BP_PCT10)
        )
        .select(
            "source",
            "sentence",
            "n_docs",
            "src_docs",
            F.round(F.col("n_docs") / F.col("src_docs"), 6).alias("doc_share"),
        )
    )


ORACLE_BOILERPLATE_SCRUB = f"""
WITH payload AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN 'subscribe to ' || source || ' newsletter. ' ELSE '' END
         || CASE WHEN doc_id % 4 = 1 THEN coalesce(text, '')
                 ELSE coalesce(text, '') || '. (c) ' || source
                      || ' rights reserved' END AS p
  FROM documents),
sents AS (
  SELECT doc_id, source, trim(u.s) AS sentence
  FROM payload, unnest(string_split(p, '. ')) AS u(s)
  WHERE length(trim(u.s)) >= 8),
per_sent AS (
  SELECT source, sentence,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM sents GROUP BY 1, 2),
src_tot AS (
  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS src_docs
  FROM documents GROUP BY 1)
SELECT p.source, p.sentence, p.n_docs, t.src_docs,
       round(CAST(p.n_docs AS DOUBLE) / t.src_docs, 6) AS doc_share
FROM per_sent p JOIN src_tot t ON p.source = t.source
WHERE p.n_docs >= {_BP_MIN_DOCS}
  AND p.n_docs * 10 >= t.src_docs * {_BP_PCT10}
"""


# ---------------------------------------------------------------------------
# corr_matrix
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Pearson correlation matrix over the four numeric
    lineitem measures — the feature-drift / redundancy screen a data
    platform runs over numeric metadata columns.

    Determinism across engines: every measure quantizes to exact
    integer cents; all moment sums accumulate as decimal(38,0) (exact,
    order-independent), so the six correlations are pure IEEE
    arithmetic on ONE row of exact integers — no float summation order
    anywhere.  Plan: a single partial-agg scan (15 sums), then a
    4-label self-pairing on the 1-row result; at 100 TB this is one
    map-side-combined pass.
    """
    # _spread before the moment scan: 15 decimal(38,0) product-sums per
    # row are CPU-heavy map work above a single-split local scan (no-op
    # at scale — guide §2.5)
    li = _q._spread(_t(spark, sf_dir, "lineitem").select(*_CORR_COLS))
    cents = {
        c: F.floor(F.col(c) * 100 + 0.5).cast("decimal(38,0)")
        for c in _CORR_COLS
    }
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for i, a in enumerate(_CORR_COLS):
        aggs.append(F.sum(cents[a]).alias(f"s{i}"))
        for j, b in enumerate(_CORR_COLS):
            if i <= j:
                aggs.append(F.sum(cents[a] * cents[b]).alias(f"s{i}{j}"))
    row = li.agg(*aggs)
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for j, b in enumerate(_CORR_COLS):
            if i < j:
                n = F.col("n").cast("double")
                si = F.col(f"s{i}").cast("double")
                sj = F.col(f"s{j}").cast("double")
                sij = F.col(f"s{i}{j}").cast("double")
                sii = F.col(f"s{i}{i}").cast("double")
                sjj = F.col(f"s{j}{j}").cast("double")
                corr = (n * sij - si * sj) / (
                    F.sqrt(n * sii - si * si) * F.sqrt(n * sjj - sj * sj)
                )
                pairs.append(
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.round(corr, 6).alias("corr"),
                    )
                )
    return row.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.corr"
    )


def _corr_oracle() -> str:
    cents = {
        c: f"CAST(floor({c} * 100 + 0.5) AS HUGEINT)" for c in _CORR_COLS
    }
    sums = ["CAST(count(*) AS HUGEINT) AS n"]
    for i, a in enumerate(_CORR_COLS):
        sums.append(f"sum({cents[a]}) AS s{i}")
        for j, b in enumerate(_CORR_COLS):
            if i <= j:
                sums.append(f"sum({cents[a]} * {cents[b]}) AS s{i}{j}")
    sel = []
    for i, a in enumerate(_CORR_COLS):
        for j, b in enumerate(_CORR_COLS):
            if i < j:
                num = (
                    f"(CAST(n AS DOUBLE) * CAST(s{i}{j} AS DOUBLE)"
                    f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
                )
                den = (
                    f"(sqrt(CAST(n AS DOUBLE) * CAST(s{i}{i} AS DOUBLE)"
                    f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
                    f" * sqrt(CAST(n AS DOUBLE) * CAST(s{j}{j} AS DOUBLE)"
                    f" - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE)))"
                )
                sel.append(
                    f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                    f"round({num} / {den}, 6) AS corr FROM m"
                )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(sel)
    )


ORACLE_CORR_MATRIX = _corr_oracle()


# ---------------------------------------------------------------------------
# domain_blocklist
# ---------------------------------------------------------------------------

_BLOCKLIST = ("news.example.com", "example.net", "h5.example.org")


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-exploded domain blocklist matching — the scalable form
    of per-domain URL filtering.  Each host expands map-side to its
    >= 2-label dot-suffixes (a bounded explode: depth <= label count)
    and equi-joins a broadcast blocklist; an entry therefore blocks
    its whole subdomain tree.  The naive ``host LIKE '%' || domain``
    formulation cannot hash-join and rescans the blocklist per row —
    this shape is a plain BroadcastHashJoin.

    Hosts are synthesized deterministically in-query (house pattern,
    cf. ``link_extract``): docs with doc_id % 3 != 1 carry one host of
    varying label depth.
    """
    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    part = (
        F.when(doc % 4 == 0, F.lit("news.example.com"))
        .when(doc % 4 == 1, F.lit("example.com"))
        .when(doc % 4 == 2, F.lit("blog.example.net"))
        .otherwise(F.lit("example.org"))
    )
    hosts = d.where(doc % 3 != 1).select(
        "doc_id",
        F.concat(F.lit("h"), (doc % 13).cast("string"), F.lit("."), part).alias(
            "host"
        ),
    )
    labels = F.split(F.col("host"), "\\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )
    exploded = hosts.select(
        "doc_id", "host", F.explode(suffixes).alias("suffix")
    )
    bl = spark.createDataFrame([(s,) for s in _BLOCKLIST], "domain string")
    return exploded.join(
        F.broadcast(bl), exploded.suffix == bl.domain
    ).select("doc_id", "host", F.col("domain").alias("matched"))


_BL_VALUES = ", ".join(f"('{s}')" for s in _BLOCKLIST)

ORACLE_DOMAIN_BLOCKLIST = f"""
WITH hosts AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 13 AS VARCHAR) || '.' ||
         CASE doc_id % 4 WHEN 0 THEN 'news.example.com'
                         WHEN 1 THEN 'example.com'
                         WHEN 2 THEN 'blog.example.net'
                         ELSE 'example.org' END AS host
  FROM documents WHERE doc_id % 3 != 1),
expl AS (
  SELECT doc_id, host,
         array_to_string(
           list_slice(string_split(host, '.'), i,
                      len(string_split(host, '.'))), '.') AS suffix
  FROM hosts, unnest(range(1, len(string_split(host, '.')))) AS u(i)),
bl(domain) AS (VALUES {_BL_VALUES})
SELECT e.doc_id, e.host, b.domain AS matched
FROM expl e JOIN bl b ON e.suffix = b.domain
"""


# ---------------------------------------------------------------------------
# zscore_outliers
# ---------------------------------------------------------------------------

_Z_THRESH = 2.5


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier flagging over exact integer
    moment sums — the numeric-anomaly screen of a data-quality layer.

    Determinism: values quantize to integer cents; per-type n / sum /
    sum-of-squares accumulate as decimal(38,0) (exact at any scale),
    so mean and population std are IEEE arithmetic on exact integers
    and the z-scores round(,6)-match across engines.  Plan: one
    partial-agg pass builds the per-type stats (bounded key count),
    which broadcast back onto the event stream — the flagging itself
    is map-side, no second shuffle of the raw rows.
    """
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = F.floor(F.col("value") * 100 + 0.5).cast("decimal(38,0)")
    rows = ev.select("event_id", "event_type", v.alias("vc"))
    stats = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("ss"),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    mean = s / n
    std = F.sqrt((n * ss - s * s)) / n
    stats = stats.select(
        "event_type", mean.alias("mean_c"), std.alias("std_c")
    )
    z = (F.col("vc").cast("double") - F.col("mean_c")) / F.col("std_c")
    return (
        rows.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > _Z_THRESH)
        .select(
            "event_id",
            "event_type",
            F.col("vc").cast("bigint").alias("v_cents"),
            F.round(z, 6).alias("z"),
        )
    )


ORACLE_ZSCORE_OUTLIERS = f"""
WITH rows_ AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS HUGEINT) AS vc
  FROM events WHERE value IS NOT NULL),
stats AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         sum(vc) AS s,
         sum(vc * vc) AS ss
  FROM rows_ GROUP BY 1),
st AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
         sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           / CAST(n AS DOUBLE) AS std_c
  FROM stats)
SELECT r.event_id, r.event_type,
       CAST(r.vc AS BIGINT) AS v_cents,
       round((CAST(r.vc AS DOUBLE) - st.mean_c) / st.std_c, 6) AS z
FROM rows_ r JOIN st ON r.event_type = st.event_type
WHERE abs((CAST(r.vc AS DOUBLE) - st.mean_c) / st.std_c) > {_Z_THRESH}
"""


# ---------------------------------------------------------------------------
# dataset_card_stats
# ---------------------------------------------------------------------------


def q_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card summary — the numbers a published
    dataset card reports per subset: document count, distinct
    languages, total whitespace tokens, mean length, and the
    exact-duplicate footprint.

    Duplicate accounting uses the md5 content hash (identical hex on
    both engines): a doc is "dup" when its hash occurs on >= 2 docs
    corpus-wide.  Plan: one hash-count aggregation joined back onto the
    doc stream (the exact-dedup shuffle shape, partial-agg'd on both
    sides), then ONE bounded-key rollup per source.  avg_chars is the
    single float surface, computed from exact integer sums.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.greatest(
            F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")),
            F.lit(1),
        )
        .cast("bigint")
        .alias("toks"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
    )
    hc = d.groupBy("h").agg(F.count(F.lit(1)).alias("n_same"))
    return (
        d.join(hc, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias(
                "avg_chars"
            ),
            F.sum(F.when(F.col("n_same") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            "total_tokens",
            "avg_chars",
            "dup_docs",
            F.round(F.col("dup_docs") / F.col("n_docs"), 6).alias(
                "dup_ratio"
            ),
        )
    )


ORACLE_DATASET_CARD_STATS = """
WITH d AS (
  SELECT doc_id, source, lang,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(greatest(len(string_split(coalesce(text, ''), ' ')), 1)
              AS BIGINT) AS toks,
         md5(coalesce(text, '')) AS h
  FROM documents),
hc AS (SELECT h, count(*) AS n_same FROM d GROUP BY 1)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
       CAST(sum(CASE WHEN n_same >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_docs,
       round(CAST(sum(CASE WHEN n_same >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_ratio
FROM d JOIN hc USING (h)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# cross_dedup_sources
# ---------------------------------------------------------------------------


def q_cross_dedup_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-provenance matrix: how many exact-duplicate document
    PAIRS each (source_a, source_b) combination contributes — the
    forensics view that tells a curation team which feeds mirror each
    other (and which self-duplicate, the diagonal).

    Plan: per-(hash, source) counts first (partial agg collapses the
    doc stream), then a self-equi-join on the hash whose per-key
    fan-out is bounded by the source count (20), never by document
    count — the classic bounded-blocking shape.  Pair arithmetic is
    exact integers: cnt_a*cnt_b off-diagonal, C(cnt,2) on it.

    The small-SF fixture corpus has no natural exact duplicates, so a
    deterministic mirror feed is synthesized in-query (house pattern —
    cf. ``boilerplate_scrub``): every doc_id % 7 == 0 doc re-appears
    under source 'mirror' (cross-source mass) and every
    doc_id % 11 == 0 doc appears twice in its own source (diagonal
    mass).  Natural duplicates at larger SFs count identically.
    """
    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
    )
    mirror = base.where(F.col("doc_id") % 7 == 0).select(
        F.lit("mirror").alias("source"), "h"
    )
    selfdup = base.where(F.col("doc_id") % 11 == 0).select("source", "h")
    d = base.select("source", "h").unionAll(mirror).unionAll(selfdup)
    per = d.groupBy("h", "source").agg(F.count(F.lit(1)).alias("cnt"))
    a = per.select("h", F.col("source").alias("src_a"), F.col("cnt").alias("ca"))
    b = per.select("h", F.col("source").alias("src_b"), F.col("cnt").alias("cb"))
    cross = (
        a.join(b, "h")
        .where(F.col("src_a") <= F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.when(
                F.col("src_a") == F.col("src_b"),
                F.col("ca") * (F.col("ca") - 1) / 2,
            )
            .otherwise(F.col("ca") * F.col("cb"))
            .cast("bigint")
            .alias("pairs"),
        )
    )
    return (
        cross.groupBy("src_a", "src_b")
        .agg(F.sum("pairs").cast("bigint").alias("n_doc_pairs"))
        .where(F.col("n_doc_pairs") > 0)
    )


ORACLE_CROSS_DEDUP_SOURCES = """
WITH base AS (
  SELECT doc_id, source, md5(coalesce(text, '')) AS h FROM documents),
d AS (
  SELECT source, h FROM base
  UNION ALL
  SELECT 'mirror' AS source, h FROM base WHERE doc_id % 7 = 0
  UNION ALL
  SELECT source, h FROM base WHERE doc_id % 11 = 0),
per AS (SELECT h, source, count(*) AS cnt FROM d GROUP BY 1, 2),
cross_ AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(CASE WHEN a.source = b.source
                   THEN a.cnt * (a.cnt - 1) / 2
                   ELSE a.cnt * b.cnt END AS BIGINT) AS pairs
  FROM per a JOIN per b ON a.h = b.h AND a.source <= b.source)
SELECT src_a, src_b, CAST(sum(pairs) AS BIGINT) AS n_doc_pairs
FROM cross_ GROUP BY 1, 2 HAVING sum(pairs) > 0
"""


# ---------------------------------------------------------------------------
# cusum_drift — CUSUM control chart over daily means (prefix-extremum form)
# ---------------------------------------------------------------------------

_CUSUM_H = 30_000_000  # alarm threshold, micro-cent units (3x typical |dev|)


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM control chart over the daily event-value mean — the
    sequential drift monitor that fires on a SUSTAINED shift long
    before any single day looks anomalous (the complement of
    ``zscore_outliers``' pointwise test).

    The textbook recursion S⁺_t = max(0, S⁺_{t−1} + dev_t) is not a
    prefix sum — but it equals P_t − min(0, min_{j≤t} P_j) for the
    running deviation sum P, and the mirrored S⁻_t =
    max(0, max_{j≤t} P_j) − P_t, so the whole chart is TWO extra
    window functions over the same bounded frame instead of a
    sequential scan — that identity is what makes CUSUM distributable.

    Scale: the corpus collapses to per-day partial aggs first; every
    window runs over the ≤ #days frame (the ``ks_statistic`` bounded-
    frame contract), never over raw events.  Determinism: daily means
    and μ are the integer half-up division in micro-cent units; all
    chart arithmetic is exact BIGINT; the only booleans compare
    integers to the _CUSUM_H literal.
    """
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents).alias("s"), F.count("*").alias("c")
    )
    x = daily.select(
        "day", F.expr("(20000 * s + c) DIV (2 * c)").alias("x")
    )
    mu = x.groupBy().agg(
        F.expr("(2 * sum(x) + count(*)) DIV (2 * count(*))").alias("mu")
    )
    dev = x.crossJoin(F.broadcast(mu)).select(
        "day", "x", (F.col("x") - F.col("mu")).alias("dev")
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pref = dev.select(
        "day", "x", "dev", F.sum("dev").over(wd).alias("p")
    )
    chart = pref.select(
        "day",
        "x",
        "dev",
        "p",
        F.min("p").over(wd).alias("runmin"),
        F.max("p").over(wd).alias("runmax"),
    )
    return chart.select(
        "day",
        "x",
        "dev",
        (F.col("p") - F.least(F.lit(0), F.col("runmin"))).alias("cusum_pos"),
        (F.greatest(F.lit(0), F.col("runmax")) - F.col("p")).alias(
            "cusum_neg"
        ),
        (
            (F.col("p") - F.least(F.lit(0), F.col("runmin")) > _CUSUM_H)
            | (F.greatest(F.lit(0), F.col("runmax")) - F.col("p") > _CUSUM_H)
        ).alias("alarm"),
    )


ORACLE_CUSUM_DRIFT = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s,
         count(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1),
x AS (SELECT day, (20000 * s + c) // (2 * c) AS x FROM daily),
mu AS (SELECT (2 * sum(x) + count(*)) // (2 * count(*)) AS mu FROM x),
dev AS (SELECT day, x, x - mu.mu AS dev FROM x, mu),
pref AS (
  SELECT day, x, dev,
         sum(dev) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM dev),
chart AS (
  SELECT day, x, dev, p,
         min(p) OVER w AS runmin,
         max(p) OVER w AS runmax
  FROM pref
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT day, x, dev,
       p - least(0, runmin) AS cusum_pos,
       greatest(0, runmax) - p AS cusum_neg,
       (p - least(0, runmin) > {_CUSUM_H}
        OR greatest(0, runmax) - p > {_CUSUM_H}) AS alarm
FROM chart
"""


# ---------------------------------------------------------------------------
# mann_kendall — nonparametric monotone-trend test over daily means
# ---------------------------------------------------------------------------


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend statistic over the daily event-value means:
    S = Σ_{{i<j}} sgn(x_j − x_i) and Kendall's tau = S / (n(n−1)/2) —
    the standard "is this metric drifting monotonically" test, immune
    to the outliers that wreck a least-squares slope.

    Scale: the O(D²) pair comparison runs over the per-day aggregate
    frame (D = #days — a calendar, not the corpus; the same bounded-
    frame contract as ``sliding_mau``'s day spine), after the corpus
    collapses to one partial-agg groupBy.  Determinism: daily means
    are exact integer micro-cents (shared with ``cusum_drift``), sgn
    compares integers, S and the pair count are BIGINT, tau is the
    house half-up division.
    """
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents).alias("s"), F.count("*").alias("c")
    )
    x = daily.select(
        "day", F.expr("(20000 * s + c) DIV (2 * c)").alias("x")
    )
    a = x.select(F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = x.select(F.col("day").alias("d2"), F.col("x").alias("x2"))
    pairs = a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
    return (
        pairs.agg(
            F.coalesce(F.sum(F.signum(F.col("x2") - F.col("x1"))), F.lit(0.0))
            .cast("bigint")
            .alias("s_stat"),
            F.count("*").alias("n_pairs"),
        )
        .crossJoin(F.broadcast(x.groupBy().agg(F.count("*").alias("n_days"))))
        .select(
            F.col("n_days").cast("bigint").alias("n_days"),
            "s_stat",
            # half-up on |S| then re-sign: Spark DIV truncates toward
            # zero but DuckDB // floors, so negative numerators must
            # never reach the integer division
            (
                F.expr(
                    "CAST(sign(s_stat) AS BIGINT)"
                    " * ((2000000 * abs(s_stat) + nullif(n_pairs, 0))"
                    "    DIV nullif(2 * n_pairs, 0))"
                )
                / 1000000.0
            ).alias("tau"),
        )
    )


ORACLE_MANN_KENDALL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s,
         count(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1),
x AS (SELECT day, (20000 * s + c) // (2 * c) AS x FROM daily),
p AS (
  SELECT CAST(coalesce(sum(sign(b.x - a.x)), 0) AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM x a JOIN x b ON a.day < b.day),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM x)
SELECT n.n_days, p.s_stat,
       CAST(sign(p.s_stat) AS BIGINT)
         * ((2000000 * abs(p.s_stat) + nullif(p.n_pairs, 0))
            // nullif(2 * p.n_pairs, 0)) / 1000000.0 AS tau
FROM p, n
"""


# ---------------------------------------------------------------------------
# chi_square_independence — lang × length-bucket contingency test
# ---------------------------------------------------------------------------

_CHI2_BUCKET_WIDTH = 800  # n_chars bucket width; DIV keeps it exact
_CHI2_BUCKET_CAP = 4  # buckets 0..4 (top bucket open-ended)


def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² test of independence between ``lang`` and the
    ``n_chars`` length bucket — "does document length depend on
    language?", the first screen a corpus-mix report runs before
    trusting per-language length thresholds.

    χ² = Σ_cells (o−e)²/e with e = row_tot·col_tot/N, computed as the
    integer-exact rational (o·N − rt·ct)² / (N·rt·ct) per cell.  The
    full R×C grid (including zero-observed cells, which still
    contribute e) is the cross join of the two level sets — bounded by
    |langs|·|buckets|, a broadcast-sized frame.

    Scale: three partial-agg rollups of ONE groupBy(lang, bucket) scan
    (cell counts; row/col totals are rollups of the cells, never a
    second corpus pass); the grid assembly is broadcast joins over the
    R×C frame.  Determinism: numerator/denominator stay exact BIGINT
    (both < 2^63 while N·rt·ct < 9.2e18 — past ~2e6 rows per level
    rescale to sampled counts), the single IEEE division per cell is
    rounded half-up to 6 decimals on both engines, and the cell
    contributions sum as decimal(38,6) — exact and order-independent
    (the ``corr_matrix`` doctrine).
    """
    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.expr(
            f"least(CAST(n_chars AS BIGINT) DIV {_CHI2_BUCKET_WIDTH},"
            f" {_CHI2_BUCKET_CAP})"
        ).alias("b"),
    )
    cells = d.groupBy("lang", "b").agg(F.count("*").alias("o"))
    rows_ = cells.groupBy("lang").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("b").agg(F.sum("o").alias("ct"))
    tot = cells.groupBy().agg(F.sum("o").alias("n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .join(cells, ["lang", "b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "b",
            F.coalesce("o", F.lit(0)).alias("o"),
            "rt",
            "ct",
            "n",
        )
    )
    contrib = grid.select(
        F.expr(
            "CAST(round(CAST((o * n - rt * ct) * (o * n - rt * ct) AS DOUBLE)"
            " / CAST(n * rt * ct AS DOUBLE), 6) AS DECIMAL(38,6))"
        ).alias("cell"),
        F.lit(1).alias("one"),
    )
    n_levels = grid.agg(
        F.countDistinct("lang").alias("r_levels"),
        F.countDistinct("b").alias("c_levels"),
    )
    return (
        contrib.agg(
            F.count("*").alias("n_cells"),
            F.sum("cell").cast("double").alias("chi2"),
        )
        .crossJoin(F.broadcast(n_levels))
        .select(
            F.col("r_levels").cast("bigint").alias("r_levels"),
            F.col("c_levels").cast("bigint").alias("c_levels"),
            F.col("n_cells").cast("bigint").alias("n_cells"),
            ((F.col("r_levels") - 1) * (F.col("c_levels") - 1))
            .cast("bigint")
            .alias("dof"),
            "chi2",
        )
    )


ORACLE_CHI_SQUARE_INDEPENDENCE = f"""
WITH d AS (
  SELECT lang,
         least(CAST(n_chars AS BIGINT) // {_CHI2_BUCKET_WIDTH},
               {_CHI2_BUCKET_CAP}) AS b
  FROM documents),
cells AS (SELECT lang, b, count(*) AS o FROM d GROUP BY lang, b),
rows_ AS (SELECT lang, sum(o) AS rt FROM cells GROUP BY lang),
cols_ AS (SELECT b, sum(o) AS ct FROM cells GROUP BY b),
tot AS (SELECT sum(o) AS n FROM cells),
grid AS (
  SELECT rows_.lang, cols_.b, CAST(coalesce(cells.o, 0) AS BIGINT) AS o,
         CAST(rt AS BIGINT) AS rt, CAST(ct AS BIGINT) AS ct,
         CAST(n AS BIGINT) AS n
  FROM rows_ CROSS JOIN cols_
  LEFT JOIN cells ON cells.lang = rows_.lang AND cells.b = cols_.b, tot),
contrib AS (
  SELECT CAST(round(CAST((o * n - rt * ct) * (o * n - rt * ct) AS DOUBLE)
              / CAST(n * rt * ct AS DOUBLE), 6) AS DECIMAL(38,6)) AS cell
  FROM grid),
lv AS (SELECT count(DISTINCT lang) AS r_levels, count(DISTINCT b) AS c_levels
       FROM grid)
SELECT CAST(r_levels AS BIGINT) AS r_levels,
       CAST(c_levels AS BIGINT) AS c_levels,
       CAST((SELECT count(*) FROM contrib) AS BIGINT) AS n_cells,
       CAST((r_levels - 1) * (c_levels - 1) AS BIGINT) AS dof,
       CAST((SELECT sum(cell) FROM contrib) AS DOUBLE) AS chi2
FROM lv
"""


# ---------------------------------------------------------------------------
# welch_ttest — two-sample Welch's t on exact integer moment sums
# ---------------------------------------------------------------------------

_WELCH_LANG = "en"  # group A: English docs; group B: everything else


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of ``n_chars`` between English
    and non-English documents — "are these two corpus slices actually
    different?", the significance check behind every per-slice stat a
    dataset card reports.

        t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
        df = (v_a/n_a + v_b/n_b)² /
             ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

    Scale: ONE conditional partial-agg scan collects the six moment
    sums (n, Σx, Σx² per group) — the ``corr_matrix`` doctrine: exact
    decimal(38,0) integer sums, so the statistic is pure IEEE
    arithmetic on a single row of exact integers with no float
    summation order anywhere.  Determinism: both engines evaluate the
    IDENTICAL expression tree on identical doubles (every moment
    < 2^53 at any realistic corpus, so the decimal→double cast is
    exact); sqrt is IEEE-correctly-rounded on both; surfaces round
    half-up to 6.  Degenerate groups (n < 2) yield NULL via nullif.
    """
    x = F.col("n_chars").cast("decimal(38,0)")
    is_a = F.col("lang") == _WELCH_LANG
    d = _t(spark, sf_dir, "documents").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(is_a, x).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("s_a"),
        F.sum(F.when(~is_a, x).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("s_b"),
        F.sum(F.when(is_a, x * x).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("ss_a"),
        F.sum(F.when(~is_a, x * x).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("ss_b"),
    )
    # va_n / vb_n = sample-variance/n per group — the two doubles every
    # downstream term reuses, so both engines build the SAME tree
    # (no libm pow anywhere: squares are explicit products).
    mid = d.selectExpr(
        "n_a",
        "n_b",
        "CAST(s_a AS DOUBLE) / n_a AS mean_a",
        "CAST(s_b AS DOUBLE) / n_b AS mean_b",
        "(CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)"
        " / nullif(n_a - 1, 0) / n_a AS va_n",
        "(CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)"
        " / nullif(n_b - 1, 0) / n_b AS vb_n",
    )
    return mid.selectExpr(
        "n_a",
        "n_b",
        "round(mean_a, 6) AS mean_a",
        "round(mean_b, 6) AS mean_b",
        "round((mean_a - mean_b) / sqrt(va_n + vb_n), 6) AS t_stat",
        "round((va_n + vb_n) * (va_n + vb_n)"
        " / (va_n * va_n / nullif(n_a - 1, 0)"
        "  + vb_n * vb_n / nullif(n_b - 1, 0)), 6) AS welch_df",
    )


ORACLE_WELCH_TTEST = f"""
WITH m AS (
  SELECT CAST(sum(CASE WHEN lang = '{_WELCH_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN lang <> '{_WELCH_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         sum(CASE WHEN lang = '{_WELCH_LANG}'
                  THEN CAST(n_chars AS DECIMAL(38,0)) ELSE 0 END) AS s_a,
         sum(CASE WHEN lang <> '{_WELCH_LANG}'
                  THEN CAST(n_chars AS DECIMAL(38,0)) ELSE 0 END) AS s_b,
         sum(CASE WHEN lang = '{_WELCH_LANG}'
                  THEN CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))
                  ELSE 0 END) AS ss_a,
         sum(CASE WHEN lang <> '{_WELCH_LANG}'
                  THEN CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))
                  ELSE 0 END) AS ss_b
  FROM documents),
mid AS (
  SELECT n_a, n_b,
         CAST(s_a AS DOUBLE) / n_a AS mean_a,
         CAST(s_b AS DOUBLE) / n_b AS mean_b,
         (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)
           / nullif(n_a - 1, 0) / n_a AS va_n,
         (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)
           / nullif(n_b - 1, 0) / n_b AS vb_n
  FROM m)
SELECT n_a, n_b,
       round(mean_a, 6) AS mean_a,
       round(mean_b, 6) AS mean_b,
       round((mean_a - mean_b) / sqrt(va_n + vb_n), 6) AS t_stat,
       round((va_n + vb_n) * (va_n + vb_n)
             / (va_n * va_n / nullif(n_a - 1, 0)
              + vb_n * vb_n / nullif(n_b - 1, 0)), 6) AS welch_df
FROM mid
"""


# ---------------------------------------------------------------------------
# vocab_overlap — per-source-pair vocabulary Jaccard
# ---------------------------------------------------------------------------


def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary (token-type) Jaccard between every pair of sources —
    the corpus-diagnostics matrix that says which domains speak the
    same language before a mixture plan treats them as exchangeable
    (a near-zero overlap pair should not share a dedup namespace; a
    near-one pair is probably the same crawl twice).

    Scale: the corpus reduces to DISTINCT (source, token) pairs first
    (two-level distinct agg); the intersection join fans out per token
    by at most the source cardinality (bounded alphabet — the
    ``cross_dedup_sources`` shape); set sizes are rollups of the same
    distinct table.  All-integer Jaccard via the half-up division.
    """
    st = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").alias("n_types"))
    a = st.select(F.col("source").alias("src_a"), "tok")
    b = st.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_types").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_types").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.col("na").cast("bigint").alias("n_types_a"),
            F.col("nb").cast("bigint").alias("n_types_b"),
            (
                F.expr(
                    "(2000000 * n_common + (na + nb - n_common))"
                    " DIV (2 * (na + nb - n_common))"
                )
                / 1000000.0
            ).alias("jaccard"),
        )
    )


ORACLE_VOCAB_OVERLAP = """
WITH st AS (
  SELECT DISTINCT source, tok
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types
          FROM st GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT src_a, src_b, n_common,
       sa.n_types AS n_types_a, sb.n_types AS n_types_b,
       ((2000000 * n_common + (sa.n_types + sb.n_types - n_common))
        // (2 * (sa.n_types + sb.n_types - n_common))) / 1000000.0 AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
"""


# ---------------------------------------------------------------------------
# wilson_intervals — per-slice pass rate with a Wilson 95% CI
# ---------------------------------------------------------------------------

_WIL_Z = 1.96  # shared literal; z² enters as the exact double 3.8416
_WIL_PASS_CHARS = 400  # pass = document at least this long


def q_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality pass rate with a Wilson-score 95% interval —
    the per-slice metric-with-uncertainty a dataset card reports (the
    analytic companion of ``bootstrap_ci``: closed-form, per-slice,
    and honest for small slices where the normal interval lies).

        center ± z·√(p̂(1−p̂)/n + z²/4n²)  over  (1 + z²/n)

    Scale: ONE conditional partial-agg scan (n, k per source); the
    interval is row-local IEEE arithmetic on exact integers — both
    engines evaluate the identical expression tree (sqrt is
    correctly-rounded; z and z² are shared literals), surfaces rounded
    half-up to 6.
    """
    d = _t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            (F.col("n_chars") >= _WIL_PASS_CHARS).cast("bigint")
        ).alias("k"),
    )
    # cnum ± hnum over ONE shared denominator — the exact association
    # the oracle uses, so both engines build the identical IEEE tree
    z2 = _WIL_Z * _WIL_Z
    p = F.col("k") / F.col("n")
    denom = 1 + F.lit(z2) / F.col("n")
    cnum = p + F.lit(z2) / (2 * F.col("n"))
    hnum = F.lit(_WIL_Z) * F.sqrt(
        p * (1 - p) / F.col("n")
        + F.lit(z2) / (4 * F.col("n") * F.col("n"))
    )
    return d.select(
        "source",
        "n",
        "k",
        F.round(p, 6).alias("pass_rate"),
        F.round((cnum - hnum) / denom, 6).alias("wilson_lo"),
        F.round((cnum + hnum) / denom, 6).alias("wilson_hi"),
    )


ORACLE_WILSON_INTERVALS = f"""
WITH d AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN n_chars >= {_WIL_PASS_CHARS} THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM documents GROUP BY source)
SELECT source, n, k,
       round(CAST(k AS DOUBLE) / n, 6) AS pass_rate,
       round(((CAST(k AS DOUBLE) / n + {_WIL_Z * _WIL_Z} / (2 * n))
              - {_WIL_Z} * sqrt(CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n) / n
                                + {_WIL_Z * _WIL_Z} / (4 * n * n)))
             / (1 + {_WIL_Z * _WIL_Z} / n), 6) AS wilson_lo,
       round(((CAST(k AS DOUBLE) / n + {_WIL_Z * _WIL_Z} / (2 * n))
              + {_WIL_Z} * sqrt(CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n) / n
                                + {_WIL_Z * _WIL_Z} / (4 * n * n)))
             / (1 + {_WIL_Z * _WIL_Z} / n), 6) AS wilson_hi
FROM d
"""


# ---------------------------------------------------------------------------
# fighting_words — Dirichlet-prior log-odds corpus comparison
# ---------------------------------------------------------------------------

_FW_A0 = 100.0  # total prior mass (informative Dirichlet, Monroe et al.)
_FW_TOPK = 15  # strongest markers reported per side


def q_fighting_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Fightin' Words" (Monroe, Colaresi & Quinn, 2008): per-token
    z-scored log-odds-ratio with an informative Dirichlet prior between
    two corpus halves (doc_id parity — the snapshot-vs-snapshot stand-
    in) — THE principled "which words distinguish these two corpora"
    comparison (raw log-odds overweights rare words; the prior and the
    variance term fix exactly that).  Reports the _FW_TOPK strongest
    markers of each side.

        δ_w = ln((y_aw+α_w)/(n_a+α0−y_aw−α_w))
            − ln((y_bw+α_w)/(n_b+α0−y_bw−α_w));   z_w = δ_w/√(1/(y_aw+α_w)+1/(y_bw+α_w))

    with α_w = α0·y_w/n (prior ∝ the pooled distribution).

    Scale: one tokenize into a per-(token, side) partial agg; totals
    are rollups riding a 1-row broadcast; z is row-local IEEE math on
    exact integer counts; the report is two TakeOrdered top-Ks (never a
    global sort).  Determinism: ranking orders by the ROUNDED z with
    token tie-break.
    """
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            (F.col("doc_id") % 2 == 0).alias("is_a"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.col("is_a").cast("bigint")).alias("y_a"),
        F.sum((~F.col("is_a")).cast("bigint")).alias("y_b"),
    )
    tot = counts.groupBy().agg(
        F.sum("y_a").alias("n_a"), F.sum("y_b").alias("n_b")
    )
    alpha = F.lit(_FW_A0) * (F.col("y_a") + F.col("y_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    delta = F.log(
        (F.col("y_a") + alpha)
        / (F.col("n_a") + F.lit(_FW_A0) - F.col("y_a") - alpha)
    ) - F.log(
        (F.col("y_b") + alpha)
        / (F.col("n_b") + F.lit(_FW_A0) - F.col("y_b") - alpha)
    )
    z = delta / F.sqrt(
        1 / (F.col("y_a") + alpha) + 1 / (F.col("y_b") + alpha)
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(
        "tok", "y_a", "y_b", F.round(z, 6).alias("z")
    )
    top_a = scored.orderBy(F.col("z").desc(), "tok").limit(_FW_TOPK)
    top_b = scored.orderBy(F.col("z").asc(), "tok").limit(_FW_TOPK)
    return top_a.withColumn("side", F.lit("a")).unionByName(
        top_b.withColumn("side", F.lit("b"))
    )


ORACLE_FIGHTING_WORDS = f"""
WITH toks AS (
  SELECT (doc_id % 2 = 0) AS is_a, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
counts AS (
  SELECT tok,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS y_a,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS y_b
  FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(y_a) AS BIGINT) AS n_a,
               CAST(sum(y_b) AS BIGINT) AS n_b
        FROM counts),
scored AS (
  SELECT tok, y_a, y_b,
         round(
           (ln((y_a + {_FW_A0} * (y_a + y_b) / (n_a + n_b))
               / (n_a + {_FW_A0} - y_a - {_FW_A0} * (y_a + y_b) / (n_a + n_b)))
          - ln((y_b + {_FW_A0} * (y_a + y_b) / (n_a + n_b))
               / (n_b + {_FW_A0} - y_b - {_FW_A0} * (y_a + y_b) / (n_a + n_b))))
           / sqrt(1 / (y_a + {_FW_A0} * (y_a + y_b) / (n_a + n_b))
                + 1 / (y_b + {_FW_A0} * (y_a + y_b) / (n_a + n_b))), 6) AS z
  FROM counts, tot)
SELECT * FROM (
  SELECT tok, y_a, y_b, z, 'a' AS side FROM scored
  ORDER BY z DESC, tok LIMIT {_FW_TOPK})
UNION ALL
SELECT * FROM (
  SELECT tok, y_a, y_b, z, 'b' AS side FROM scored
  ORDER BY z ASC, tok LIMIT {_FW_TOPK})
"""


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# autocorr_daily — sample autocorrelation of the daily event count
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 3


def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation (lags 1..3) of the daily event count —
    the seasonality/persistence diagnostic that complements
    ``cusum_drift`` (sustained shift) and ``mann_kendall`` (monotone
    trend): a weekly-periodic ingest shows up as an acf spike, an
    i.i.d. one decays to noise.

    Exactness: with x_t the integer daily counts, n days and S = Σx,
    the mean-centered products are scaled by n —

        acf_k = Σ (n·x_t − S)(n·x_{t+k} − S) / Σ (n·x_t − S)²

    — numerator and denominator are EXACT integers (DECIMAL(38,0)
    promoted), so each acf is a single IEEE division rounded to 6.
    Pairs are calendar-adjacent (t+k literal days apart); a missing
    day breaks its pairs on both engines identically.

    Scale: the corpus collapses to per-day partial aggs first; lags
    replicate the ≤ #days frame 3× map-side, the lag join is
    day-keyed, and the two scalar aggs are 1-row broadcasts.  Raw
    events are scanned exactly once.
    """
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    daily = _q._persist_tracked(daily)
    tot = daily.groupBy().agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day", (F.col("n") * F.col("x") - F.col("s")).alias("v")
    )
    dev = _q._persist_tracked(dev)
    den = dev.groupBy().agg(F.sum(F.col("v") * F.col("v")).alias("den"))
    lagged = dev.select(
        "day", F.col("v").alias("va"),
        F.explode(F.array(*[F.lit(k) for k in range(1, _ACF_MAX_LAG + 1)])
                  ).alias("lag"),
    ).withColumn("day_b", F.date_add(F.col("day"), F.col("lag")))
    right = dev.select(F.col("day").alias("day_b"), F.col("v").alias("vb"))
    pairs = lagged.join(right, "day_b")
    num = pairs.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.col("va") * F.col("vb")).alias("num"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("acf"),
    )


ORACLE_AUTOCORR_DAILY = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS s
  FROM daily),
dev AS (SELECT day, n * x - s AS v FROM daily, tot),
den AS (SELECT sum(v * v) AS den FROM dev),
lags AS (SELECT CAST(unnest(generate_series(1, {_ACF_MAX_LAG})) AS INTEGER) AS lag),
pairs AS (
  SELECT l.lag, a.v AS va, b.v AS vb
  FROM dev a CROSS JOIN lags l
  JOIN dev b ON b.day = a.day + l.lag),
num AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs, sum(va * vb) AS num
  FROM pairs GROUP BY lag)
SELECT CAST(lag AS INT) AS lag, n_pairs,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
FROM num, den
"""


DRIFT_QUERIES = {
    "psi_drift": q_psi_drift,
    "ks_statistic": q_ks_statistic,
    "boilerplate_scrub": q_boilerplate_scrub,
    "corr_matrix": q_corr_matrix,
    "domain_blocklist": q_domain_blocklist,
    "zscore_outliers": q_zscore_outliers,
    "dataset_card_stats": q_dataset_card_stats,
    "cross_dedup_sources": q_cross_dedup_sources,
    "chi_square_independence": q_chi_square_independence,
    "welch_ttest": q_welch_ttest,
    "cusum_drift": q_cusum_drift,
    "mann_kendall": q_mann_kendall,
    "vocab_overlap": q_vocab_overlap,
    "wilson_intervals": q_wilson_intervals,
    "fighting_words": q_fighting_words,
    "autocorr_daily": q_autocorr_daily,
}

DRIFT_ORACLES = {
    "psi_drift": ORACLE_PSI_DRIFT,
    "ks_statistic": ORACLE_KS_STATISTIC,
    "boilerplate_scrub": ORACLE_BOILERPLATE_SCRUB,
    "corr_matrix": ORACLE_CORR_MATRIX,
    "domain_blocklist": ORACLE_DOMAIN_BLOCKLIST,
    "zscore_outliers": ORACLE_ZSCORE_OUTLIERS,
    "dataset_card_stats": ORACLE_DATASET_CARD_STATS,
    "cross_dedup_sources": ORACLE_CROSS_DEDUP_SOURCES,
    "chi_square_independence": ORACLE_CHI_SQUARE_INDEPENDENCE,
    "welch_ttest": ORACLE_WELCH_TTEST,
    "cusum_drift": ORACLE_CUSUM_DRIFT,
    "mann_kendall": ORACLE_MANN_KENDALL,
    "vocab_overlap": ORACLE_VOCAB_OVERLAP,
    "wilson_intervals": ORACLE_WILSON_INTERVALS,
    "fighting_words": ORACLE_FIGHTING_WORDS,
    "autocorr_daily": ORACLE_AUTOCORR_DAILY,
}

_q.QUERIES.update(DRIFT_QUERIES)
_q.ORACLES.update(DRIFT_ORACLES)
