"""Corpus/table maintenance catalog, round 4 (wave 7) — three operators
the housekeeping side of a pretraining-data platform runs:

* ``line_dedup`` — C4-style cross-corpus line-level deduplication
  (Raffel et al. 2020, §2.2: drop any "line" occurring more than a
  threshold number of times in the whole corpus, keep the documents).
  The fixture corpus is single-line word soup, so "lines" are
  deterministic 3-word chunks (the same role C4's newline-split lines
  play); the distributed shape is the real one: map-side chunking →
  one partial-agg count over chunks → the over-threshold blocklist
  joined back → per-document reassembly in original chunk order.
* ``compaction_plan`` — small-file compaction (bin-packing) planning,
  the core Iceberg/Delta table-maintenance action: given a data-file
  inventory (synthesized per (day, event_type) from the events table),
  assign files to target-size output bins per partition via a
  cumulative-bytes window — the sequential greedy pack a rewrite job
  executes.
* ``shard_interleave`` — deterministic training-order assignment
  interleaving the corpus round-robin across sources WITHOUT a global
  sort: rank within source (a partitioned window), then
  ``pos = rank * n_sources + source_index``.  The standard way a data
  loader gets a stable, source-balanced epoch order at 10^12 rows —
  emitting order as a column, never materializing a total order.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_maintenance.py.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  ``line_dedup`` complements the document-level
dedup family (``dedup_exact`` .. ``dedup_keep_canonical``) at the
sub-document granularity C4 actually used; ``compaction_plan`` extends
the warehouse family (``merge_upsert``, ``snapshot_diff``,
``zorder_cluster``); ``shard_interleave`` extends training assembly
(``pack_sequences``, ``mix_apply_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------

_LD_K = 3  # words per "line" chunk (C4 splits on newline; the fixture
#            corpus is single-line, so fixed-width word windows stand in)
_LD_MAX_FREQ = 4  # keep a chunk iff its corpus-wide frequency <= 4


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-dedup over documents: chunks whose corpus frequency
    exceeds ``_LD_MAX_FREQ`` are dropped from every document; surviving
    chunks reassemble in original order.

    Scale shape (the one that matters at 10^12 lines):

    1. chunking is pure map-side array math on the scanned row;
    2. the frequency pass is ONE partial-agg groupBy on the chunk text
       (map-side combine collapses within-partition repeats first);
    3. only the OVER-threshold chunks survive the ``HAVING`` — the
       blocklist is bounded by total_lines / threshold and in practice
       is the tiny head of the line-frequency distribution, so the join
       back is a broadcast under AQE (no hint needed; if a pathological
       corpus ever overflows the broadcast budget the same plan degrades
       to a shuffled hash join, semantics unchanged);
    4. reassembly is one groupBy(doc_id) with an order-restoring
       array_sort over (pos, chunk) structs — within-group sort, never
       a global one.  Documents whose every chunk is dropped remain in
       the output with empty text, as C4 keeps (then length-filters)
       them.
    """
    d = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(arr) / _LD_K).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(F.slice(arr, i * _LD_K + 1, _LD_K), " "),
    )
    # persisted: the frequency rollup and the join back both read the
    # chunk stream — unpersisted each re-ran the chunking explode; the
    # _spread puts the heavy array math on all cores locally (no-op at
    # scale — guide §2.5)
    base = _q._persist_tracked(
        _q._spread(d.select("doc_id", "text")).select(
            "doc_id", F.posexplode(chunks).alias("pos", "chunk")
        )
    )
    hot = (
        base.groupBy("chunk")
        .count()
        .where(F.col("count") > _LD_MAX_FREQ)
        .select("chunk", F.lit(1).alias("is_hot"))
    )
    kept = base.join(hot, "chunk", "left")
    keep_struct = F.when(
        F.col("is_hot").isNull(), F.struct(F.col("pos"), F.col("chunk"))
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(keep_struct)), lambda x: x["chunk"]
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").cast("int").alias("n_total"),
            F.sum(F.when(F.col("is_hot").isNotNull(), 1).otherwise(0))
            .cast("int")
            .alias("n_removed"),
        )
    )


ORACLE_LINE_DEDUP = f"""
WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(a[(i*{_LD_K}+1):(i*{_LD_K}+{_LD_K})], ' ') AS chunk
  FROM arr, unnest(range(CAST(ceil(len(a)/{_LD_K}.0) AS BIGINT))) AS t(i)),
hot AS (SELECT chunk FROM chunks GROUP BY chunk HAVING count(*) > {_LD_MAX_FREQ}),
kept AS (SELECT c.doc_id, c.pos, c.chunk, h.chunk IS NOT NULL AS is_hot
         FROM chunks c LEFT JOIN hot h USING (chunk))
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT is_hot THEN chunk END, ' '
                           ORDER BY pos), '') AS clean_text,
       CAST(count(*) AS INT) AS n_total,
       CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS INT) AS n_removed
FROM kept GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------

_CP_TARGET_BYTES = 512  # output-bin target (scaled to the fixture; the
#                         production value is e.g. 512 MiB — only the
#                         constant changes, the plan shape is identical)
_CP_ROW_OVERHEAD = 24  # per-row fixed cost in the synthetic file sizes


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: synthesize the data-file
    inventory (one "file" per (day partition, event_type) with
    bytes = sum(len(props)) + row overhead), then assign each file to a
    target-size output bin with the sequential greedy rule
    ``bin = floor(cumulative_bytes_before_this_file / target)`` —
    exactly what an Iceberg ``rewrite_data_files`` binpack planner
    computes before launching the rewrite.

    Scale: the inventory agg is one partial-agg groupBy; the window is
    partitioned by the table partition (never global) and each
    partition's file list is metadata-sized (thousands of files), not
    data-sized — the plan runs on the manifest scale even when the
    table is 100 TB.
    """
    e = _t(spark, sf_dir, "events")
    files = e.groupBy(
        F.to_date("ts").alias("part_day"), F.col("event_type").alias("file_key")
    ).agg(
        F.count("*").cast("int").alias("n_rows"),
        F.sum(F.length("props") + F.lit(_CP_ROW_OVERHEAD)).alias("bytes"),
    )
    w = (
        Window.partitionBy("part_day")
        .orderBy("file_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("bytes").over(w), F.lit(0))
    return files.select(
        "part_day",
        "file_key",
        "n_rows",
        F.col("bytes").cast("bigint").alias("bytes"),
        F.floor(cum_before / _CP_TARGET_BYTES).cast("int").alias("bin_id"),
    )


ORACLE_COMPACTION_PLAN = f"""
WITH files AS (
  SELECT CAST(ts AS DATE) AS part_day, event_type AS file_key,
         CAST(count(*) AS INT) AS n_rows,
         CAST(sum(length(props) + {_CP_ROW_OVERHEAD}) AS BIGINT) AS bytes
  FROM events GROUP BY 1, 2)
SELECT part_day, file_key, n_rows, bytes,
       CAST(floor(coalesce(sum(bytes) OVER (
              PARTITION BY part_day ORDER BY file_key
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {_CP_TARGET_BYTES}.0) AS INT) AS bin_id
FROM files
"""

# ---------------------------------------------------------------------------
# shard_interleave
# ---------------------------------------------------------------------------

# level-1 bucket count for the two-level per-source rank: bounded
# (so the prefix table broadcasts at |sources| x buckets rows) while
# keeping level-2 partitions at n/buckets rows each
_SI_BUCKETS = 4096


def q_shard_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order: rank documents
    within each source, then
    ``train_pos = shard_rank * n_sources + source_index``.  The
    positions form a total order that round-robins across sources —
    what an epoch scheduler needs — but the order exists only as a
    column; nothing is ever globally sorted or single-tasked.

    The per-source rank is the two-level decomposition (score_deciles /
    epoch_shuffle house pattern): source cardinality is FIXED by the
    corpus model, so a window partitioned solely by source funnels
    n/|sources| rows through one task's sort (VERDICT r5 "What's
    wrong" #1).  Level 1 buckets doc_id into ``_SI_BUCKETS`` ordered
    ranges (width from a 1-row max broadcast — doc_id itself is
    unbounded, so the bounded first level is a monotone bucket, not the
    value); per-(source, bucket) counts prefix-sum over a bounded
    window.  Level 2 is row_number within (source, bucket) — parallel
    across sources × buckets.

    ``n_sources`` rides a 1-row broadcast cross join (the house pattern
    for corpus-level scalars); the source index is parsed from the
    source name, not ranked, so no second global structure is needed.
    """
    d0 = _t(spark, sf_dir, "documents")
    mx = d0.agg(F.max("doc_id").cast("bigint").alias("mx"))
    d = d0.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "source",
        F.expr(f"CAST(doc_id DIV (mx DIV {_SI_BUCKETS} + 1) AS INT)").alias(
            "bk"
        ),
    )
    vcounts = d.groupBy("source", "bk").agg(F.count("*").alias("c"))
    wv = Window.partitionBy("source").orderBy("bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = vcounts.select(
        "source", "bk", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("p")
    )
    wr = Window.partitionBy("source", "bk").orderBy("doc_id")
    s = d.join(F.broadcast(prefix), ["source", "bk"]).select(
        "doc_id",
        "source",
        (F.col("p") + F.row_number().over(wr) - 1).cast("int").alias(
            "shard_rank"
        ),
        F.regexp_replace("source", "^src", "").cast("int").alias("src_idx"),
    )
    ns = d0.select(F.countDistinct("source").alias("ns"))
    return s.crossJoin(ns).select(
        "doc_id",
        "source",
        "shard_rank",
        (F.col("shard_rank").cast("bigint") * F.col("ns") + F.col("src_idx"))
        .cast("bigint")
        .alias("train_pos"),
    )


ORACLE_SHARD_INTERLEAVE = """
WITH s AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
              AS INT) AS shard_rank,
         CAST(replace(source, 'src', '') AS INT) AS src_idx
  FROM documents),
ns AS (SELECT count(DISTINCT source) AS n FROM documents)
SELECT doc_id, source, shard_rank,
       CAST(CAST(shard_rank AS BIGINT) * n + src_idx AS BIGINT) AS train_pos
FROM s, ns
"""

# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

MAINTENANCE_QUERIES = {
    "line_dedup": q_line_dedup,
    "compaction_plan": q_compaction_plan,
    "shard_interleave": q_shard_interleave,
}
MAINTENANCE_ORACLES = {
    "line_dedup": ORACLE_LINE_DEDUP,
    "compaction_plan": ORACLE_COMPACTION_PLAN,
    "shard_interleave": ORACLE_SHARD_INTERLEAVE,
}
_q.QUERIES.update(MAINTENANCE_QUERIES)
_q.ORACLES.update(MAINTENANCE_ORACLES)
