"""Transcript-structure catalog, round 3 (session 4): the operators
that act on the CONVERSATION shape itself — the (conv_id, turn_idx,
role, text, tool) table the north rule names as the engine's input.

Three entries:

* ``turn_structure_qa`` — per-conversation structural quality gate
  (role-alternation runs, turn-index contiguity, tool-call mix): the
  transcript analog of the Gopher-style document gates in
  queries_pipeline, and the filter an agent-transcript corpus runs
  before training (malformed multi-turn structure poisons chat
  fine-tunes the way boilerplate poisons pretraining).
* ``context_windows`` — sliding chat-history packing: each turn paired
  with its previous-k turns as training context, the turn->example
  expansion every SFT pipeline performs.
* ``link_extract`` — URL extraction + host-level stats over raw turn
  payloads: the domain-mix signal web-scale curation weights by
  (sibling of domain_mix_weights, which starts from a pre-extracted
  source column).

House contract: transcripts synthesize deterministically from the
documents table (conv_id = doc_id // 10, turn_idx = doc_id % 10 — the
same wrapping as q_extract_transcripts, queries.py:2285), the Spark
plan is the 100 TB design, and a DuckDB oracle replays the exact
semantics for the value-hash gate.  Self-registers into
queries.QUERIES / queries.ORACLES on import (same pattern as
queries_ext / queries_pipeline / queries_scale / queries_curation).

Reference parity: the reference engine is per-document; conversation
structure is the cross-turn layer the north rule adds on top
(multi-turn agent transcripts).  Reading-order restoration inside one
page is reference behavior (postprocess.py sort); turn-order-dependent
windows here are its conversation-level analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# Deterministic transcript synthesis (shared by all three entries)
# ---------------------------------------------------------------------------
#
# Roles alternate user/assistant by turn parity, with an injected
# violation class (doc_id % 17 == 3 forces 'assistant') so role-run
# detection has real work; doc_id % 23 == 5 turns are DROPPED so
# turn-index contiguity has real gaps; tool calls attach to a subset of
# assistant turns.  The oracle CTE mirrors every branch.

_DROP_MOD, _DROP_VAL = 23, 5
_VIOL_MOD, _VIOL_VAL = 17, 3


def _turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _DROP_MOD != _DROP_VAL
    )
    role = (
        F.when(F.col("doc_id") % _VIOL_MOD == _VIOL_VAL, F.lit("assistant"))
        .when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    t = d.select(
        F.concat(
            F.lit("conv-"), (F.col("doc_id") / 10).cast("bigint").cast("string")
        ).alias("conv_id"),
        (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
        role.alias("role"),
        "doc_id",
        "text",
    )
    tool = (
        F.when(
            (F.col("role") == "assistant") & (F.col("doc_id") % 7 == 0),
            F.lit("search"),
        )
        .when(
            (F.col("role") == "assistant") & (F.col("doc_id") % 7 == 3),
            F.lit("code"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return t.withColumn("tool", tool)


_ORACLE_TURNS = f"""
  SELECT 'conv-' || CAST(doc_id // 10 AS VARCHAR) AS conv_id,
         CAST(doc_id % 10 AS INT) AS turn_idx,
         CASE WHEN doc_id % {_VIOL_MOD} = {_VIOL_VAL} THEN 'assistant'
              WHEN doc_id % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role,
         doc_id, text
  FROM documents
  WHERE doc_id % {_DROP_MOD} <> {_DROP_VAL}
"""

_ORACLE_TURNS_TOOL = f"""
  SELECT *,
         CASE WHEN role = 'assistant' AND doc_id % 7 = 0 THEN 'search'
              WHEN role = 'assistant' AND doc_id % 7 = 3 THEN 'code'
         END AS tool
  FROM ({_ORACLE_TURNS})
"""


# ---------------------------------------------------------------------------
# Per-conversation structural QA gate
# ---------------------------------------------------------------------------


def q_turn_structure_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation transcript-structure audit: turn counts, role
    balance, the longest same-role run (role-alternation violations),
    tool-call turns, and turn-index contiguity (dropped/missing turns).

    Plan: ONE exchange total.  The lag/running-sum windows hash-
    partition on conv_id; the (conv_id, run_id) run-length aggregation
    and the final per-conv rollup both reuse that partitioning
    (hashpartitioning(conv) serves any clustering keyed on a superset
    — the repetition_ratio house pattern).  Run detection is the
    standard gaps-and-islands running sum, O(1) state per row; nothing
    row-scaled shuffles twice.  At 100 TB the input would already be
    Iceberg-bucketed by hash(conv_id) (the north rule's layout), making
    even this one exchange a local sort.
    """
    t = _turns(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    new_run = F.when(prev.isNull() | (prev != F.col("role")), 1).otherwise(0)
    runs = t.withColumn("run_id", F.sum(new_run).over(w))
    per_run = runs.groupBy("conv_id", "run_id").agg(
        F.count("*").alias("run_len"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_t"),
        F.max("turn_idx").alias("mx"),
    )
    return per_run.groupBy("conv_id").agg(
        F.sum("run_len").cast("int").alias("n_turns"),
        F.sum("n_a").cast("int").alias("n_assistant"),
        F.sum("n_t").cast("int").alias("tool_turns"),
        F.max("run_len").cast("int").alias("max_role_run"),
        F.count("*").cast("int").alias("n_runs"),
        (F.max("mx") == F.sum("run_len") - 1).alias("contiguous"),
    )


ORACLE_TURN_STRUCTURE_QA = f"""
WITH t AS ({_ORACLE_TURNS_TOOL}),
r AS (
  SELECT conv_id, turn_idx, role, tool,
         CASE WHEN lag(role) OVER w IS NULL
                   OR lag(role) OVER w <> role THEN 1 ELSE 0 END AS new_run
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
runs AS (
  SELECT *, sum(new_run) OVER
           (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM r),
per_run AS (
  SELECT conv_id, run_id, count(*) AS run_len,
         sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS n_t,
         max(turn_idx) AS mx
  FROM runs GROUP BY conv_id, run_id)
SELECT conv_id,
       CAST(sum(run_len) AS INT) AS n_turns,
       CAST(sum(n_a) AS INT) AS n_assistant,
       CAST(sum(n_t) AS INT) AS tool_turns,
       CAST(max(run_len) AS INT) AS max_role_run,
       CAST(count(*) AS INT) AS n_runs,
       (max(mx) = sum(run_len) - 1) AS contiguous
FROM per_run GROUP BY conv_id
"""


# ---------------------------------------------------------------------------
# Sliding chat-history packing (turn -> training example)
# ---------------------------------------------------------------------------

_CTX_TURNS = 3  # previous turns packed as context


def q_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-history packing: every turn becomes a training example
    (context = the previous ``_CTX_TURNS`` turns joined by newline,
    target = the turn itself) — the turn->example expansion an SFT
    pipeline runs over extracted transcripts.

    Plan: ONE exchange (the conv_id window partition); the sliding
    frame is ``collect_list OVER (ROWS BETWEEN 3 PRECEDING AND 1
    PRECEDING)``, so each turn's text crosses the wire exactly ONCE
    and the k-fold context duplication happens inside the sorted
    window operator — the self-join formulation (turns x offsets)
    would shuffle k x the bytes to build the same frames.  First turns
    get an empty context (empty frame -> empty array -> ''), the empty
    guard R1's conversation-level analog.
    """
    t = _turns(spark, sf_dir)
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-_CTX_TURNS, -1)
    )
    ctx = F.collect_list("text").over(w)
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        F.size(ctx).cast("int").alias("n_context"),
        F.array_join(ctx, "\n").alias("context"),
        F.col("text").alias("target"),
    )


ORACLE_CONTEXT_WINDOWS = f"""
WITH t AS ({_ORACLE_TURNS})
SELECT conv_id, turn_idx, role,
       CAST(count(*) OVER w AS INT) AS n_context,
       coalesce(string_agg(text, chr(10)) OVER w, '') AS context,
       text AS target
FROM t
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN {_CTX_TURNS} PRECEDING AND 1 PRECEDING)
"""


# ---------------------------------------------------------------------------
# URL extraction + host-level stats
# ---------------------------------------------------------------------------

_URL_RE = "https?://[^ ]+"       # corpus is single-spaced ASCII: ' ' ends a URL
_HOST_RE = "https?://([^/ ]+)"   # capture group 1 = host


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-host stats over raw turn payloads: the
    outlink/domain signal web curation pipelines weight and filter by
    (host allowlists, per-domain caps).  Payloads embed zero, one, or
    two synthetic URLs (doc_id % 3 == 1 -> none; doc_id % 6 == 0 -> a
    second host), so the extractor's empty / multi-match paths are
    both exercised.

    Plan: regex extract-all + explode are pure map-side (codegen'd JVM
    regex, no Python); the per-host rollup is a bounded-key partial
    agg.  The exact distinct-doc count adds the standard two-phase
    Expand exchange on (host, doc_id) — map-side partial dedup bounds
    it at one row per (host, doc, partition); at 100 TB swap
    ``approx_count_distinct`` (the approx_distinct contract-check
    pattern) to make the whole rollup 1-row-mergeable.
    """
    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    url1 = F.concat(
        F.lit("https://h"),
        (doc % 13).cast("string"),
        F.lit(".example.com/p"),
        doc.cast("string"),
    )
    payload = F.when(doc % 3 == 1, F.col("text")).otherwise(
        F.concat(F.lit("see "), url1, F.lit(" "), F.col("text"))
    )
    payload = F.when(
        doc % 6 == 0,
        F.concat(
            payload,
            F.lit(" https://h"),
            ((doc + 1) % 13).cast("string"),
            F.lit(".example.com/x"),
        ),
    ).otherwise(payload)
    urls = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(payload.alias("p"), F.lit(_URL_RE), 0)
        ).alias("url"),
    )
    return (
        urls.select(
            "doc_id", F.regexp_extract("url", _HOST_RE, 1).alias("host")
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("int").alias("n_urls"),
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
        )
    )


ORACLE_LINK_EXTRACT = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 1 THEN text
              ELSE 'see https://h' || CAST(doc_id % 13 AS VARCHAR)
                   || '.example.com/p' || CAST(doc_id AS VARCHAR)
                   || ' ' || text END AS payload0
  FROM documents),
p2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0
              THEN payload0 || ' https://h'
                   || CAST((doc_id + 1) % 13 AS VARCHAR) || '.example.com/x'
              ELSE payload0 END AS payload
  FROM p),
u AS (
  SELECT doc_id, unnest(regexp_extract_all(payload, '{_URL_RE}')) AS url
  FROM p2)
SELECT regexp_extract(url, '{_HOST_RE}', 1) AS host,
       CAST(count(*) AS INT) AS n_urls,
       CAST(count(DISTINCT doc_id) AS INT) AS n_docs
FROM u GROUP BY host
"""


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk, shard-parallel)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 128   # tokens per packed training sequence
_PACK_SHARD = 100    # docs per independent packing shard


def q_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARD-LOCAL concat-and-chunk sequence packing: documents are laid
    end-to-end in doc_id order WITHIN each shard and cut into fixed
    token-budget packs; a doc belongs to the pack its first token lands
    in.  Emits the per-doc placement (pack index + token offset inside
    the pack) — the doc->sequence assignment a pretraining tokenizer job
    materializes.  Companion of ``pack_sequences`` (queries_pipeline.py),
    which keeps GLOBAL pack semantics via a two-level distributed prefix
    sum; this entry is the other production shape — each input split
    packs independently and pack ids are namespaced by shard.

    Plan: packing is SHARDED (``doc_id // _PACK_SHARD``), so the running
    token sum is a per-shard window — ONE exchange on shard, and every
    shard packs independently.  That is the 100 TB design, not a test
    shortcut: a global cumsum is a single-partition window (one executor
    owns the corpus), while per-shard packing is how production packers
    actually run — each input split packs locally and only pack *ids*
    are namespaced by shard.  Waste is bounded by one doc per pack
    boundary per shard, amortized to ~0 at real shard sizes.
    """
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.floor(F.col("doc_id") / _PACK_SHARD).cast("bigint").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / _PACK_BUDGET).cast("int").alias("pack_in_shard"),
        (start % _PACK_BUDGET).cast("int").alias("offset_in_pack"),
    )


ORACLE_PACK_SEQUENCES_SHARDED = f"""
WITH t AS (
  SELECT doc_id, doc_id // {_PACK_SHARD} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
            - n_tokens AS start
  FROM t)
SELECT doc_id, shard, n_tokens,
       CAST(start // {_PACK_BUDGET} AS INT) AS pack_in_shard,
       CAST(start % {_PACK_BUDGET} AS INT) AS offset_in_pack
FROM c
"""


# ---------------------------------------------------------------------------
# SFT loss-mask spans over packed chat examples
# ---------------------------------------------------------------------------


def q_loss_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss masking for SFT: for every assistant turn's training example
    (context = previous ``_CTX_TURNS`` turns + newline, target = the
    turn), emit the character span of the target inside the packed
    example — the [mask_start, mask_end) range whose tokens carry loss
    while the context is masked out.  Companion of q_context_windows:
    same packing, the supervision-span view of it.

    Plan: identical single conv_id window exchange as context_windows;
    the span arithmetic is pure map-side length algebra on top, and the
    assistant-only filter drops user rows after the window (it cannot
    push below it — the context needs every turn).
    """
    t = _turns(spark, sf_dir)
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-_CTX_TURNS, -1)
    )
    ctx = F.array_join(F.collect_list("text").over(w), "\n")
    r = t.select("conv_id", "turn_idx", "role", ctx.alias("ctx"), "text")
    mask_start = F.when(F.col("ctx") == "", F.lit(0)).otherwise(
        F.length("ctx") + 1
    )
    example_len = mask_start + F.length("text")
    return r.where(F.col("role") == "assistant").select(
        "conv_id",
        "turn_idx",
        example_len.cast("int").alias("example_len"),
        mask_start.cast("int").alias("mask_start"),
        example_len.cast("int").alias("mask_end"),
        F.round(F.length("text") / example_len.cast("double"), 6).alias(
            "mask_frac"
        ),
    )


ORACLE_LOSS_MASK_SPANS = f"""
WITH t AS ({_ORACLE_TURNS}),
c AS (
  SELECT conv_id, turn_idx, role, text,
         coalesce(string_agg(text, chr(10)) OVER w, '') AS ctx
  FROM t
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN {_CTX_TURNS} PRECEDING AND 1 PRECEDING))
SELECT conv_id, turn_idx,
       CAST(ms + length(text) AS INT) AS example_len,
       CAST(ms AS INT) AS mask_start,
       CAST(ms + length(text) AS INT) AS mask_end,
       round(length(text) / CAST(ms + length(text) AS DOUBLE), 6) AS mask_frac
FROM (SELECT *, CASE WHEN ctx = '' THEN 0 ELSE length(ctx) + 1 END AS ms
      FROM c)
WHERE role = 'assistant'
"""


# ---------------------------------------------------------------------------
# Tool-transition matrix (agent behavior analytics)
# ---------------------------------------------------------------------------


def q_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts between consecutive conversation
    steps (user / assistant / tool:search / tool:code): the Markov view
    of agent behavior — which tool follows which role, how often runs
    repeat — that transcript analytics dashboards aggregate.

    Plan: the step label is a map-side CASE; lag rides ONE conv_id
    window exchange; the final rollup keys on the (tiny, bounded)
    label-pair space, so its exchange moves at most |labels|^2 rows per
    partition after partial aggregation.
    """
    t = _turns(spark, sf_dir)
    step = F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("tool:"), F.col("tool"))
    ).otherwise(F.col("role"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    s = (
        t.select("conv_id", "turn_idx", step.alias("step"))
        .withColumn("prev", F.lag("step").over(w))
        .where(F.col("prev").isNotNull())
    )
    return s.groupBy("prev", "step").agg(
        F.count("*").cast("int").alias("n"),
        F.countDistinct("conv_id").cast("int").alias("n_convs"),
    )


ORACLE_TOOL_TRANSITIONS = f"""
WITH t AS ({_ORACLE_TURNS_TOOL}),
s AS (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 'tool:' || tool ELSE role END AS step
  FROM t),
l AS (
  SELECT conv_id, step,
         lag(step) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM s)
SELECT prev, step, CAST(count(*) AS INT) AS n,
       CAST(count(DISTINCT conv_id) AS INT) AS n_convs
FROM l WHERE prev IS NOT NULL
GROUP BY prev, step
"""


# ---------------------------------------------------------------------------
# Conversation-level exact dedup (ordered-digest)
# ---------------------------------------------------------------------------

_CONV_KEY_MOD = 7  # content-canonicalization stand-in (forces collisions)


def q_conversation_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-conversation exact dedup: a conversation's identity is the
    md5 of its turn contents IN TURN ORDER, so two transcripts dedupe
    only if they are the same dialogue, not the same bag of turns.  The
    per-turn content key is ``doc_id % 7`` — a canonicalization stand-in
    (production uses the normalized turn text) chosen so the synthetic
    corpus actually contains duplicate conversations (convs collide by
    ``conv % 7``).

    Plan: the order-sensitive digest is ``array_sort(collect_list(
    struct(turn_idx, val)))`` inside ONE per-conv aggregation — state
    bounded by turns-per-conversation, order restored in-memory per
    group rather than via a sort exchange; the digest rollup then keys
    on the (collapsed) digest space.  Two exchanges total, both after
    partial aggregation.  This is dedup_exact lifted from document to
    conversation granularity — the transcript-corpus layer of the dedup
    family.
    """
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        F.floor(F.col("doc_id") / 10).cast("bigint").alias("conv"),
        (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
        (F.col("doc_id") % _CONV_KEY_MOD).cast("int").alias("val"),
    )
    per_conv = t.groupBy("conv").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "val"))),
                    lambda s: s["val"].cast("string"),
                ),
                ",",
            )
        ).alias("digest")
    )
    return per_conv.groupBy("digest").agg(
        F.count("*").cast("int").alias("n_convs"),
        F.min("conv").alias("canonical_conv"),
        (F.count("*") - 1).cast("int").alias("n_dups"),
    )


ORACLE_CONVERSATION_DEDUP = f"""
WITH t AS (
  SELECT doc_id // 10 AS conv, CAST(doc_id % 10 AS INT) AS turn_idx,
         CAST(doc_id % {_CONV_KEY_MOD} AS INT) AS val
  FROM documents),
p AS (
  SELECT conv,
         md5(string_agg(CAST(val AS VARCHAR), ',' ORDER BY turn_idx)) AS digest
  FROM t GROUP BY conv)
SELECT digest, CAST(count(*) AS INT) AS n_convs,
       min(conv) AS canonical_conv,
       CAST(count(*) - 1 AS INT) AS n_dups
FROM p GROUP BY digest
"""


# ---------------------------------------------------------------------------
# Adjacent same-role turn merging
# ---------------------------------------------------------------------------


def q_merge_adjacent_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge runs of consecutive same-role turns into one normalized
    turn — the transcript canonicalization every SFT pipeline applies
    before templating (chat formats require strict role alternation;
    the synthesis's doc_id % 17 == 3 violation class guarantees real
    multi-turn runs to merge).  Emits one row per merged run: run
    position, role, how many raw turns merged, the first raw turn
    index, and the digest of the '\\n'-joined text in turn order.

    Plan: ONE exchange.  The lag/running-sum windows hash-partition on
    conv_id and the (conv_id, run_id) aggregation reuses that
    partitioning (the turn_structure_qa house pattern).  In-run text
    order is pinned JVM-side by sort_array over (turn_idx, text)
    structs — no collect_list ordering assumption, no Python.  At
    100 TB this runs bucket-local on the Iceberg hash(conv_id) layout
    the north rule mandates.
    """
    t = _turns(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    new_run = F.when(prev.isNull() | (prev != F.col("role")), 1).otherwise(0)
    runs = t.withColumn("run_id", F.sum(new_run).over(w))
    merged_text = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
            lambda s: s["text"],
        ),
        "\n",
    )
    return runs.groupBy("conv_id", "run_id", "role").agg(
        F.count("*").cast("int").alias("n_merged"),
        F.min("turn_idx").cast("int").alias("first_idx"),
        F.md5(merged_text).alias("merged_digest"),
    ).withColumn("run_id", F.col("run_id").cast("int"))


ORACLE_MERGE_ADJACENT_TURNS = f"""
WITH t AS ({_ORACLE_TURNS}),
r AS (
  SELECT *,
         CASE WHEN lag(role) OVER w IS NULL
                   OR lag(role) OVER w <> role THEN 1 ELSE 0 END AS nr
  FROM t
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
runs AS (
  SELECT *,
         sum(nr) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM r)
SELECT conv_id, CAST(run_id AS INT) AS run_id, role,
       CAST(count(*) AS INT) AS n_merged,
       CAST(min(turn_idx) AS INT) AS first_idx,
       md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS merged_digest
FROM runs GROUP BY conv_id, run_id, role
"""


# ---------------------------------------------------------------------------
# agent_loop_detect — same-tool re-invocation profile per conversation
# ---------------------------------------------------------------------------

_ALD_LOOP_GAP = 7  # a revisit within <= this many turns counts as loopy


def q_agent_loop_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool re-invocation profile per (conversation, tool): how often an
    agent calls the same tool again, and how tightly — the
    loop-detection signal an agent-transcript curation pass gates on
    (an assistant stuck re-running ``search`` every few turns is
    low-quality training data the way repeated n-grams are in plain
    text, cf. ``repetition_ratio``).

    For every (conv_id, tool) with >= 1 call: call count, first/last
    turn, the MINIMUM turn gap between consecutive calls of that tool
    (NULL when called once), and ``is_loopy`` — a revisit within
    _ALD_LOOP_GAP turns.

    Scale: the gap is a lag window partitioned by (conv_id, tool) and
    ordered by turn_idx — bounded per-conversation frames,
    hash-partitioned on the same conv_id key every transcript op
    shuffles on (one exchange serves the whole family); the profile is
    one partial-agg groupBy of those frames.  No global window, no
    self-join.
    """
    t = _turns(spark, sf_dir).where(F.col("tool").isNotNull())
    w = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    gapped = t.select(
        "conv_id",
        "tool",
        "turn_idx",
        (F.col("turn_idx") - F.lag("turn_idx").over(w)).alias("gap"),
    )
    return gapped.groupBy("conv_id", "tool").agg(
        F.count("*").cast("bigint").alias("n_calls"),
        F.min("turn_idx").cast("int").alias("first_turn"),
        F.max("turn_idx").cast("int").alias("last_turn"),
        F.min("gap").cast("int").alias("min_gap"),
        F.coalesce(F.min("gap") <= _ALD_LOOP_GAP, F.lit(False)).alias(
            "is_loopy"
        ),
    )


ORACLE_AGENT_LOOP_DETECT = f"""
WITH t AS ({_ORACLE_TURNS_TOOL}),
gapped AS (
  SELECT conv_id, tool, turn_idx,
         turn_idx - lag(turn_idx) OVER (PARTITION BY conv_id, tool
                                        ORDER BY turn_idx) AS gap
  FROM t WHERE tool IS NOT NULL)
SELECT conv_id, tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(min(turn_idx) AS INT) AS first_turn,
       CAST(max(turn_idx) AS INT) AS last_turn,
       CAST(min(gap) AS INT) AS min_gap,
       coalesce(min(gap) <= {_ALD_LOOP_GAP}, FALSE) AS is_loopy
FROM gapped GROUP BY conv_id, tool
"""


# ---------------------------------------------------------------------------
# turn_take_entropy — role-transition entropy per conversation
# ---------------------------------------------------------------------------


def q_turn_take_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation Shannon entropy of the role-transition bigram
    distribution (user→assistant, assistant→assistant, ...) — the
    turn-taking balance signal: a healthy dialogue alternates (high
    entropy over its transition types), a monologue or a stuck agent
    collapses to one repeated transition (entropy → 0).

    Entropy uses the exact-integer form of ``token_entropy``:
    H = ln N − (Σ c·ln c) / N with every count a BIGINT and each ln
    taken of an exact integer, rounded at the surface only.  The
    transition alphabet is ≤ |roles|² per conversation, so the inner
    agg is bounded-key.

    Scale: one shuffle on conv_id for the lead() window (bounded
    turns per conversation — the reading_order contract), then two
    bounded-key partial aggs.  Nothing global, nothing collected.
    """
    t = _turns(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    trans = (
        t.select("conv_id", "turn_idx", "role")
        .withColumn("to_role", F.lead("role").over(w))
        .where(F.col("to_role").isNotNull())
        .groupBy("conv_id", "role", "to_role")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    agg = trans.groupBy("conv_id").agg(
        F.sum("c").alias("n"),
        F.count("*").cast("bigint").alias("n_patterns"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("clnc"),
    )
    return agg.select(
        "conv_id",
        F.col("n").cast("bigint").alias("n_transitions"),
        "n_patterns",
        F.round(
            F.log(F.col("n")) - F.col("clnc") / F.col("n"), 6
        ).alias("entropy"),
    )


ORACLE_TURN_TAKE_ENTROPY = f"""
WITH t AS ({_ORACLE_TURNS}),
trans AS (
  SELECT conv_id, role, to_role, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT conv_id, role,
           lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
             AS to_role
    FROM t)
  WHERE to_role IS NOT NULL
  GROUP BY conv_id, role, to_role),
agg AS (
  SELECT conv_id, sum(c) AS n, CAST(count(*) AS BIGINT) AS n_patterns,
         sum(c * ln(c)) AS clnc
  FROM trans GROUP BY conv_id)
SELECT conv_id, CAST(n AS BIGINT) AS n_transitions, n_patterns,
       round(ln(n) - clnc / n, 6) AS entropy
FROM agg
"""


# ---------------------------------------------------------------------------
# tool_call_depth — consecutive-tool-turn burst profile per conversation
# ---------------------------------------------------------------------------


def q_tool_call_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation tool-burst profile: number of tool-using
    turns, number of BURSTS (maximal runs of consecutive tool turns),
    and the maximum burst depth — the agent-behavior signal that
    separates one-shot tool use from deep tool chains (the run-length
    sibling of ``agent_loop_detect``'s revisit profile).

    Runs use the gaps-and-islands identity: within a conversation's
    tool turns ordered by turn_idx, ``turn_idx − row_number()`` is
    constant exactly along a consecutive run, so bursts fall out of
    one window + one groupBy with NO iterative logic — all integers.

    Scale: one shuffle on conv_id (bounded turns per conversation),
    bounded-key aggs after; output ≤ |conversations with tools| rows.
    """
    t = _turns(spark, sf_dir).where(F.col("tool").isNotNull())
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    runs = (
        t.select("conv_id", "turn_idx")
        .withColumn(
            "island", F.col("turn_idx") - F.row_number().over(w)
        )
        .groupBy("conv_id", "island")
        .agg(F.count("*").cast("bigint").alias("depth"))
    )
    return runs.groupBy("conv_id").agg(
        F.sum("depth").cast("bigint").alias("n_tool_turns"),
        F.count("*").cast("bigint").alias("n_bursts"),
        F.max("depth").cast("bigint").alias("max_depth"),
    )


ORACLE_TOOL_CALL_DEPTH = f"""
WITH t AS ({_ORACLE_TURNS_TOOL}),
runs AS (
  SELECT conv_id, island, CAST(count(*) AS BIGINT) AS depth
  FROM (
    SELECT conv_id,
           turn_idx - row_number() OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx) AS island
    FROM t WHERE tool IS NOT NULL)
  GROUP BY conv_id, island)
SELECT conv_id,
       CAST(sum(depth) AS BIGINT) AS n_tool_turns,
       CAST(count(*) AS BIGINT) AS n_bursts,
       CAST(max(depth) AS BIGINT) AS max_depth
FROM runs GROUP BY conv_id
"""


TRANSCRIPT_QUERIES = {
    "merge_adjacent_turns": q_merge_adjacent_turns,
    "turn_structure_qa": q_turn_structure_qa,
    "context_windows": q_context_windows,
    "link_extract": q_link_extract,
    "pack_sequences_sharded": q_pack_sequences_sharded,
    "loss_mask_spans": q_loss_mask_spans,
    "tool_transitions": q_tool_transitions,
    "conversation_dedup": q_conversation_dedup,
    "agent_loop_detect": q_agent_loop_detect,
    "turn_take_entropy": q_turn_take_entropy,
    "tool_call_depth": q_tool_call_depth,
}

TRANSCRIPT_ORACLES = {
    "merge_adjacent_turns": ORACLE_MERGE_ADJACENT_TURNS,
    "turn_structure_qa": ORACLE_TURN_STRUCTURE_QA,
    "context_windows": ORACLE_CONTEXT_WINDOWS,
    "link_extract": ORACLE_LINK_EXTRACT,
    "pack_sequences_sharded": ORACLE_PACK_SEQUENCES_SHARDED,
    "loss_mask_spans": ORACLE_LOSS_MASK_SPANS,
    "tool_transitions": ORACLE_TOOL_TRANSITIONS,
    "conversation_dedup": ORACLE_CONVERSATION_DEDUP,
    "agent_loop_detect": ORACLE_AGENT_LOOP_DETECT,
    "turn_take_entropy": ORACLE_TURN_TAKE_ENTROPY,
    "tool_call_depth": ORACLE_TOOL_CALL_DEPTH,
}

_q.QUERIES.update(TRANSCRIPT_QUERIES)
_q.ORACLES.update(TRANSCRIPT_ORACLES)
