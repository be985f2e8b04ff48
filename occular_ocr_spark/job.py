"""Spark extraction job — the distributed twin of the pure-Python oracle.

Plan shape (SURVEY.md §3 target lifecycle):

    scan -> repartition(hash(conv_id) [+ salt]) -> mapInArrow(extract)
         -> (optional) window-ordered assembly -> sink

All custom logic lives inside Arrow-batched ``mapInArrow`` (no per-row
Python at the DataFrame level, per BASELINE.json input_hint).  One Arrow
batch plays the role of the reference recognizer's width bucket
(``recognizer_onnx.py:60-86``); the named-strategy registry
(``registry.Registry``) plays the role of the reference's instance cache
(``registry.py:36-39`` — one init per executor Python worker, reused
across batches) and its name->class extension point.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .extraction import core
from .registry import Registry

SPAN_TYPE = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("y", IntegerType(), False),
    ]
)
BLOCK_TYPE = StructType(
    [
        StructField("span", SPAN_TYPE, False),
        StructField("text", StringType(), False),
        StructField("confidence", DoubleType(), False),
    ]
)
EXTRACTED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("method", StringType(), False),
        StructField("blocks", ArrayType(BLOCK_TYPE), False),
        StructField("text", StringType(), False),
        StructField("src_snapshot_id", LongType(), True),
        StructField("partition_id", IntegerType(), True),
        StructField("extractor_version", StringType(), False),
    ]
)


def repartition_salted(
    df: DataFrame, num_partitions: int, salt_buckets: int = 0
) -> DataFrame:
    """Hash-repartition by conv_id, optionally salted for skew.

    The north rule's "salted repartitioning for skewed mega-conversations":
    without salt, one 10^6-turn conv_id serializes into one task (the
    analog of the reference's main-thread rasterization bottleneck,
    ``pipeline.py:139-141`` — the anti-pattern we must not replay).  With
    salt, a conversation's turns spread over ``salt_buckets`` tasks;
    extraction is per-turn so no merge-phase correctness is lost, and the
    conversation-level assembly re-sorts by turn_idx (two-phase pattern,
    SURVEY.md §4).

    ``num_partitions``: a positive int pins the exchange width (tests /
    explicit tuning).  ``0`` requests a column-only repartition: the
    exchange hashes on the same keys but its width comes from
    ``spark.sql.shuffle.partitions`` AND AQE may coalesce small
    partitions at runtime.  That is the production setting — on a
    1000-executor cluster the right width is cluster-sized config, not
    a number baked into the job, and on a small input AQE collapses the
    exchange instead of fanning a few thousand rows across the full
    width (each tiny task pays Python-worker + Arrow setup).  AQE's
    coalescing is size-targeted, so skewed salt buckets stay split —
    only genuinely small partitions merge.
    """
    cols = [F.col("conv_id")]
    if salt_buckets and salt_buckets > 1:
        cols.append(F.pmod(F.col("turn_idx"), F.lit(salt_buckets)))
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


# Memo for the two fast-path Column trees below: building them is
# hundreds of py4j calls (~0.3 s of driver time per extract_detailed
# invocation, measured), yet the unresolved expression is identical
# every time and reusable across DataFrames.  Keyed by the live
# SparkContext identity so a restarted JVM rebuilds instead of holding
# a stale gateway reference.  Driver-only micro-optimization: at corpus
# scale it is invisible; on a 5k-row bench pass it was ~40% of wall.
_EXPR_CACHE: dict = {}


def _cached_expr(key: str, builder):
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    ent = _EXPR_CACHE.get(key)
    if ent is not None and ent[0] is sc:
        return ent[1]
    col = builder()
    _EXPR_CACHE[key] = (sc, col)
    return col


def _plain_safe_predicate():
    return _cached_expr("plain_safe_predicate", _build_plain_safe_predicate)


def _build_plain_safe_predicate():
    """Conservative JVM-side pre-dispatch: TRUE only when the payload is
    provably 'plain' under core.dispatch — it contains none of the
    characters any other method requires (``<`` for HTML hints and
    markup tags, a backtick for fences, ``{`` for the PDF text layer)
    and no whitespace beyond space/newline (so Spark ``trim`` ==
    Python ``str.strip`` exactly).  Any row that fails the test simply
    takes the Python path, where the authoritative dispatcher decides —
    a false negative costs a few µs, a false positive cannot happen.

    The exclusion set is EVERY character CPython's ``str.strip()``
    treats as whitespace (Unicode White_Space plus bidi classes B/S:
    \\t \\x0B \\f \\r \\x1c-\\x1f \\x85 \\xa0 \\u1680 \\u2000-\\u200a
    \\u2028 \\u2029 \\u202f \\u205f \\u3000) except space and \\n —
    Spark's ``trim``/``ltrim`` strip only ASCII space, so any other
    whitespace (e.g. an NBSP-prefixed payload) would make the Catalyst
    path diverge from the kernel on offsets and kept lines.
    """
    t = F.col("text")
    return (
        t.isNotNull()
        & ~t.contains("<")
        & ~t.contains("`")
        & ~t.contains("{")
        & ~t.rlike(
            "[\\t\\x0B\\f\\r\\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a"
            "\\u2028\\u2029\\u202f\\u205f\\u3000]"
        )
    )


def _plain_blocks_expr():
    return _cached_expr("plain_blocks_expr", _build_plain_blocks_expr)


def _build_plain_blocks_expr():
    """core.extract_plain as a pure Catalyst expression: per non-blank
    line one block ``(span(start, end, y), trim(line), 1.0)`` with
    source offsets accumulated across lines — bit-identical to the
    Python kernel for payloads passing :func:`_plain_safe_predicate`."""
    lines = F.split(F.col("text"), "\n")
    indexed = F.transform(
        lines, lambda ln, i: F.struct(ln.alias("ln"), i.alias("y"))
    )
    zero = F.struct(
        F.lit(0).cast("int").alias("off"),
        F.array().cast(ArrayType(BLOCK_TYPE)).alias("blocks"),
    )

    def step(acc, x):
        ln = x["ln"]
        trimmed = F.trim(ln)
        lead = F.length(ln) - F.length(F.ltrim(ln))
        start = (acc["off"] + lead).cast("int")
        blk = F.struct(
            F.struct(
                start.alias("start"),
                (start + F.length(trimmed)).cast("int").alias("end"),
                x["y"].cast("int").alias("y"),
            ).alias("span"),
            trimmed.alias("text"),
            F.lit(1.0).alias("confidence"),
        )
        return F.struct(
            (acc["off"] + F.length(ln) + 1).cast("int").alias("off"),
            F.when(
                trimmed != "", F.concat(acc["blocks"], F.array(blk))
            ).otherwise(acc["blocks"]).alias("blocks"),
        )

    return F.aggregate(indexed, zero, step, lambda acc: acc["blocks"])


def extract_detailed(
    df: DataFrame,
    force_ocr: bool = False,
    src_snapshot_id: Optional[int] = None,
    num_partitions: Optional[int] = None,
    salt_buckets: int = 0,
    strategy: Optional[str] = None,
    jvm_plain_fast_path: bool = True,
) -> DataFrame:
    """Detailed extraction: one output row per turn, with blocks + lineage.

    The analog of ``ocr_detailed()`` (``ocr_skel/__init__.py:104-135``).
    Output schema mirrors FIXTURES.md §2 plus the north rule's lineage
    columns (src_snapshot_id, partition_id, extractor_version).

    ``strategy`` selects a named extractor from the registry
    (``registry.Registry``, the reference's ``registry.py:18-52``
    extension point); only the name + config ride the closure — the
    instance is built once per executor Python worker and reused across
    Arrow batches.  Default: the standard dual-path extractor.

    ``jvm_plain_fast_path``: with the default strategy, payloads that
    are PROVABLY plain (see :func:`_plain_safe_predicate`) are
    extracted by pure Catalyst expressions and never enter a Python
    worker — nor the salted exchange, since there is no Python stage to
    balance for them.  At corpus scale this removes both the Arrow
    transfer and the shuffle for the plain fraction of the data; the
    remaining rows take the usual scan -> salted exchange -> mapInArrow
    path.  Disabled automatically for non-default strategies (their
    semantics are theirs to define).
    """
    strat_name, strat_class = Registry.resolve_class(strategy)
    # Column pruning BEFORE the exchange: only (conv_id, turn_idx, text)
    # ride the shuffle — role/tool/ts never leave the scan.  The casts pin
    # the Arrow input types so the UDF can pass key columns through
    # zero-copy.
    df = df.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("text").cast("string").alias("text"),
    )
    snap = -1 if src_snapshot_id is None else int(src_snapshot_id)
    fast = None
    if jvm_plain_fast_path and strat_name == "standard":
        safe = _plain_safe_predicate()
        staged = df.where(safe).select(
            "conv_id", "turn_idx", _plain_blocks_expr().alias("blocks")
        )
        fast = staged.select(
            "conv_id",
            "turn_idx",
            F.lit(core.METHOD_PLAIN).alias("method"),
            "blocks",
            # "\n".join of the block texts (__init__.py:93-101)
            F.array_join(
                F.transform("blocks", lambda b: b["text"]), "\n"
            ).alias("text"),
            F.lit(snap).cast("long").alias("src_snapshot_id"),
            # lineage: the partition that produced the row (the scan
            # partition here; the Arrow stage's partition on the UDF path)
            F.spark_partition_id().alias("partition_id"),
            F.lit(core.EXTRACTOR_VERSION).alias("extractor_version"),
        )
        # ~safe is TRUE for null payloads too (safe is a strict false
        # there), so the Python path keeps the None-payload guard
        df = df.where(~safe)
    # None = no exchange (caller already partitioned); 0 = column-only
    # salted exchange whose width is AQE/config-managed (see
    # repartition_salted); >0 = pinned width.
    if num_partitions is not None:
        df = repartition_salted(df, num_partitions, salt_buckets)

    def run(batches):
        # Arrow-native batch loop (mapInArrow): the nested blocks column is
        # assembled directly as ListArray<StructArray> from flat builders —
        # ~2x faster end-to-end than pandas object-column -> Arrow struct
        # inference, which profiling showed cost as much as the extraction
        # itself.  One Arrow batch plays the reference recognizer's width
        # bucket (recognizer_onnx.py:60-86).
        import pyarrow as pa

        from pyspark import TaskContext

        extractor = Registry.resolve(strat_name, strat_class, force_ocr=force_ocr)
        ctx = TaskContext.get()
        pid = int(ctx.partitionId()) if ctx is not None else -1
        version = extractor.version
        extract = extractor.extract
        for rb in batches:
            payloads = rb.column(rb.schema.get_field_index("text")).to_pylist()
            n = len(payloads)
            methods: list = []
            texts_out: list = []
            offsets = [0]
            b_start: list = []
            b_end: list = []
            b_y: list = []
            b_text: list = []
            b_conf: list = []
            for payload in payloads:
                method, blocks, text = extract(payload)
                methods.append(method)
                texts_out.append(text)
                for start, end, y, btext, conf in blocks:
                    b_start.append(start)
                    b_end.append(end)
                    b_y.append(y)
                    b_text.append(btext)
                    b_conf.append(conf)
                offsets.append(len(b_start))
            span_arr = pa.StructArray.from_arrays(
                [
                    pa.array(b_start, pa.int32()),
                    pa.array(b_end, pa.int32()),
                    pa.array(b_y, pa.int32()),
                ],
                names=["start", "end", "y"],
            )
            block_arr = pa.StructArray.from_arrays(
                [span_arr, pa.array(b_text, pa.string()), pa.array(b_conf, pa.float64())],
                names=["span", "text", "confidence"],
            )
            blocks_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), block_arr)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("conv_id")),
                    rb.column(rb.schema.get_field_index("turn_idx")),
                    pa.array(methods, pa.string()),
                    blocks_arr,
                    pa.array(texts_out, pa.string()),
                    pa.array([snap] * n, pa.int64()),
                    pa.array([pid] * n, pa.int32()),
                    pa.array([version] * n, pa.string()),
                ],
                names=[f.name for f in EXTRACTED_SCHEMA.fields],
            )

    out = df.mapInArrow(run, schema=EXTRACTED_SCHEMA)
    if fast is not None:
        out = out.unionByName(fast)
    return out


def extract_text(df: DataFrame, **kwargs) -> DataFrame:
    """Simple API: per-turn plain text (the ``ocr()`` analog,
    ``ocr_skel/__init__.py:58-101``)."""
    return extract_detailed(df, **kwargs).select("conv_id", "turn_idx", "text")


class ExtractionPipeline:
    """Configured-pipeline facade — the ``OCRPipeline`` class analog
    (``ocr_skel/__init__.py:142-234``: construct once with config, call
    per input).  Holds strategy/partitioning/lineage settings so batch
    jobs, notebooks, and the CLI share one configured object instead of
    re-threading kwargs through every call.
    """

    def __init__(
        self,
        strategy: Optional[str] = None,
        force_ocr: bool = False,
        num_partitions: Optional[int] = None,
        salt_buckets: int = 0,
        src_snapshot_id: Optional[int] = None,
    ):
        # fail fast on an unknown strategy, like Registry.get_detector
        # does at pipeline construction (pipeline.py:32-45)
        Registry.resolve_class(strategy)
        self.strategy = strategy
        self.force_ocr = force_ocr
        self.num_partitions = num_partitions
        self.salt_buckets = salt_buckets
        self.src_snapshot_id = src_snapshot_id

    def process(self, df: DataFrame) -> DataFrame:
        """Detailed per-turn records (``ocr_detailed`` analog)."""
        return extract_detailed(
            df,
            force_ocr=self.force_ocr,
            src_snapshot_id=self.src_snapshot_id,
            num_partitions=self.num_partitions,
            salt_buckets=self.salt_buckets,
            strategy=self.strategy,
        )

    def get_text(self, df: DataFrame) -> DataFrame:
        """Per-turn plain text (``get_text`` / ``ocr`` analog)."""
        return self.process(df).select("conv_id", "turn_idx", "text")

    def get_conversations(self, df: DataFrame) -> DataFrame:
        """Whole-conversation assembly (page-list join analog)."""
        return conversation_text(self.process(df))


#: Turns per assembly chunk.  Phase-1 aggregation state is bounded by
#: this many (turn_idx, text) structs per task regardless of how big a
#: conversation is; raise/lower per deployment memory.
ASSEMBLY_CHUNK_TURNS = 1024


def conversation_text(
    extracted: DataFrame, chunk_turns: int = ASSEMBLY_CHUNK_TURNS
) -> DataFrame:
    """Assemble whole-conversation text under stable turn ordering.

    The cross-turn analog of the reference's page-list assembly
    (``__init__.py:91-95``: per-page text list in page order, joined).

    Two-phase chunked concat (VERDICT r4 #6 — mega-conversation
    safety): phase 1 groups by ``(conv_id, turn_idx DIV chunk)`` and
    order-concats each chunk, so no aggregation buffer ever holds more
    than ``chunk_turns`` turn structs; phase 2 order-concats the chunk
    texts per conversation (a 10⁹-turn conversation is ~10⁶ chunk rows
    here, not 10⁹ structs in one buffer).  Both phases are groupBy +
    array_sort — partial-aggregable shuffles, no windows — and the
    result is bit-identical to a single-phase ordered join because
    "\\n".join composes associatively and ``turn_idx`` is unique
    within a conversation.  The FINAL row still carries the whole
    conversation's text (the row IS the conversation — semantically
    inherent); chunking bounds the *aggregation state*, which is where
    the single-task OOM lived.
    """
    chunks = (
        extracted.groupBy(
            "conv_id",
            (F.col("turn_idx") - (F.col("turn_idx") % chunk_turns)).alias("chunk_id"),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
            ).alias("turns")
        )
        .select(
            "conv_id",
            "chunk_id",
            F.array_join(F.transform("turns", lambda t: t["text"]), "\n").alias(
                "chunk_text"
            ),
            F.size("turns").alias("chunk_turns"),
        )
    )
    return (
        chunks.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_id", "chunk_text", "chunk_turns"))
            ).alias("cs")
        )
        .select(
            "conv_id",
            F.array_join(F.transform("cs", lambda c: c["chunk_text"]), "\n").alias(
                "text"
            ),
            F.aggregate(
                F.col("cs"), F.lit(0), lambda acc, c: acc + c["chunk_turns"]
            ).alias("n_turns"),
        )
    )
