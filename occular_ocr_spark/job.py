"""Spark extraction job — the distributed twin of the pure-Python oracle.

Plan shape (SURVEY.md §3 target lifecycle):

    scan -> repartition(hash(conv_id) [+ salt]) -> mapInPandas(extract)
         -> (optional) window-ordered assembly -> sink

All custom logic lives inside Arrow-batched ``mapInPandas`` (no per-row
Python at the DataFrame level, per BASELINE.json input_hint).  One Arrow
batch plays the role of the reference recognizer's width bucket
(``recognizer_onnx.py:60-86``); the module-level extractor singleton plays
the role of the reference's instance cache (``registry.py:36-39`` — one
init per executor Python worker, reused across batches).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

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


class _ExtractorSingleton:
    """Per-python-worker extractor instance cache.

    The analog of ``Registry``'s ``(name, gpu)``-keyed instance cache
    (``registry.py:29-52``): state is initialized once per executor Python
    worker and reused across Arrow batches.  For the deterministic
    stand-in extractor the "state" is just config, but the pattern is the
    one a model-backed extractor would need.
    """

    _instance: Optional["_ExtractorSingleton"] = None

    def __init__(self, force_ocr: bool = False):
        self.force_ocr = force_ocr
        self.version = core.EXTRACTOR_VERSION

    @classmethod
    def get(cls, force_ocr: bool = False) -> "_ExtractorSingleton":
        inst = cls._instance
        if inst is None or inst.force_ocr != force_ocr:
            inst = cls(force_ocr=force_ocr)
            cls._instance = inst
        return inst

    def extract_batch(self, texts: pd.Series):
        """Vectorized over an Arrow batch: one extract_turn per payload."""
        force = self.force_ocr
        methods, blocks, out_text = [], [], []
        for payload in texts:
            r = core.extract_turn(payload, force_ocr=force)
            methods.append(r["method"])
            blocks.append(r["blocks"])
            out_text.append(r["text"])
        return methods, blocks, out_text


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
    """
    if salt_buckets and salt_buckets > 1:
        return df.repartition(
            num_partitions, F.col("conv_id"), F.pmod(F.col("turn_idx"), F.lit(salt_buckets))
        )
    return df.repartition(num_partitions, F.col("conv_id"))


def extract_detailed(
    df: DataFrame,
    force_ocr: bool = False,
    src_snapshot_id: Optional[int] = None,
    num_partitions: Optional[int] = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """Detailed extraction: one output row per turn, with blocks + lineage.

    The analog of ``ocr_detailed()`` (``ocr_skel/__init__.py:104-135``).
    Output schema mirrors FIXTURES.md §2 plus the north rule's lineage
    columns (src_snapshot_id, partition_id, extractor_version).
    """
    # Column pruning BEFORE the exchange: only (conv_id, turn_idx, text)
    # ride the shuffle — role/tool/ts never leave the scan.
    df = df.select("conv_id", "turn_idx", "text")
    if num_partitions:
        df = repartition_salted(df, num_partitions, salt_buckets)
    snap = -1 if src_snapshot_id is None else int(src_snapshot_id)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        extractor = _ExtractorSingleton.get(force_ocr=force_ocr)
        ctx = TaskContext.get()
        pid = int(ctx.partitionId()) if ctx is not None else -1
        for pdf in batches:
            methods, blocks, texts = extractor.extract_batch(pdf["text"])
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].astype(str),
                    "turn_idx": pdf["turn_idx"].astype("int32"),
                    "method": methods,
                    "blocks": blocks,
                    "text": texts,
                    "src_snapshot_id": snap,
                    "partition_id": pid,
                    "extractor_version": extractor.version,
                }
            )

    return df.mapInPandas(run, schema=EXTRACTED_SCHEMA)


def extract_text(df: DataFrame, **kwargs) -> DataFrame:
    """Simple API: per-turn plain text (the ``ocr()`` analog,
    ``ocr_skel/__init__.py:58-101``)."""
    return extract_detailed(df, **kwargs).select("conv_id", "turn_idx", "text")


def conversation_text(extracted: DataFrame) -> DataFrame:
    """Assemble whole-conversation text under stable turn ordering.

    The cross-turn analog of the reference's page-list assembly
    (``__init__.py:91-95``: per-page text list in page order, joined).
    Implemented as groupBy + array_sort on (turn_idx, text) structs —
    a single shuffle, no window needed, and deterministic because
    turn_idx is unique within a conversation.
    """
    return (
        extracted.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
            ).alias("turns")
        )
        .select(
            "conv_id",
            F.array_join(F.transform("turns", lambda t: t["text"]), "\n").alias("text"),
            F.size("turns").alias("n_turns"),
        )
    )
