"""Transcript source readers — format dispatch at the file level.

The reference dispatches on the input file's suffix (``.pdf`` -> PDF
path, else image decode, ``ocr_skel/pipeline.py:272-288``) before any
content-level dispatch runs.  This module is that layer for the
cluster job: one entry point that accepts parquet / JSON-lines / CSV /
raw text inputs and normalizes all of them to the canonical transcript
schema of BASELINE.json's input_hint
(``conv_id string, turn_idx int, role, text, tool, ts``), so every
downstream stage (extraction, sink, catalog) sees one shape.

Scale notes: every reader is a plain ``spark.read`` source — splittable
(parquet/CSV/JSON line-split per HDFS block), schema-pinned (no
sampling-based inference pass over 100 TB), and column-pruned by
Catalyst as usual.  The raw-text reader maps one FILE to one
conversation and one line to one turn; files are read whole (a
conversation is not splittable mid-file) and the line explode happens
map-side.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".txt": "text",
    ".text": "text",
}


def infer_format(path: str) -> str:
    """Suffix dispatch (pipeline.py:272-288 analog): map the path's
    extension to a reader; directories (no extension) default to
    parquet, the table layout of the 100 TB corpus."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    return _EXT_FORMAT.get(ext, "parquet")


def _normalize(df: DataFrame) -> DataFrame:
    """Project any superset/subset of the transcript columns onto the
    canonical schema: missing optional columns become NULL, extra
    columns are pruned, types are pinned."""
    cols = set(df.columns)
    out = []
    for field in TRANSCRIPT_SCHEMA.fields:
        if field.name in cols:
            out.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*out)


def read_transcripts(
    spark: SparkSession, path: str, fmt: Optional[str] = None
) -> DataFrame:
    """One entry point for every supported transcript source.

    ``fmt``: ``parquet`` | ``json`` (JSON lines) | ``csv`` (headered) |
    ``text`` (one file = one conversation, one line = one turn); None
    infers from the path suffix.
    """
    fmt = (fmt or infer_format(path)).lower()
    if fmt == "parquet":
        return _normalize(spark.read.parquet(path))
    if fmt == "orc":
        # same columnar splittable/pruned/pushed properties as parquet
        return _normalize(spark.read.orc(path))
    if fmt == "json":
        # explicit schema: no inference scan over the corpus
        return _normalize(spark.read.schema(TRANSCRIPT_SCHEMA).json(path))
    if fmt == "csv":
        return _normalize(
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("header", "true")
            .option("multiLine", "false")
            .csv(path)
        )
    if fmt == "text":
        # one file per conversation: read whole files, then a map-side
        # posexplode assigns per-file line numbers as turn_idx —
        # deterministic without any window or zipWithIndex pass
        raw = spark.read.text(path, wholetext=True).select(
            F.input_file_name().alias("conv_id"), F.col("value")
        )
        return _normalize(
            raw.select(
                "conv_id",
                F.posexplode(F.split("value", "\n")).alias("turn_idx", "text"),
            )
        )
    raise ValueError(
        f"Unknown transcript source format '{fmt}'. "
        "Supported: parquet, orc, json, csv, text."
    )
