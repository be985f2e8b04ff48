"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content in a 100 TB corpus rides as ``binary`` columns
with typed metadata extracted by Arrow-batched UDFs.  The decode /
feature-extract libs (PIL, ffmpeg, torchaudio...) are NOT in this
container, so the *decode step* is a deterministic stand-in that derives
metadata from the raw bytes — clearly marked below — while the
Spark-side plumbing (schema, batch shape, UDF signature, partitioning)
is the real production pattern.

Replays the reference's lazy per-worker model-init pattern
(``registry.py:36-39``) for the decoder handle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("format", StringType(), False),
    ]
)

_decoder = None


def _get_decoder():
    """Lazy per-worker decoder init (registry.py:36-39 analog).

    In production this would load libjpeg/PIL/ffmpeg once per executor
    Python worker.  Here it returns the deterministic stand-in.
    """
    global _decoder
    if _decoder is None:
        try:
            import PIL  # noqa: F401  — not present in this container

            raise NotImplementedError(
                "real image decode is stubbed in this environment; "
                "wire PIL.Image.open here when the lib is available"
            )
        except ImportError:
            _decoder = _fake_decode
    return _decoder


def _fake_decode(buf: bytes):
    """DETERMINISTIC STAND-IN for image decode (container lacks image
    libs).  Derives plausible typed metadata purely from the bytes so
    tests and oracles are exact."""
    n = len(buf)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": n % 480,
        "format": "png" if n % 2 == 0 else "jpeg",
    }


def decode_meta(df: DataFrame) -> DataFrame:
    """df(doc_id, payload: binary) -> typed metadata via mapInPandas.

    Arrow batches of binary payloads -> decoder -> struct columns; this
    is the exact shape a real image-metadata pass has at 100 TB (the
    decode body is the only stub).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _get_decoder()
        for pdf in batches:
            metas = [decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                    "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                    "format": [m["format"] for m in metas],
                }
            )

    return df.mapInPandas(run, schema=META_SCHEMA)
