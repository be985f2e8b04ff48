"""Source readers: every supported input format must normalize to the
canonical transcript schema (BASELINE.json input_hint) and feed the
extraction pipeline unchanged — the file-level format dispatch of
ocr_skel/pipeline.py:272-288, cluster edition."""

import json

import pytest

from occular_ocr_spark.job import extract_text
from occular_ocr_spark.sources import (
    TRANSCRIPT_SCHEMA,
    infer_format,
    read_transcripts,
)

ROWS = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello there world",
     "tool": None, "ts": "2024-01-01T00:00:00"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "general reply",
     "tool": "search", "ts": "2024-01-01T00:01:00"},
    {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "second conversation",
     "tool": None, "ts": "2024-01-02T00:00:00"},
]


def test_infer_format():
    assert infer_format("/data/transcripts") == "parquet"
    assert infer_format("/data/x.parquet") == "parquet"
    assert infer_format("/data/x.jsonl") == "json"
    assert infer_format("/data/x.ndjson") == "json"
    assert infer_format("/data/x.csv") == "csv"
    assert infer_format("/data/x.txt") == "text"
    assert infer_format("/data/x.orc") == "orc"


def test_unknown_format_raises(spark):
    with pytest.raises(ValueError, match="Unknown transcript source"):
        read_transcripts(spark, "/tmp/x", fmt="avro-ish")


def _assert_canonical(df, n_rows):
    assert [f.name for f in df.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert df.count() == n_rows


def test_json_lines_source(spark, tmp_path):
    p = tmp_path / "turns.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    df = read_transcripts(spark, str(p))
    _assert_canonical(df, 3)
    row = df.where("conv_id = 'c1' AND turn_idx = 1").first()
    assert row["role"] == "assistant" and row["tool"] == "search"
    assert row["ts"] is not None


def test_orc_source(spark, tmp_path):
    p = str(tmp_path / "turns.orc")
    src = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"]) for r in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    src.write.orc(p)
    df = read_transcripts(spark, p)
    _assert_canonical(df, 3)
    row = df.where("conv_id = 'c1' AND turn_idx = 1").first()
    assert row["role"] == "assistant" and row["tool"] == "search"
    assert row["ts"] is None  # absent column -> NULL


def test_csv_source(spark, tmp_path):
    p = tmp_path / "turns.csv"
    lines = ["conv_id,turn_idx,role,text,tool,ts"]
    for r in ROWS:
        lines.append(
            f"{r['conv_id']},{r['turn_idx']},{r['role']},{r['text']},"
            f"{r['tool'] or ''},{r['ts']}"
        )
    p.write_text("\n".join(lines))
    df = read_transcripts(spark, str(p))
    _assert_canonical(df, 3)
    assert df.where("conv_id = 'c2'").first()["text"] == "second conversation"


def test_text_source_one_file_per_conversation(spark, tmp_path):
    d = tmp_path / "convs"
    d.mkdir()
    (d / "a.txt").write_text("first turn line\nsecond turn line")
    (d / "b.txt").write_text("only turn")
    df = read_transcripts(spark, str(d / "*.txt"), fmt="text")
    _assert_canonical(df, 3)
    a = {r["turn_idx"]: r["text"] for r in
         df.where(df.conv_id.endswith("a.txt")).collect()}
    assert a == {0: "first turn line", 1: "second turn line"}


def test_missing_columns_become_nulls(spark, tmp_path):
    p = tmp_path / "bare.jsonl"
    p.write_text(json.dumps({"conv_id": "c", "turn_idx": 0, "text": "bare row"}))
    df = read_transcripts(spark, str(p))
    row = df.first()
    assert row["role"] is None and row["tool"] is None and row["ts"] is None


def test_sources_feed_extraction(spark, tmp_path):
    p = tmp_path / "turns.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    out = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in extract_text(read_transcripts(spark, str(p))).collect()}
    assert out[("c1", 0)] == "hello there world"
    assert out[("c2", 0)] == "second conversation"
