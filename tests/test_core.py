"""Contract tests for the shared extraction core.

Replays the reference's output-contract assertions
(``tests/test_smoke.py:67-78``: keys present, types right, confidence in
[0,1], JSON-serializable) and its degenerate-input tests
(``tests/test_dbnet.py:38-45``: blank input still returns a list).
"""

import json

import pytest

from occular_ocr_spark.extraction import core


def test_constants_match_reference():
    # dbnet_detector.py:13-17 — same names, same values.
    assert core.THRESHOLD == 0.252
    assert core.UNCLIP_RATIO == 2.44
    assert core.BOX_THRESH == 0.52
    assert core.MIN_AREA == 38


def test_dispatch():
    assert core.dispatch('{"blocks": []}') == "pdf_text"
    assert core.dispatch("<p>hi</p>") == "html"
    assert core.dispatch("pre\n```\nx\n```") == "markup"
    assert core.dispatch("<output>x</output>") == "markup"
    assert core.dispatch("just words") == "plain"
    assert core.dispatch("") == "plain"
    assert core.dispatch(None) == "plain"


def test_output_contract_shape():
    # test_smoke.py:67-78 analog
    payload = (
        "<html><body><nav><a href='/'>home</a> <a href='/x'>x</a></nav>"
        "<p>the quick brown fox jumps over the lazy dog repeatedly today</p>"
        "</body></html>"
    )
    r = core.extract_turn(payload)
    assert isinstance(r, dict)
    assert r["method"] == "html"
    assert isinstance(r["blocks"], list)
    for b in r["blocks"]:
        assert set(b.keys()) == {"span", "text", "confidence"}
        assert isinstance(b["text"], str)
        assert 0.0 <= b["confidence"] <= 1.0
        assert set(b["span"].keys()) == {"start", "end", "y"}
        assert 0 <= b["span"]["start"] <= b["span"]["end"] <= len(payload)
    json.dumps(r)  # JSON-serializable, like test_smoke.py:77-78


def test_blank_inputs_return_empty():
    # blank image -> still a list (test_dbnet.py:38-45 analog)
    for payload in ["", "   \n \t ", None]:
        r = core.extract_turn(payload)
        assert r["blocks"] == []
        assert r["text"] == ""


def test_blank_html_blocks_skipped():
    r = core.extract_turn("<p></p>\n<div>   </div>")
    assert r["method"] == "html"
    assert r["blocks"] == []


def test_min_area_filter_drops_short_blocks():
    # D4 analog: block below MIN_AREA chars is dropped (dbnet_detector.py:146-149)
    short = "<p>tiny words</p>"
    assert len("tiny words") < core.MIN_AREA
    assert core.extract_turn(short)["blocks"] == []
    long = "<p>" + "word " * 20 + "</p>"
    assert core.extract_turn(long)["blocks"] != []


def test_link_density_drops_boilerplate():
    # D3 analog: link-dense nav scores below THRESHOLD
    nav = "<nav>" + "".join(f"<a href='/{i}'>linky navigation entry {i}</a> " for i in range(6)) + "</nav>"
    assert core.extract_turn(nav)["blocks"] == []


def test_pdf_text_layer_parse_and_ysort():
    # pipeline.py:192-226 analog, including the Y-sort of :220
    payload = json.dumps(
        {
            "blocks": [
                {"type": 0, "lines": [
                    {"bbox": [72, 300.0, 540, 312], "spans": [{"text": "second line"}]},
                ]},
                {"type": 1, "image": "ignored"},
                {"type": 0, "lines": [
                    {"bbox": [72, 100.0, 540, 112], "spans": [{"text": "first "}, {"text": "line"}]},
                    {"bbox": [72, 120.0, 540, 132], "spans": [{"text": "   "}]},
                ]},
            ]
        }
    )
    r = core.extract_turn(payload)
    assert r["method"] == "pdf_text"
    assert [b["text"] for b in r["blocks"]] == ["first line", "second line"]
    assert all(b["confidence"] == 1.0 for b in r["blocks"])
    assert r["text"] == "first line\nsecond line"


def test_pdf_no_text_layer_falls_back():
    # dual-path fallback (pipeline.py:148-162 analog)
    r = core.extract_turn('{"blocks": []}')
    assert r["method"] == "html"  # heuristic ("ocr") path
    assert r["text"] == ""


def test_force_ocr_skips_text_layer():
    payload = json.dumps(
        {"blocks": [{"type": 0, "lines": [{"bbox": [0, 0, 1, 1], "spans": [{"text": "hello world"}]}]}]}
    )
    assert core.extract_turn(payload)["method"] == "pdf_text"
    assert core.extract_turn(payload, force_ocr=True)["method"] == "html"


def test_markup_extraction():
    payload = "noise preamble\n```python\nresult line one\nresult line two\n```\ntrailing"
    r = core.extract_turn(payload)
    assert r["method"] == "markup"
    assert r["text"] == "result line one\nresult line two"
    assert r["blocks"][0]["confidence"] == 1.0


def test_markup_empty_fence():
    r = core.extract_turn("```\n\n```")
    assert r["method"] == "markup"
    assert r["blocks"] == []


def test_plain_multiline_blank_skip():
    r = core.extract_turn("alpha beta\n\n  gamma  \n")
    assert r["method"] == "plain"
    assert r["text"] == "alpha beta\ngamma"
    # span offsets index the source payload
    b = r["blocks"][1]
    assert r["text"].splitlines()[1] == "gamma"
    payload = "alpha beta\n\n  gamma  \n"
    assert payload[b["span"]["start"]:b["span"]["end"]] == "gamma"


def test_span_expansion_degenerate_guard():
    # dbnet_detector.py:112-114 analog: zero-width span passes through
    assert core._expand_span("abc", 1, 1) == (1, 1)
    # clamp within bounds (dbnet_detector.py:166-167 analog)
    lo, hi = core._expand_span(" x ", 1, 2)
    assert 0 <= lo <= hi <= 3


def test_confidence_semantics():
    # CTC min-over-tokens (crnn_mobilenet.py:135-161 analog); empty -> 0.0
    assert core._confidence([]) == 0.0
    assert core._confidence(["abc"]) == 1.0
    assert core._confidence(["abc", "a-b"]) == pytest.approx(2 / 3)


def test_ysort_stability():
    # equal Y keeps insertion order (list.sort is stable; pipeline.py:76)
    payload = "<div>" + "alpha content words here for the minimum area gate ok</div><div>beta content words here for the minimum area gate ok" + "</div>"
    r = core.extract_turn(payload)
    texts = [b["text"] for b in r["blocks"]]
    assert texts == sorted(texts, key=lambda t: 0) == texts  # order preserved
    assert texts[0].startswith("alpha")
