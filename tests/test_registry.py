"""Named extraction-strategy registry — reference parity for
ocr_skel/registry.py:18-52 (name->class registration, (name, config)
instance cache, unknown-name error) plus the Spark dispatch path
(strategy name rides the UDF closure, instances are per-worker)."""

import pytest

from occular_ocr_spark.extraction import core
from occular_ocr_spark.job import extract_detailed
from occular_ocr_spark.registry import (
    PlainOnlyExtractor,
    Registry,
    StandardExtractor,
    register,
)


def test_builtin_strategies_registered():
    assert "standard" in Registry.list_strategies()
    assert "plain_only" in Registry.list_strategies()
    assert isinstance(Registry.get(), StandardExtractor)  # default name
    assert isinstance(Registry.get("plain_only"), PlainOnlyExtractor)


def test_unknown_strategy_lists_available():
    with pytest.raises(ValueError, match="not found.*standard"):
        Registry.get("no_such_strategy")
    with pytest.raises(ValueError, match="not found"):
        Registry.resolve_class("no_such_strategy")


def test_instance_cache_keyed_by_name_and_config():
    # registry.py:36-39 contract: same (name, config) -> SAME instance,
    # different config -> different instance
    a = Registry.get("standard", force_ocr=False)
    b = Registry.get("standard", force_ocr=False)
    c = Registry.get("standard", force_ocr=True)
    assert a is b
    assert a is not c
    assert c.force_ocr is True


def test_register_custom_strategy_and_dispatch():
    @register("test_reverse")
    class ReverseExtractor:
        def __init__(self, force_ocr=False):
            self.version = "test-reverse/1"

        def extract(self, payload):
            text = (payload or "")[::-1]
            return "plain", [(0, len(text), 0, text, 1.0)], text

    try:
        inst = Registry.get("test_reverse")
        assert inst is Registry.get("test_reverse")  # cache reuse
        assert inst.extract("abc")[2] == "cba"
        name, cls = Registry.resolve_class("test_reverse")
        assert cls is ReverseExtractor
    finally:
        Registry._strategies.pop("test_reverse", None)
        Registry.clear_cache()


def _turns(spark):
    return spark.createDataFrame(
        [
            ("c", 0, "<html><body><p>html-looking payload long enough to pass every gate</p></body></html>"),
            ("c", 1, '{"blocks": [{"type": 0, "lines": [{"bbox": [0, 9, 1, 1], "spans": [{"text": "pdf line"}]}]}]}'),
            ("c", 2, "plain line one\nplain line two"),
        ],
        "conv_id string, turn_idx int, text string",
    )


def test_spark_dispatch_default_vs_plain_only(spark):
    df = _turns(spark)
    std = {r["turn_idx"]: r for r in extract_detailed(df).collect()}
    assert std[0]["method"] == "html"
    assert std[1]["method"] == "pdf_text"

    plain = {r["turn_idx"]: r for r in
             extract_detailed(df, strategy="plain_only").collect()}
    # plain_only never dispatches: every payload is pass-through lines
    assert {r["method"] for r in plain.values()} == {"plain"}
    assert plain[0]["text"].startswith("<html>")  # raw line, unparsed
    assert plain[2]["text"] == "plain line one\nplain line two"
    # lineage records the strategy's own version string
    assert plain[0]["extractor_version"] == core.EXTRACTOR_VERSION + "+plain-only"
    assert std[0]["extractor_version"] == core.EXTRACTOR_VERSION


def test_spark_dispatch_dynamically_registered_strategy(spark):
    # a strategy registered at runtime on the driver must still resolve
    # inside executor Python workers (the class ships with the closure)
    @register("test_shout")
    class ShoutExtractor:
        def __init__(self, force_ocr=False):
            self.version = "test-shout/1"

        def extract(self, payload):
            text = (payload or "").upper()
            return "plain", [(0, len(text), 0, text, 1.0)], text

    try:
        out = {r["turn_idx"]: r for r in
               extract_detailed(_turns(spark), strategy="test_shout").collect()}
        assert out[2]["text"] == "PLAIN LINE ONE\nPLAIN LINE TWO"
        assert out[2]["extractor_version"] == "test-shout/1"
    finally:
        Registry._strategies.pop("test_shout", None)
        Registry.clear_cache()


def test_unknown_strategy_fails_at_plan_time(spark):
    with pytest.raises(ValueError, match="not found"):
        extract_detailed(_turns(spark), strategy="bogus")


def test_pipeline_facade(spark):
    # OCRPipeline analog: config held once, reused per call
    from occular_ocr_spark.job import ExtractionPipeline

    with pytest.raises(ValueError, match="not found"):
        ExtractionPipeline(strategy="bogus")

    pipe = ExtractionPipeline(strategy="plain_only", salt_buckets=2,
                              src_snapshot_id=9)
    out = pipe.process(_turns(spark)).collect()
    assert {r["method"] for r in out} == {"plain"}
    assert all(r["src_snapshot_id"] == 9 for r in out)
    txt = pipe.get_text(_turns(spark)).columns
    assert txt == ["conv_id", "turn_idx", "text"]
    conv = pipe.get_conversations(_turns(spark)).collect()
    assert len(conv) == 1 and conv[0]["n_turns"] == 3


def test_resolve_overwrites_stale_class_and_cache():
    """A redefined strategy class shipped under an existing name must
    replace the stale binding AND its cached instances on a reused
    worker (ADVICE r2: stale code ran silently)."""

    class V1:
        def __init__(self, force_ocr=False):
            self.version = "v1"

        def extract(self, payload):
            return "plain", [], "v1"

    class V2:
        def __init__(self, force_ocr=False):
            self.version = "v2"

        def extract(self, payload):
            return "plain", [], "v2"

    try:
        inst1 = Registry.resolve("test_redef", V1, force_ocr=False)
        assert inst1.version == "v1"
        inst2 = Registry.resolve("test_redef", V2, force_ocr=False)
        assert inst2.version == "v2"  # not the stale cached V1
        assert Registry.resolve_class("test_redef")[1] is V2
        # same class again -> cache reuse, no churn
        assert Registry.resolve("test_redef", V2, force_ocr=False) is inst2
    finally:
        Registry._strategies.pop("test_redef", None)
        Registry.clear_cache()
