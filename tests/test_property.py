"""Property-based tests (hypothesis): the extractor's guards and
invariants must hold for ARBITRARY payloads, not just fixture shapes —
the generalization of the reference's degenerate-input tests
(tests/test_dbnet.py:38-45, tests/test_smoke.py:67-78)."""

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from occular_ocr_spark.extraction import core

# Payload soup: plain text, tag fragments, entities, fences, JSON-ish,
# unicode, control chars — anything a scraped transcript could carry.
_fragments = st.one_of(
    st.text(max_size=80),
    st.sampled_from(
        [
            "<p>", "</p>", "<div>", "</div>", "<a href='#'>", "</a>",
            "<script>", "</script>", "<em>", "&amp;", "&lt;", "&#65;",
            "```\n", "```", "<output>", "</output>", "\n", "  ",
            '{"blocks":', '[{"type": 0,', '"lines":', '"spans":',
            '[{"text": "x"}]}]}', "}", "]",
        ]
    ),
    st.text(alphabet="<>&\"'`{}[]\\\n\t ", max_size=20),
)
payloads = st.lists(_fragments, max_size=24).map("".join)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(payloads)
def test_extract_turn_total_and_invariant(payload):
    """extract_turn is total (no exception on any input) and its output
    satisfies the structural contract."""
    r = core.extract_turn(payload)
    assert r["method"] in ("html", "pdf_text", "markup", "plain")
    assert isinstance(r["text"], str)
    # text == Y-ordered join of block texts (A2/A3 invariant)
    assert r["text"] == "\n".join(b["text"] for b in r["blocks"])
    ys = [b["span"]["y"] for b in r["blocks"]]
    assert ys == sorted(ys)  # stable Y-sort
    for b in r["blocks"]:
        assert 0.0 <= b["confidence"] <= 1.0  # test_smoke.py:67-78 contract
        sp = b["span"]
        assert 0 <= sp["start"] <= sp["end"] <= max(len(payload), sp["end"])
        assert b["text"].strip() == b["text"] and b["text"] != ""
    # JSON-serializable (the reference pins this, test_smoke.py:76-78)
    json.dumps(r)


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(payloads)
def test_force_ocr_never_uses_text_layer(payload):
    r = core.extract_turn(payload, force_ocr=True)
    assert r["method"] != "pdf_text"  # the dual-path override (pipeline.py:147)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(payloads, min_size=1, max_size=6))
def test_oracle_is_deterministic_and_order_free(texts):
    """Same turns, any arrival order -> identical golden map."""
    from occular_ocr_spark.oracle import golden_text_map

    rows = [
        {"conv_id": "c", "turn_idx": i, "text": t} for i, t in enumerate(texts)
    ]
    fwd = golden_text_map(rows)
    rev = golden_text_map(list(reversed(rows)))
    assert fwd == rev


def test_spark_matches_oracle_on_adversarial_corpus(spark):
    """The Arrow UDF path equals the pure-Python oracle on a hypothesis-
    shrunk adversarial corpus (one Spark job over many generated
    payloads, instead of one job per example)."""
    adversarial = []
    collect = adversarial.append

    @settings(max_examples=120, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(payloads)
    def gather(p):
        collect(p)

    gather()
    rows = [
        {"conv_id": f"c{i % 7}", "turn_idx": i, "text": t}
        for i, t in enumerate(adversarial)
    ]
    from occular_ocr_spark.job import extract_detailed
    from occular_ocr_spark.oracle import golden_text_map

    df = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["text"]) for r in rows],
        "conv_id string, turn_idx int, text string",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in extract_detailed(df, num_partitions=4, salt_buckets=2).collect()
    }
    assert got == golden_text_map(rows)
