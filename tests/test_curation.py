"""Semantics of the corpus-curation entries (queries_curation.py) on
crafted corpora where the expected result is hand-checkable: span-level
dedup keeps the canonical owner and ignores within-document repeats,
the LM score matches the closed-form unigram computation, and the
funnel gates count exactly."""

import math

import pytest

from occular_ocr_spark.queries import QUERIES

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(spark, tmp_path, texts):
    d = str(tmp_path / "corpus")
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    return d


SHARED = "s1 s2 s3 s4 s5 s6 s7 s8"  # exactly _SPAN_K tokens


@pytest.fixture(scope="module")
def span_corpus(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("span")
    return _write_docs(
        spark,
        tmp,
        [
            f"t1 t2 {SHARED} t3 t4",            # doc 0: owner (min doc_id)
            f"u1 u2 {SHARED} u3 u4",            # doc 1: loses the span
            "r1 r2 r3 r4 r5 r6 r7 r8 x "        # doc 2: within-doc repeat
            "r1 r2 r3 r4 r5 r6 r7 r8",          #        (df=1 -> untouched)
            "a b c",                             # doc 3: < K tokens
        ],
    )


def test_scrub_keeps_owner_removes_duplicate(spark, span_corpus):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["scrub_dup_spans"](spark, span_corpus).collect()
    }
    assert rows[0]["n_removed"] == 0
    assert rows[0]["clean_text"] == f"t1 t2 {SHARED} t3 t4"
    assert rows[1]["n_removed"] == 8
    assert rows[1]["clean_text"] == "u1 u2 u3 u4"
    # within-document repetition is NOT cross-document duplication
    assert rows[2]["n_removed"] == 0
    # sub-window documents pass through untouched
    assert rows[3]["n_removed"] == 0
    assert rows[3]["clean_text"] == "a b c"


def test_dup_span_report_counts(spark, span_corpus):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["dup_span_report"](spark, span_corpus).collect()
    }
    # doc 0: 12 tokens -> 5 windows, exactly 1 shared across docs
    assert rows[0]["n_windows"] == 5 and rows[0]["n_dup_windows"] == 1
    assert rows[1]["n_windows"] == 5 and rows[1]["n_dup_windows"] == 1
    # doc 2's repeated window lives in one document only -> df = 1
    assert rows[2]["n_dup_windows"] == 0
    # doc 3 has no windows at all
    assert rows[3]["n_windows"] == 0 and rows[3]["dup_ratio"] == 0.0


def test_unigram_logprob_closed_form(spark, tmp_path):
    d = _write_docs(spark, tmp_path, ["x x", "x y"])
    rows = {
        r["doc_id"]: r
        for r in QUERIES["unigram_logprob"](spark, d).collect()
    }
    # counts: x=3, y=1, N=4
    assert rows[0]["logprob2"] == round(math.log2(3 / 4), 6)
    assert rows[1]["logprob2"] == round(
        (math.log2(3 / 4) + math.log2(1 / 4)) / 2, 6
    )
    # the doc with the rare token scores strictly lower
    assert rows[1]["logprob2"] < rows[0]["logprob2"]


def test_quality_funnel_gate_by_gate(spark, tmp_path):
    # gates: n>=20; stop*50>=n; distinct*5>=2n; mean word len in [4,6]
    good = "the a " + " ".join(f"word{i:02d}" for i in range(18))
    d = _write_docs(
        spark,
        tmp_path,
        [
            good,                          # passes all four gates
            "only five short words here",  # fails 1_min_tokens (n=5)
            " ".join(f"v{i}" for i in range(25)),  # no stopwords: fails stage 2
            "the " + " ".join(["dup"] * 24),  # TTR 2/25: fails stage 3
            # distinct long tokens: passes TTR, mean word len ~14 fails 4
            "the a " + " ".join(f"verylongtoken{i:02d}" for i in range(18)),
        ],
    )
    rows = {
        r["stage"]: r["n_pass"]
        for r in QUERIES["quality_funnel"](spark, d).collect()
    }
    assert rows["0_total"] == 5
    assert rows["1_min_tokens"] == 4
    assert rows["2_stopword_floor"] == 3
    assert rows["3_type_token_ratio"] == 2
    assert rows["4_mean_word_len"] == 1


def test_cdc_chunks_reconstruct_and_shift(spark, tmp_path):
    """Chunks tile the document exactly, and — the property content-
    defined chunking exists for — an insertion near the head leaves the
    tail chunks byte-identical (fixed-stride chunking would shift every
    downstream chunk)."""
    base = (
        "key agg row scan slow fast table value part hash value table "
        "part a row fast merge batch part value fast spark a a the line"
    )
    d = _write_docs(spark, tmp_path, [base, "XY " + base, "short", ""])
    rows = QUERIES["cdc_chunks"](spark, d).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in ((0, base), (1, "XY " + base), (2, "short")):
        ch = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert "".join(r["chunk"] for r in ch) == text
        # starts are contiguous: each chunk begins where the last ended
        pos = 1
        for r in ch:
            assert r["start"] == pos and r["chunk_len"] == len(r["chunk"])
            pos += r["chunk_len"]
    assert 3 not in by_doc  # empty doc -> zero chunks
    assert len(by_doc[2]) == 1  # sub-window doc -> one whole chunk
    # insertion-shift property: chunks strictly after the perturbed
    # region are identical byte strings in both documents
    tail0 = {r["chunk"] for r in by_doc[0] if r["start"] > 20}
    tail1 = {r["chunk"] for r in by_doc[1] if r["start"] > 23}
    assert tail0 & tail1, (tail0, tail1)


def test_curation_entries_total_on_degenerate_docs(spark, tmp_path):
    """Empty text and single-token docs must not crash any entry
    (sequence() ANSI traps)."""
    d = _write_docs(spark, tmp_path, ["", "solo"])
    for name in (
        "dup_span_report",
        "scrub_dup_spans",
        "unigram_logprob",
        "quality_funnel",
        "cdc_chunks",
    ):
        assert QUERIES[name](spark, d).count() >= 0


# ---------------------------------------------------------------------------
# pareto_frontier (wave 9)
# ---------------------------------------------------------------------------


def test_pareto_frontier_matches_bruteforce_dominance(spark):
    SF = "/root/testdata/sf0.001"
    from occular_ocr_spark.queries import _t
    from occular_ocr_spark.queries_curation import q_pareto_frontier

    import pyspark.sql.functions as F

    docs = (
        _t(spark, SF, "documents")
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("d1"),
            F.expr(
                "CAST(size(array_distinct(split(text, ' '))) * 10000"
                " DIV size(split(text, ' ')) AS INT)"
            ).alias("d2"),
        )
        .collect()
    )
    pts = [(r["doc_id"], r["d1"], r["d2"]) for r in docs]
    want = {
        i
        for i, a1, a2 in pts
        if not any(
            (b1 >= a1 and b2 >= a2 and (b1 > a1 or b2 > a2))
            for _, b1, b2 in pts
        )
    }
    got = {r["doc_id"] for r in q_pareto_frontier(spark, SF).collect()}
    assert got == want
    assert len(got) > 1  # a real curve, not a single corner point


def test_pareto_frontier_plan_no_self_join(spark):
    SF = "/root/testdata/sf0.001"
    from occular_ocr_spark.queries_curation import q_pareto_frontier
    from tests.test_plans import n_nodes, plan_of

    p = plan_of(q_pareto_frontier(spark, SF))
    # one broadcast join against the value-level frontier table; the
    # O(n^2) dominance self-join shape must never appear
    assert n_nodes(p, "CartesianProduct") == 0
    assert n_nodes(p, "SortMergeJoin") == 0
    assert n_nodes(p, "BroadcastHashJoin") == 1
    # the only ordered structure is the value-level prefix window
    assert p.count("rangepartitioning") <= 1
