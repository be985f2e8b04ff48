"""Semantics tests for the wave-100 conversation certifications —
assembled text equality (string for string), shuffle invariance,
split-resume identity, mega-conversation arithmetic, method mix."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_convcert import (
    q_conversation_roundtrip_audit,
    q_mega_conversation_audit,
    q_method_mix_matrix,
    q_split_resume_union_audit,
    q_turn_shuffle_invariance,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, text, n_chars"
        f" FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_roundtrip_text_exact(spark):
    per = defaultdict(list)
    for d, s, t, _n in _docs():
        per[s].append((int(d), t))
    got = {r["conv_id"]: r for r in q_conversation_roundtrip_audit(spark, SF).collect()}
    assert set(got) == set(per)
    for s, turns in per.items():
        want = "\n".join(t for _d, t in sorted(turns))
        r = got[s]
        assert r["n_turns"] == len(turns)
        assert r["text"] == want


def test_shuffle_invariance_text_exact(spark):
    per = defaultdict(list)
    for d, s, t, _n in _docs():
        per[s].append((int(d), t))
    got = {r["conv_id"]: r["text"] for r in q_turn_shuffle_invariance(spark, SF).collect()}
    for s, turns in per.items():
        assert got[s] == "\n".join(t for _d, t in sorted(turns))


def test_split_resume_identity(spark):
    r = q_split_resume_union_audit(spark, SF).collect()[0]
    assert r["n_rows"] == len(_docs())
    assert r["n_unmatched"] == 0
    assert bool(r["all_text_equal"]) is True


def test_mega_conversation_lengths(spark):
    rows = {r["conv_id"]: r for r in q_mega_conversation_audit(spark, SF).collect()}
    assert "MEGA" in rows
    docs = _docs()
    total_turns = sum(r["n_turns"] for r in rows.values())
    assert total_turns == len(docs)
    # the mega conversation is much bigger than the per-source ones
    others = [r["n_turns"] for c, r in rows.items() if c != "MEGA"]
    assert rows["MEGA"]["n_turns"] > max(others)
    for r in rows.values():
        # length identity was hash-checked already; re-assert locally
        assert r["text_len"] > 0


def test_method_mix(spark):
    docs = _docs()
    meth = {0: "html", 1: "pdf_text", 2: "markup", 3: "plain"}
    want = Counter((s, meth[int(d) % 4]) for d, s, _t, _n in docs)
    got = {(r["conv_id"], r["method"]): r["n_turns"] for r in q_method_mix_matrix(spark, SF).collect()}
    assert got == dict(want)


def test_registered_in_catalog():
    for name in (
        "conversation_roundtrip_audit",
        "turn_shuffle_invariance",
        "split_resume_union_audit",
        "mega_conversation_audit",
        "method_mix_matrix",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
