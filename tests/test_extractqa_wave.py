"""Semantics tests for the wave-68 extraction-QA entries: yield
report, gate rejection telemetry, assembly audit, method×position
matrix, turn length profile.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin the QA reductions against the
registered extraction oracle (whose per-turn equality is itself
golden-pinned) and lock the local CTE fragment to it."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_extractqa import (
    _EXTRACT_CTES,
    q_conversation_assembly_audit,
    q_extraction_yield_report,
    q_gate_rejection_report,
    q_method_position_matrix,
    q_turn_length_profile,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


def _extracted_rows():
    """(conv_id, turn_idx, branch, raw, method, extracted) from the
    module's CTE fragment."""
    return _con().execute(
        f"WITH {_EXTRACT_CTES} SELECT * FROM extracted"
    ).fetchall()


def test_cte_fragment_matches_registered_oracle():
    """The local base/gated CTEs must reproduce the registered
    ORACLE_EXTRACT_TRANSCRIPTS row set exactly — lockstep guard."""
    con = _con()
    mine = sorted(
        con.execute(
            f"WITH {_EXTRACT_CTES} SELECT conv_id, turn_idx, method,"
            " extracted FROM extracted"
        ).fetchall()
    )
    reg = sorted(con.execute(Q.ORACLES["extract_transcripts"]).fetchall())
    assert mine == reg


def test_yield_report_matches_oracle_model(spark):
    rows = _extracted_rows()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for _c, _t, _b, raw, method, ext in rows:
        a = agg[method]
        a[0] += 1
        a[1] += len(raw)
        a[2] += len(ext)
        a[3] += 1 if ext == "" else 0
    got = {
        r["method"]: r
        for r in q_extraction_yield_report(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for m, (n, rc, ec, ne) in agg.items():
        r = got[m]
        assert r["n_turns"] == n and r["raw_chars"] == rc
        assert r["extracted_chars"] == ec and r["n_empty"] == ne
        assert r["yield_micro"] == _halfup(1_000_000 * ec, rc)
    # non-html methods never lose characters
    for m in ("pdf_text", "markup", "plain"):
        assert got[m]["n_empty"] == 0
        assert got[m]["yield_micro"] == 1_000_000


def test_gate_rejections_html_only(spark):
    rows = _extracted_rows()
    agg = defaultdict(lambda: [0, 0, 0])
    for _c, _t, _b, raw, method, ext in rows:
        a = agg[method]
        if ext != "":
            a[0] += 1
        elif len(raw) < 38:
            a[1] += 1
        else:
            a[2] += 1
    got = {
        r["method"]: r for r in q_gate_rejection_report(spark, SF).collect()
    }
    for m, (kept, rs, rsc) in agg.items():
        r = got[m]
        assert r["n_kept"] == kept
        assert r["n_rejected_short"] == rs
        assert r["n_rejected_score"] == rsc
        assert r["n_rejected"] == rs + rsc
        assert r["reject_micro"] == _halfup(
            1_000_000 * (rs + rsc), kept + rs + rsc
        )
    for m in ("pdf_text", "markup", "plain"):
        assert got[m]["n_rejected"] == 0


def test_assembly_audit_contiguous(spark):
    rows = _extracted_rows()
    per = defaultdict(list)
    chars = Counter()
    for c, t, _b, _raw, _m, ext in rows:
        per[c].append(t)
        chars[c] += len(ext)
    got = {
        r["conv_id"]: r
        for r in q_conversation_assembly_audit(spark, SF).collect()
    }
    assert set(got) == set(per)
    for c, idxs in per.items():
        r = got[c]
        assert r["n_turns"] == len(idxs)
        assert r["n_distinct"] == len(set(idxs))
        assert r["first_idx"] == min(idxs) and r["last_idx"] == max(idxs)
        want_contig = len(idxs) == len(set(idxs)) and max(idxs) - min(
            idxs
        ) + 1 == len(idxs)
        assert r["contiguous"] == want_contig
        assert r["extracted_chars"] == chars[c]
        # synthesized convs are gap-free by construction
        assert r["contiguous"]


def test_method_position_matrix(spark):
    rows = _extracted_rows()
    cell = Counter((t, m) for _c, t, _b, _raw, m, _e in rows)
    tot = Counter(t for _c, t, _b, _raw, _m, _e in rows)
    got = {
        (r["turn_idx"], r["method"]): r
        for r in q_method_position_matrix(spark, SF).collect()
    }
    assert set(got) == set(cell)
    for (t, m), n in cell.items():
        r = got[(t, m)]
        assert r["n_turns"] == n and r["pos_total"] == tot[t]
        assert r["share_micro"] == _halfup(1_000_000 * n, tot[t])
    # doc_id%4 vs doc_id%10: even positions alternate html/markup,
    # odd positions pdf_text/plain
    for (t, m) in got:
        if t % 2 == 0:
            assert m in ("html", "markup")
        else:
            assert m in ("pdf_text", "plain")


def test_turn_length_profile(spark):
    rows = _extracted_rows()
    per = defaultdict(lambda: [0, 0])
    total = 0
    for _c, t, _b, _raw, _m, ext in rows:
        per[t][0] += 1
        per[t][1] += len(ext)
        total += len(ext)
    got = {
        r["turn_idx"]: r for r in q_turn_length_profile(spark, SF).collect()
    }
    assert set(got) == set(per)
    for t, (n, ch) in per.items():
        r = got[t]
        assert r["n_turns"] == n and r["chars"] == ch
        assert r["mean_chars_micro"] == _halfup(1_000_000 * ch, n)
        assert r["mass_share_micro"] == _halfup(1_000_000 * ch, total)


def test_registered_in_catalog():
    for name in (
        "extraction_yield_report",
        "gate_rejection_report",
        "conversation_assembly_audit",
        "method_position_matrix",
        "turn_length_profile",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
