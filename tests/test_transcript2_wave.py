"""Semantics tests for the wave-59 transcript-analytics entries:
within-conversation turn novelty, adjacent-turn dialog segmentation,
context-packing overlap audit, role verbosity, and tool position
profile.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against an independent single-node recomputation
over the shared transcript synthesis plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_transcript2 import (
    _CO_CTX,
    _DS_THRESH_MICRO,
    q_context_overlap_audit,
    q_dialog_segments,
    q_role_verbosity,
    q_tool_use_positions,
    q_turn_novelty,
)
from occular_ocr_spark.queries_transcript import _turns

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _convs(spark):
    """{conv_id: [(turn_idx, role, tool, tokens)...] sorted by idx}."""
    rows = _turns(spark, SF).collect()
    convs = collections.defaultdict(list)
    for r in rows:
        toks = [t for t in (r["text"] or "").split(" ") if t != ""]
        convs[r["conv_id"]].append(
            (r["turn_idx"], r["role"], r["tool"], toks)
        )
    for v in convs.values():
        v.sort()
    return convs


# ---------------------------------------------------------------------------
# turn_novelty
# ---------------------------------------------------------------------------


def test_turn_novelty_matches_local(spark):
    convs = _convs(spark)
    want = {}
    for cid, turns in convs.items():
        seen = set()
        novs = []
        vocab = 0
        for _idx, _role, _tool, toks in turns:
            types = set(toks)
            new = types - seen
            seen |= types
            vocab += len(new)
            novs.append(_halfup(2_000_000 * len(new), 2 * len(types)))
        want[cid] = (
            len(turns),
            vocab,
            _halfup(2 * sum(novs), 2 * len(novs)),
        )
    got = {
        r["conv_id"]: (
            r["n_turns"],
            r["conv_vocab"],
            r["mean_novelty_micro"],
        )
        for r in q_turn_novelty(spark, SF).collect()
    }
    assert got == want


def test_turn_novelty_first_turn_is_full(spark):
    # a single-turn conversation has mean novelty exactly 1.0
    rows = q_turn_novelty(spark, SF).collect()
    for r in rows:
        assert 0 < r["mean_novelty_micro"] <= 1_000_000
        if r["n_turns"] == 1:
            assert r["mean_novelty_micro"] == 1_000_000


def test_turn_novelty_plan_conv_partitioned(spark):
    plan = _plan_of(q_turn_novelty(spark, SF))
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(conv_id" in plan


# ---------------------------------------------------------------------------
# dialog_segments
# ---------------------------------------------------------------------------


def test_dialog_segments_matches_local(spark):
    convs = _convs(spark)
    want = {}
    for cid, turns in convs.items():
        types = [set(t[3]) for t in turns]
        jacs = []
        for a, b in zip(types, types[1:]):
            i = len(a & b)
            u = len(a) + len(b) - i
            jacs.append(_halfup(2_000_000 * i, 2 * u))
        nb = sum(j < _DS_THRESH_MICRO for j in jacs)
        mean = (
            _halfup(2 * sum(jacs), 2 * len(jacs)) if jacs else None
        )
        want[cid] = (len(turns), nb, nb + 1, mean)
    got = {
        r["conv_id"]: (
            r["n_turns"],
            r["n_boundaries"],
            r["n_segments"],
            r["mean_adj_jaccard_micro"],
        )
        for r in q_dialog_segments(spark, SF).collect()
    }
    assert got == want


def test_dialog_segments_bounds(spark):
    for r in q_dialog_segments(spark, SF).collect():
        assert 1 <= r["n_segments"] <= r["n_turns"]
        assert r["n_boundaries"] == r["n_segments"] - 1
        if r["n_turns"] == 1:
            assert r["mean_adj_jaccard_micro"] is None


def test_dialog_segments_plan_co_partitioned(spark):
    plan = _plan_of(q_dialog_segments(spark, SF))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# context_overlap_audit
# ---------------------------------------------------------------------------


def test_context_overlap_matches_local(spark):
    convs = _convs(spark)
    want = {}
    for cid, turns in convs.items():
        n = len(turns)
        raw = packed = 0
        for pos, (_i, _r, _t, toks) in enumerate(turns, start=1):
            raw += len(toks)
            packed += len(toks) * (1 + min(_CO_CTX, n - pos))
        want[cid] = (
            n,
            raw,
            packed,
            _halfup(2_000_000 * packed, 2 * raw),
        )
    got = {
        r["conv_id"]: (
            r["n_turns"],
            r["raw_tokens"],
            r["packed_tokens"],
            r["dup_factor_micro"],
        )
        for r in q_context_overlap_audit(spark, SF).collect()
    }
    assert got == want


def test_context_overlap_factor_band(spark):
    # duplication factor lives in [1, 1 + _CO_CTX]
    for r in q_context_overlap_audit(spark, SF).collect():
        assert 1_000_000 <= r["dup_factor_micro"] <= (
            (1 + _CO_CTX) * 1_000_000
        )
        if r["n_turns"] == 1:
            assert r["dup_factor_micro"] == 1_000_000


def test_context_overlap_single_exchange(spark):
    plan = _plan_of(q_context_overlap_audit(spark, SF))
    assert plan.count("documents.parquet") <= 2
    assert "hashpartitioning(conv_id" in plan


# ---------------------------------------------------------------------------
# role_verbosity
# ---------------------------------------------------------------------------


def test_role_verbosity_matches_local(spark):
    convs = _convs(spark)
    want = {}
    for cid, turns in convs.items():
        nu = na = ut = at = 0
        for _i, role, _t, toks in turns:
            if role == "user":
                nu += 1
                ut += len(toks)
            else:
                na += 1
                at += len(toks)
        ratio = (
            _halfup(2_000_000 * at, 2 * ut) if ut else None
        )
        want[cid] = (nu, na, ut, at, ratio)
    got = {
        r["conv_id"]: (
            r["n_user_turns"],
            r["n_asst_turns"],
            r["user_tokens"],
            r["asst_tokens"],
            r["verbosity_ratio_micro"],
        )
        for r in q_role_verbosity(spark, SF).collect()
    }
    assert got == want


def test_role_verbosity_counts_cover_corpus(spark):
    rows = q_role_verbosity(spark, SF).collect()
    n_turns = sum(r["n_user_turns"] + r["n_asst_turns"] for r in rows)
    assert n_turns == _turns(spark, SF).count()


# ---------------------------------------------------------------------------
# tool_use_positions
# ---------------------------------------------------------------------------


def test_tool_use_positions_matches_local(spark):
    convs = _convs(spark)
    cells = collections.Counter()
    for turns in convs.values():
        n = len(turns)
        for pos, (_i, _r, tool, _toks) in enumerate(turns, start=1):
            if tool is not None:
                cells[(tool, (10 * pos + n - 1) // n)] += 1
    tot = collections.Counter()
    for (tool, _d), c in cells.items():
        tot[tool] += c
    want = {
        (tool, d): (c, _halfup(2_000_000 * c, 2 * tot[tool]))
        for (tool, d), c in cells.items()
    }
    got = {
        (r["tool"], r["decile"]): (r["n_calls"], r["share_micro"])
        for r in q_tool_use_positions(spark, SF).collect()
    }
    assert got == want


def test_tool_use_positions_shares_sum(spark):
    rows = q_tool_use_positions(spark, SF).collect()
    per = collections.defaultdict(int)
    for r in rows:
        assert 1 <= r["decile"] <= 10
        per[r["tool"]] += r["n_calls"]
    assert set(per) == {"search", "code"}
    shares = collections.defaultdict(int)
    for r in rows:
        shares[r["tool"]] += r["share_micro"]
    for tool, s in shares.items():
        # per-cell half-up rounding keeps the sum within n_cells of 1.0
        assert abs(s - 1_000_000) <= 10


def test_tool_use_positions_plan_bounded_output(spark):
    plan = _plan_of(q_tool_use_positions(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
