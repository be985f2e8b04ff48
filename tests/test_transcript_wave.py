"""Semantics tests for the wave-19 transcript entries:
turn_take_entropy (role-transition balance) and tool_call_depth
(consecutive-tool-burst profile).  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as _Q  # noqa: F401  (registration)
from occular_ocr_spark.queries_transcript import (
    _turns,
    q_tool_call_depth,
    q_turn_take_entropy,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _collect_turns(spark):
    by_conv = collections.defaultdict(list)
    for r in _turns(spark, SF).collect():
        by_conv[r["conv_id"]].append(r)
    for turns in by_conv.values():
        turns.sort(key=lambda r: r["turn_idx"])
    return by_conv


def test_turn_take_entropy_matches_naive(spark):
    by_conv = _collect_turns(spark)
    got = {r["conv_id"]: r for r in q_turn_take_entropy(spark, SF).collect()}
    want_convs = {c for c, ts in by_conv.items() if len(ts) >= 2}
    assert set(got) == want_convs
    for conv, turns in by_conv.items():
        if len(turns) < 2:
            continue
        trans = collections.Counter(
            (a["role"], b["role"]) for a, b in zip(turns, turns[1:])
        )
        n = sum(trans.values())
        h = math.log(n) - sum(c * math.log(c) for c in trans.values()) / n
        r = got[conv]
        assert r["n_transitions"] == n
        assert r["n_patterns"] == len(trans)
        assert abs(r["entropy"] - h) <= 5e-7
        assert r["entropy"] >= -1e-9
        # a single repeated transition type means zero entropy
        if len(trans) == 1:
            assert abs(r["entropy"]) <= 1e-9


def test_tool_call_depth_matches_naive(spark):
    by_conv = _collect_turns(spark)
    got = {r["conv_id"]: r for r in q_tool_call_depth(spark, SF).collect()}
    want = {}
    for conv, turns in by_conv.items():
        idxs = [t["turn_idx"] for t in turns if t["tool"] is not None]
        if not idxs:
            continue
        bursts = []
        run = 1
        for a, b in zip(idxs, idxs[1:]):
            if b == a + 1:
                run += 1
            else:
                bursts.append(run)
                run = 1
        bursts.append(run)
        want[conv] = (len(idxs), len(bursts), max(bursts))
    assert set(got) == set(want)
    for conv, (n_tool, n_bursts, max_depth) in want.items():
        r = got[conv]
        assert r["n_tool_turns"] == n_tool
        assert r["n_bursts"] == n_bursts
        assert r["max_depth"] == max_depth
        assert r["max_depth"] <= r["n_tool_turns"]


def test_transcript_wave_plans_single_conv_shuffle(spark):
    for q in (q_turn_take_entropy, q_tool_call_depth):
        p = _plan_of(q(spark, SF))
        assert "hashpartitioning(conv_id" in p
        assert "CartesianProduct" not in p
