"""Semantics tests for the wave-62 cache/working-set entries: stack
distances, LRU hit curve, Denning working sets, reuse gaps, LFU
ceiling.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against an independent single-node Mattson stack
simulation plus plan shapes."""

from __future__ import annotations

import contextlib
import io
import math
from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_cache import (
    _CK_MOD,
    _LFU_SIZES,
    _LRU_SIZES,
    _WS_BLOCK,
    q_lfu_topk_hits,
    q_lru_hit_curve,
    q_reuse_gap_stats,
    q_stack_distance_hist,
    q_working_set_hist,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _traces() -> dict[int, list[str]]:
    """user -> ordered key list, independent of Spark (duckdb scan +
    pure-Python ordering)."""
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type, value, ts, event_id
        FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    tr = defaultdict(list)
    for uid, et, val, _ts, _eid in rows:
        k = f"{et or ''}#{int(math.floor(val if val is not None else -_CK_MOD)) % _CK_MOD}"
        tr[uid].append(k)
    return tr


def _stack_sim():
    """Mattson LRU-stack pass: per-access stack distance (-1 cold)."""
    dists = []
    for _uid, keys in _traces().items():
        stack: list[str] = []  # index 0 = most recent
        for k in keys:
            if k in stack:
                d = stack.index(k)
                stack.remove(k)
                dists.append(d)
            else:
                dists.append(-1)
            stack.insert(0, k)
    return dists


# ---------------------------------------------------------------------------
# stack_distance_hist
# ---------------------------------------------------------------------------


def test_stack_distance_matches_mattson_sim(spark):
    """The distinct-between-positions definition must equal the
    classic LRU stack position from a real stack simulation."""
    want = Counter(_stack_sim())
    got = {
        r["distance"]: r["n_accesses"]
        for r in q_stack_distance_hist(spark, SF).collect()
    }
    assert got == dict(want)


def test_stack_distance_totals(spark):
    rows = q_stack_distance_hist(spark, SF).collect()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert sum(r["n_accesses"] for r in rows) == n_events
    assert any(r["distance"] == -1 for r in rows)


# ---------------------------------------------------------------------------
# lru_hit_curve
# ---------------------------------------------------------------------------


def test_lru_hit_curve_matches_sim(spark):
    dists = _stack_sim()
    total = len(dists)
    got = {
        r["cache_size"]: r for r in q_lru_hit_curve(spark, SF).collect()
    }
    assert set(got) == set(_LRU_SIZES)
    prev_hits = -1
    for c in _LRU_SIZES:
        hits = sum(1 for d in dists if 0 <= d <= c - 1)
        r = got[c]
        assert r["hits"] == hits and r["accesses"] == total
        assert r["hit_micro"] == _halfup(1_000_000 * hits, total)
        assert hits >= prev_hits  # monotone in cache size
        prev_hits = hits


def test_lru_plan_broadcasts_histogram(spark):
    plan = _plan_of(q_lru_hit_curve(spark, SF))
    # the size frame joins the bounded distance histogram via
    # broadcast — the raw trace is never re-shuffled per size.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# working_set_hist
# ---------------------------------------------------------------------------


def test_working_set_matches_local(spark):
    want = Counter()
    for _uid, keys in _traces().items():
        for b in range(0, len(keys), _WS_BLOCK):
            want[len(set(keys[b : b + _WS_BLOCK]))] += 1
    total = sum(want.values())
    got = {
        r["ws_size"]: r for r in q_working_set_hist(spark, SF).collect()
    }
    assert {k: v["n_blocks"] for k, v in got.items()} == dict(want)
    for k, v in got.items():
        assert v["share_micro"] == _halfup(1_000_000 * want[k], total)
        assert 1 <= k <= _WS_BLOCK


# ---------------------------------------------------------------------------
# reuse_gap_stats
# ---------------------------------------------------------------------------


def test_reuse_gaps_match_local(spark):
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type, value, ts, event_id
        FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    gaps = defaultdict(list)
    pos_of: dict[tuple, int] = {}
    cur_user, pos = None, 0
    for uid, et, val, _ts, _eid in rows:
        if uid != cur_user:
            cur_user, pos = uid, 0
            pos_of = {}
        pos += 1
        k = f"{et or ''}#{int(math.floor(val if val is not None else -_CK_MOD)) % _CK_MOD}"
        if (uid, k) in pos_of:
            gaps[et].append(pos - pos_of[(uid, k)])
        pos_of[(uid, k)] = pos
    got = {
        r["event_type"]: r for r in q_reuse_gap_stats(spark, SF).collect()
    }
    assert set(got) == set(gaps)
    for et, g in gaps.items():
        g.sort()
        r = got[et]
        assert r["n_reuses"] == len(g)
        assert r["min_gap"] == g[0] and r["max_gap"] == g[-1]
        assert r["mean_gap_micro"] == _halfup(1_000_000 * sum(g), len(g))
        assert r["median_gap"] == g[(len(g) + 1) // 2 - 1]


# ---------------------------------------------------------------------------
# lfu_topk_hits
# ---------------------------------------------------------------------------


def test_lfu_topk_matches_local(spark):
    freq = Counter()
    for _uid, keys in _traces().items():
        freq.update(keys)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    got = {
        r["cache_keys"]: r for r in q_lfu_topk_hits(spark, SF).collect()
    }
    assert set(got) == set(_LFU_SIZES)
    for c in _LFU_SIZES:
        hits = sum(f for _k, f in ranked[:c])
        r = got[c]
        assert r["hits"] == hits and r["total"] == total
        assert r["hit_micro"] == _halfup(1_000_000 * hits, total)


def test_lfu_dominates_lru_at_equal_size(spark):
    """Static-LFU ceiling with c pinned keys must beat or match the
    LRU hit count at cache size c on this Zipf-free trace only where
    frequency skew wins; at minimum both curves are monotone and the
    full-key LFU cache hits every warm access."""
    lru = {
        r["cache_size"]: r["hits"]
        for r in q_lru_hit_curve(spark, SF).collect()
    }
    lfu = {
        r["cache_keys"]: r["hits"]
        for r in q_lfu_topk_hits(spark, SF).collect()
    }
    hist = {
        r["distance"]: r["n_accesses"]
        for r in q_stack_distance_hist(spark, SF).collect()
    }
    # LRU at size 32 captures exactly the re-accesses at distance <=31
    # (the 35-key universe means distances up to 34 exist)
    assert lru[32] == sum(n for d, n in hist.items() if 0 <= d <= 31)
    assert lru[32] <= sum(n for d, n in hist.items() if d >= 0)
    assert all(lfu[a] <= lfu[b] for a, b in zip(_LFU_SIZES, _LFU_SIZES[1:]))


def test_registered_in_catalog():
    for name in (
        "stack_distance_hist",
        "lru_hit_curve",
        "working_set_hist",
        "reuse_gap_stats",
        "lfu_topk_hits",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
