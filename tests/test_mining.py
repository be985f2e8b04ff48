"""Mining catalog (winnowing / SCD2 / semdedup / stream-stream join):
kernel property tests + Spark-side semantics checks.  Gate-level
value-hash equality vs DuckDB is covered by scripts/check_queries.py
(the driver mirror); these tests pin the algorithmic invariants."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from occular_ocr_spark.queries_mining import (
    _SEM_THRESH,
    _W_K,
    _W_MOD,
    _W_POS,
    _W_W,
    _winnow_select,
    q_scd2_dimension,
    q_semdedup,
    q_winnow_fingerprints,
)

SF = "/root/testdata/sf0.001"


def _naive_winnow(comb: np.ndarray, w: int) -> np.ndarray:
    """Reference selection: min of every run of min(w, n) entries."""
    n = len(comb)
    if n == 0:
        return comb[:0]
    ws = min(w, n)
    sel = {int(comb[j : j + ws].min()) for j in range(n - ws + 1)}
    return np.array(sorted(sel), dtype=comb.dtype)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=64),
    st.integers(min_value=1, max_value=12),
)
def test_winnow_select_matches_naive(values, w):
    comb = np.array(values, dtype="int64")
    assert np.array_equal(_winnow_select(comb, w), _naive_winnow(comb, w))


def test_winnow_guarantee_shared_substring():
    """The winnowing guarantee: two texts sharing a substring of length
    >= k + w - 1 share at least one selected fingerprint."""
    shared = "the quick brown fox jumps over it"  # 33 >= _W_K + _W_W - 1
    assert len(shared) >= _W_K + _W_W - 1
    t1 = "AAAA " + shared + " BBBB"
    t2 = "cccccccc " + shared + " dddd"

    def fps(t):
        codes = np.frombuffer(t.encode(), dtype="uint8").astype("int64")
        weights = np.array([31**j for j in range(_W_K)], dtype="int64")
        poly = np.correlate(codes, weights)
        pos = np.arange(1, len(poly) + 1, dtype="int64")
        comb = (poly % _W_MOD) * _W_POS + (_W_POS - 1 - pos)
        return {int(v) // _W_POS for v in _winnow_select(comb, _W_W)}

    assert fps(t1) & fps(t2)


def test_winnow_tie_breaks_rightmost():
    """Equal hashes in one window: the RIGHTMOST position is selected
    (the standard winnowing tie rule, encoded via the inverted low
    bits)."""
    comb = np.array(
        [5 * _W_POS + (_W_POS - 1 - 1), 5 * _W_POS + (_W_POS - 1 - 2)],
        dtype="int64",
    )
    sel = _winnow_select(comb, 8)
    assert len(sel) == 1
    assert _W_POS - 1 - int(sel[0]) % _W_POS == 2  # rightmost position wins


def test_winnow_fingerprints_spark(spark):
    rows = q_winnow_fingerprints(spark, SF).collect()
    assert rows and all(r["n_fp"] >= 0 for r in rows)
    by_id = {r["doc_id"]: r for r in rows}
    # digests are md5 hex; short/empty docs get md5('')
    assert all(len(r["fp_digest"]) == 32 for r in rows)
    # every doc from the table appears exactly once
    assert len(by_id) == len(rows)


def test_scd2_intervals_partition_time(spark):
    rows = q_scd2_dimension(spark, SF).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for recs in by_user.values():
        recs.sort(key=lambda r: r["version"])
        # versions are 1..n dense; intervals chain exactly; one current
        assert [r["version"] for r in recs] == list(range(1, len(recs) + 1))
        for a, b in zip(recs, recs[1:]):
            assert a["eff_to_us"] == b["eff_from_us"]
            assert a["event_type"] != b["event_type"]
        assert [r["is_current"] for r in recs] == [False] * (len(recs) - 1) + [True]


def test_semdedup_verdict_consistency(spark):
    rows = q_semdedup(spark, SF).collect()
    assert rows
    # every vector gets exactly one verdict
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    kept = sum(1 for r in rows if r["kept"])
    assert 0 < kept <= len(rows)


@pytest.mark.slow
def test_streaming_join_matches_batch(spark):
    from occular_ocr_spark.queries_ext import (
        _SSJ_REPLY_WINDOW_S,
        _stream_turns,
        q_streaming_join,
    )
    from pyspark.sql import functions as F

    got = {
        (r["conv_id"], r["user_idx"], r["asst_idx"], r["gap_s"])
        for r in q_streaming_join(spark, SF).collect()
    }
    t = _stream_turns(spark, SF)
    u = t.where(F.col("role") == "user").select(
        F.col("conv_id").alias("c"), F.col("turn_idx").alias("ui"), F.col("ts").alias("ut")
    )
    a = t.where(F.col("role") == "assistant").select(
        F.col("conv_id").alias("c2"), F.col("turn_idx").alias("ai"), F.col("ts").alias("at")
    )
    exp = {
        (r["c"], r["ui"], r["ai"], r["g"])
        for r in u.join(
            a,
            (F.col("c") == F.col("c2"))
            & (F.col("at") > F.col("ut"))
            & (
                F.col("at")
                <= F.col("ut") + F.expr(f"INTERVAL {_SSJ_REPLY_WINDOW_S} SECONDS")
            ),
        )
        .select(
            "c",
            "ui",
            "ai",
            ((F.unix_micros("at") - F.unix_micros("ut")) / 1_000_000)
            .cast("int")
            .alias("g"),
        )
        .collect()
    }
    assert got == exp and got
