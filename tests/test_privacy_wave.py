"""Semantics tests for the wave-18 entries: dp_noisy_counts (Laplace
mechanism with portable seeded noise) and kwic_snippets
(keyword-in-context extraction).  The DuckDB value-hash gate is
scripts/check_queries.py; these pin mechanism properties and plan
shapes."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math

from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_curation import (
    _DP_EPS_X10,
    _KWIC_RADIUS,
    _KWIC_TERMS,
    q_dp_noisy_counts,
    q_kwic_snippets,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# dp_noisy_counts
# ---------------------------------------------------------------------------


def test_dp_noise_matches_inverse_cdf(spark):
    eps = _DP_EPS_X10 / 10.0
    rows = q_dp_noisy_counts(spark, SF).collect()
    true_counts = {
        r["source"]: r["cnt"]
        for r in _t(spark, SF, "documents")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert {r["source"] for r in rows} == set(true_counts)
    for r in rows:
        h = int(hashlib.md5(f"{r['source']}:dp".encode()).hexdigest()[:4], 16)
        u = (h + 0.5) / 65536.0
        v = u - 0.5
        want = -(1.0 / eps) * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v))
        assert r["n_true"] == true_counts[r["source"]]
        assert r["epsilon"] == eps
        assert abs(r["noise"] - want) <= 5e-7
        assert abs(r["n_noisy"] - (r["n_true"] + want)) <= 2e-6


def test_dp_noise_is_centered_and_varied(spark):
    rows = q_dp_noisy_counts(spark, SF).collect()
    noises = [r["noise"] for r in rows]
    # the hash-driven draws are not degenerate: both signs occur and
    # no two groups share a draw on fixtures
    assert any(n > 0 for n in noises) and any(n < 0 for n in noises)
    assert len(set(noises)) == len(noises)


def test_dp_plan_is_single_partial_agg(spark):
    p = _plan_of(q_dp_noisy_counts(spark, SF))
    assert "partial_count" in p
    assert p.count("Exchange") <= 2  # the groupBy + final AQE coalesce
    assert "Window" not in p


# ---------------------------------------------------------------------------
# kwic_snippets
# ---------------------------------------------------------------------------


def test_kwic_matches_python_slicing(spark):
    docs = {
        r["doc_id"]: (r["text"] or "")
        for r in _t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    got = {
        (r["doc_id"], r["term"]): r
        for r in q_kwic_snippets(spark, SF).collect()
    }
    want_keys = set()
    for doc_id, text in docs.items():
        for term in _KWIC_TERMS:
            idx = text.find(term)  # 0-based; -1 = miss
            if idx < 0:
                continue
            want_keys.add((doc_id, term))
            r = got[(doc_id, term)]
            assert r["pos"] == idx + 1
            start = max(0, idx - _KWIC_RADIUS)
            end = idx + len(term) + _KWIC_RADIUS
            assert r["snippet"] == text[start:end]
            assert term in r["snippet"]
    assert set(got) == want_keys
    assert want_keys, "watchlist must hit on fixtures"


def test_kwic_plan_zero_exchanges(spark):
    p = _plan_of(q_kwic_snippets(spark, SF))
    assert "Exchange" not in p  # embarrassingly-parallel grep
    assert "Generate" in p  # the map-side watchlist explode
