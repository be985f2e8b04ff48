"""Semantics tests for the wave-24 entries: simpson_diversity
(order-2 token concentration) and hhi_source_concentration
(Herfindahl index across sources).  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io

from occular_ocr_spark import queries as Q  # noqa: F401  (registration)
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_quality import (
    q_hhi_source_concentration,
    q_simpson_diversity,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_simpson_matches_naive(spark):
    counts = collections.defaultdict(collections.Counter)
    for r in _t(spark, SF, "documents").select("source", "text").collect():
        for tok in (r["text"] or "").split(" "):
            if tok:
                counts[r["source"]][tok] += 1
    got = {r["source"]: r for r in q_simpson_diversity(spark, SF).collect()}
    assert set(got) == set(counts)
    for src, ctr in counts.items():
        n = sum(ctr.values())
        rep = sum(c * (c - 1) for c in ctr.values())
        want = rep / (n * (n - 1))
        r = got[src]
        assert r["total_count"] == n
        assert abs(r["simpson"] - want) <= 5e-7
        assert abs(r["diversity"] - (1 - want)) <= 5e-7
        assert 0.0 <= r["simpson"] <= 1.0


def test_simpson_plan_no_window_no_join(spark):
    p = _plan_of(q_simpson_diversity(spark, SF))
    assert "Window" not in p and "Join" not in p
    assert "partial" in p


def test_hhi_matches_naive(spark):
    counts = collections.Counter(
        r["source"]
        for r in _t(spark, SF, "documents").select("source").collect()
    )
    k = len(counts)
    n = sum(counts.values())
    sq = sum(c * c for c in counts.values())
    row = q_hhi_source_concentration(spark, SF).collect()[0]
    assert row["n_sources"] == k
    assert row["n_docs"] == n
    assert abs(row["hhi"] - sq / (n * n)) <= 5e-7
    want_norm = (k * sq - n * n) / (n * n * (k - 1)) if k > 1 else 1.0
    assert abs(row["hhi_normalized"] - want_norm) <= 5e-7
    # bounds: 1/k <= HHI <= 1, 0 <= normalized <= 1
    assert 1.0 / k - 1e-9 <= row["hhi"] <= 1.0
    assert -1e-9 <= row["hhi_normalized"] <= 1.0
