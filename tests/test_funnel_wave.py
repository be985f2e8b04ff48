"""Semantics tests for the wave-23 entries: dedup_cluster_stats
(near-dup component size histogram) and funnel_latency
(time-to-convert per funnel transition).  The DuckDB value-hash gate
is scripts/check_queries.py; these pin each op against an independent
single-node recomputation."""

from __future__ import annotations

import collections

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_pipeline import (
    q_cc_largestar,
    q_dedup_cluster_stats,
    q_funnel_latency,
)

SF = "/root/testdata/sf0.001"


def test_dedup_cluster_stats_matches_labels(spark):
    labels = collections.Counter(
        r["group_id"] for r in q_cc_largestar(spark, SF).collect()
    )
    hist = collections.Counter(labels.values())
    n_docs_total = sum(labels.values())
    got = {r["size"]: r for r in q_dedup_cluster_stats(spark, SF).collect()}
    assert set(got) == set(hist)
    for size, n_clusters in hist.items():
        r = got[size]
        assert r["n_clusters"] == n_clusters
        assert r["n_docs"] == size * n_clusters
        assert abs(r["doc_share"] - size * n_clusters / n_docs_total) <= 1e-6
    # histogram covers the whole corpus exactly once
    assert sum(r["n_docs"] for r in got.values()) == n_docs_total
    # fixtures contain both singletons and true near-dup clusters
    assert 1 in hist and any(s > 1 for s in hist)


def test_funnel_latency_matches_naive(spark):
    evs = collections.defaultdict(list)
    for r in (
        _t(spark, SF, "events").select("user_id", "event_type", "ts").collect()
    ):
        evs[r["user_id"]].append(
            (r["event_type"], int(r["ts"].timestamp() * 1_000_000))
        )
    d12, d23 = [], []
    for user, rows in evs.items():
        views = [us for t, us in rows if t == "view"]
        if not views:
            continue
        t1 = min(views)
        clicks = [us for t, us in rows if t == "click" and us > t1]
        if not clicks:
            continue
        t2 = min(clicks)
        d12.append(t2 - t1)
        purchases = [us for t, us in rows if t == "purchase" and us > t2]
        if purchases:
            d23.append(min(purchases) - t2)
    got = {r["transition"]: r for r in q_funnel_latency(spark, SF).collect()}
    for name, dts in (("view_to_click", d12), ("click_to_purchase", d23)):
        if not dts:
            assert name not in got
            continue
        r = got[name]
        assert r["n_users"] == len(dts)
        assert abs(r["min_s"] - min(dts) / 1e6) <= 1e-6
        assert abs(r["max_s"] - max(dts) / 1e6) <= 1e-6
        mean_us = (2 * sum(dts) + len(dts)) // (2 * len(dts))
        assert abs(r["mean_s"] - mean_us / 1e6) <= 1e-9
        assert r["min_s"] <= r["mean_s"] <= r["max_s"]
    assert d12, "fixture funnel must have converting users"
    Q.release_persists()
