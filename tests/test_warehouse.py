"""Warehouse/graph catalog semantics tests (merge_upsert /
triangle_count / sample_k_per_group).  Gate-level value-hash equality
vs DuckDB is covered by scripts/check_queries.py; these pin the
algorithmic invariants independently."""

from __future__ import annotations

from itertools import combinations

from occular_ocr_spark.queries_warehouse import (
    _SKG_K,
    q_merge_upsert,
    q_sample_k_per_group,
    q_triangle_count,
)

SF = "/root/testdata/sf0.001"


def test_merge_upsert_actions(spark):
    rows = q_merge_upsert(spark, SF).collect()
    by_action = {}
    for r in rows:
        by_action.setdefault(r["action"], []).append(r)
    # inserts live past max(base doc_id) — the data-derived offset keeps
    # synthetic insert keys disjoint from base/update keys at ANY scale
    # factor (ADVICE r3: a fixed 10M constant collides past 10M docs)
    max_base = max(
        r["doc_id"] for a in ("update", "keep") for r in by_action[a]
    )
    assert all(r["doc_id"] > max_base for r in by_action["insert"])
    assert all(r["source"] == "patched" for r in by_action["update"])
    assert all(r["doc_id"] % 7 == 0 for r in by_action["update"])
    assert all(
        r["source"] not in ("patched", "backfill") for r in by_action["keep"]
    )
    # key uniqueness after merge
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_triangle_count_matches_bruteforce(spark):
    from occular_ocr_spark.queries import _t
    from pyspark.sql import functions as F

    li = (
        _t(spark, SF, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .collect()
    )
    by_order = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_suppkey"])
    edges = set()
    for supps in by_order.values():
        for a, b in combinations(sorted(supps), 2):
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: count each triangle once
                for n in (a, b, c):
                    expected[n] = expected.get(n, 0) + 1
    got = {
        r["supp_id"]: r["n_triangles"]
        for r in q_triangle_count(spark, SF).collect()
    }
    assert got == expected and got


def test_sample_k_per_group_exact_k(spark):
    rows = q_sample_k_per_group(spark, SF).collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["source"], []).append(r["rk"])
    for rks in per_group.values():
        assert sorted(rks) == list(range(1, min(_SKG_K, len(rks)) + 1))
        assert len(rks) <= _SKG_K
    # determinism: a second run yields the identical sample
    again = {
        (r["doc_id"], r["source"], r["rk"])
        for r in q_sample_k_per_group(spark, SF).collect()
    }
    assert again == {(r["doc_id"], r["source"], r["rk"]) for r in rows}


def test_sketch_rollup_merge_is_associative_and_bounded(spark):
    """HLL union must be rollup-path independent (flat day union ==
    two-level day->month->total union, exactly), and the estimate must
    be inside the 5% contract vs exact.  Direct-vs-union equality is
    deliberately NOT asserted — DataSketches keeps small inputs in
    exact coupon mode while many-way unions may promote to dense, a
    mode artifact, not a merge property (first seen at sf0.1)."""
    from occular_ocr_spark.queries_warehouse import q_sketch_rollup

    rows = q_sketch_rollup(spark, SF).collect()
    assert rows
    assert all(r["merge_associative"] for r in rows)
    assert all(r["estimate_ok"] for r in rows)
    # exact counts cross-checked against a direct distinct
    from occular_ocr_spark.queries import _t
    import pyspark.sql.functions as F

    exact = {
        r["event_type"]: r["n"]
        for r in _t(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"]: r["n_exact"] for r in rows} == exact


def test_sliding_mau_bruteforce(spark):
    from occular_ocr_spark.queries_warehouse import _MAU_WINDOW_D, q_sliding_mau
    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    rows = q_sliding_mau(spark, SF).collect()
    days = sorted(ev["day"].unique())
    assert len(rows) == len(days) * ev["event_type"].nunique()
    by_key = {(r["event_type"], r["win_end"]): r["mau"] for r in rows}
    import datetime

    for et in ev["event_type"].unique():
        sub = ev[ev["event_type"] == et]
        for w in days[:5] + days[-3:]:
            lo = w - datetime.timedelta(days=_MAU_WINDOW_D - 1)
            want = sub[(sub["day"] >= lo) & (sub["day"] <= w)]["user_id"].nunique()
            assert by_key[(et, w)] == want


def test_sliding_mau_is_windowed_not_cumulative(spark):
    from occular_ocr_spark.queries_warehouse import q_sliding_mau

    rows = q_sliding_mau(spark, SF).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append((r["win_end"], r["mau"]))
    # a cumulative metric would be monotone; a sliding one falls when
    # active users age out of the window — assert at least one decrease
    decreases = 0
    for et, pts in series.items():
        pts.sort()
        decreases += sum(1 for a, b in zip(pts, pts[1:]) if b[1] < a[1])
    assert decreases > 0
