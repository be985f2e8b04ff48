"""Semantics tests for the wave-94 process-mining entries: DFG
performance map, DECLARE conformance, trace variants, happy-path
fitness, rework metrics.  The DuckDB value-hash gate is
scripts/check_queries.py; these replay the trace algebra in pure
Python and pin the process-mining structure (DFG transitions conserve
event counts, variant shares sum to the head mass, fitness is a
greedy-subsequence count)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_procmine import (
    _HAPPY,
    _VAR_CAP,
    _VAR_K,
    q_declare_conformance_report,
    q_dfg_performance_map,
    q_happy_path_fitness,
    q_rework_metric_report,
    q_trace_variant_table,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _traces():
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts)"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for u, a, t in rows:
        per[int(u)].append((int(t), a))
    for u in per:
        per[u].sort()
    return per


def test_dfg_conserves_transitions(spark):
    per = _traces()
    pairs = Counter()
    gaps = defaultdict(list)
    for u, seq in per.items():
        for (t1, a), (t2, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
            gaps[(a, b)].append(t2 - t1)
    got = {(r["from_activity"], r["to_activity"]): r for r in q_dfg_performance_map(spark, SF).collect()}
    assert set(got) == set(pairs)
    for k, r in got.items():
        assert r["transitions"] == pairs[k]
        assert r["mean_gap_us"] == _halfup(sum(gaps[k]), len(gaps[k]))
        assert r["max_gap_us"] == max(gaps[k])
    # transitions conserve: Σ = Σ(len-1)
    assert sum(pairs.values()) == sum(len(s) - 1 for s in per.values())


def test_declare_support(spark):
    per = _traces()
    got = {r["constraint_name"]: r for r in q_declare_conformance_report(spark, SF).collect()}
    n = len(per)
    sat = Counter()
    for u, seq in per.items():
        types = [a for _t, a in seq]
        cnt = Counter(types)
        if cnt["purchase"] >= 1:
            sat["existence_purchase"] += 1
        last_click = max((t for t, a in seq if a == "click"), default=None)
        last_p = max((t for t, a in seq if a == "purchase"), default=None)
        if cnt["click"] == 0 or (last_p is not None and last_p > last_click):
            sat["response_click_purchase"] += 1
        first_p = min((t for t, a in seq if a == "purchase"), default=None)
        first_s = min((t for t, a in seq if a == "signup"), default=None)
        if cnt["purchase"] == 0 or (first_s is not None and first_s < first_p):
            sat["precedence_signup_purchase"] += 1
        if cnt["error"] <= 2:
            sat["absence3_error"] += 1
        if cnt["view"] == 0 or cnt["click"] >= 1:
            sat["responded_existence_view_click"] += 1
    for name, r in got.items():
        assert r["traces"] == n
        assert r["satisfied"] == sat[name], name
        assert r["support_micro"] == _halfup(1_000_000 * sat[name], n)


def test_variant_head_list(spark):
    per = _traces()
    variants = Counter(
        ">".join(a for _t, a in seq[:_VAR_CAP]) for seq in per.values()
    )
    want = sorted(variants.items(), key=lambda t: (-t[1], t[0]))[:_VAR_K]
    got = q_trace_variant_table(spark, SF).collect()
    assert len(got) == min(_VAR_K, len(variants))
    assert {(r["variant"], r["n_traces"]) for r in got} == set(want)
    for r in got:
        assert r["share_micro"] == _halfup(
            1_000_000 * r["n_traces"], len(per)
        )


def test_fitness_histogram(spark):
    per = _traces()
    hist = Counter()
    for seq in per.values():
        acc = 0
        for _t, a in seq:
            if acc < len(_HAPPY) and a == _HAPPY[acc]:
                acc += 1
        has_err = 1 if any(a == "error" for _t, a in seq) else 0
        hist[(acc, has_err)] += 1
    got = {(r["matched_steps"], r["has_error"]): r for r in q_happy_path_fitness(spark, SF).collect()}
    assert set(got) == set(hist)
    for k, r in got.items():
        assert r["n_traces"] == hist[k]
        assert r["fitness_micro"] == _halfup(1_000_000 * k[0], len(_HAPPY))


def test_rework_metrics(spark):
    per = _traces()
    loops = defaultdict(lambda: [0, set()])
    for u, seq in per.items():
        for (t1, a), (t2, b) in zip(seq, seq[1:]):
            if a == b:
                loops[a][0] += 1
                loops[a][1].add(u)
    got = {r["activity"]: r for r in q_rework_metric_report(spark, SF).collect()}
    assert set(got) == set(loops)
    for a, (n, us) in loops.items():
        r = got[a]
        assert r["self_loop_transitions"] == n
        assert r["traces_with_loop"] == len(us)
        assert r["trace_share_micro"] == _halfup(
            1_000_000 * len(us), len(per)
        )


def test_registered_in_catalog():
    for name in (
        "dfg_performance_map",
        "declare_conformance_report",
        "trace_variant_table",
        "happy_path_fitness",
        "rework_metric_report",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
