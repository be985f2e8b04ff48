"""Semantics tests for the wave-34 training-prep entries: 2-step
logistic regression, depth-1 sequential patterns, negative-sampling
distribution, RFM quintile segmentation, and bipartite projection.
The DuckDB value-hash gate is scripts/check_queries.py; these pin each
op against an independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math
import re

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_mlprep import (
    _LR_RATE,
    _RFM_Q,
    q_bipartite_projection,
    q_logreg_gd,
    q_negative_sampling_table,
    q_rfm_segments,
    q_seq_pattern_pairs,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.MULTILINE))


def _docs(spark):
    return (
        Q._t(spark, SF, "documents").select("text", "lang").collect()
    )


def _events(spark):
    return (
        Q._t(spark, SF, "events")
        .select("user_id", "event_type", "ts", "value")
        .collect()
    )


# ---------------------------------------------------------------------------
# logreg_gd
# ---------------------------------------------------------------------------


def _logreg_naive(rows):
    feats = []
    for r in rows:
        toks = [w for w in (r["text"] or "").split(" ") if w != ""]
        feats.append(
            (
                1.0,
                float(len(toks)),
                float(len(dict.fromkeys(toks))),
                1.0 if r["lang"] == "en" else 0.0,
            )
        )
    w = [0, 0, 0]  # micro-units
    n = len(feats)
    for _ in range(2):
        gs = [0, 0, 0]
        for x0, x1, x2, y in feats:
            z = (w[0] * x0 + w[1] * x1 + w[2] * x2) / 1e6
            sig = 1.0 / (1.0 + math.exp(-z))
            for j, xj in enumerate((x0, x1, x2)):
                gs[j] += int(math.floor((sig - y) * xj * 1e6 + 0.5))
        for j in range(3):
            w[j] += int(math.floor(-_LR_RATE * gs[j] / n + 0.5))
    return n, w


def test_logreg_gd_matches_naive(spark):
    n, w = _logreg_naive(_docs(spark))
    row = q_logreg_gd(spark, SF).collect()[0]
    assert row["n"] == n
    assert [row["w0_micro"], row["w1_micro"], row["w2_micro"]] == w


def test_logreg_gd_bit_deterministic_across_runs(spark):
    # the integer-weight contract: partial-agg order must not leak into
    # the result — two independent executions give identical weights
    a = q_logreg_gd(spark, SF).collect()[0]
    b = q_logreg_gd(spark, SF).collect()[0]
    assert (a["w0_micro"], a["w1_micro"], a["w2_micro"]) == (
        b["w0_micro"],
        b["w1_micro"],
        b["w2_micro"],
    )
    assert any(a[c] != 0 for c in ("w0_micro", "w1_micro", "w2_micro"))


def test_logreg_gd_plan_no_window_no_cartesian_blowup(spark):
    plan = _plan_of(q_logreg_gd(spark, SF))
    assert "Window" not in plan, plan
    # the only nested-loop joins are the 1-row weight broadcasts
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# seq_pattern_pairs
# ---------------------------------------------------------------------------


def test_seq_pattern_pairs_matches_naive(spark):
    ev = _events(spark)
    first = {}
    last = {}
    for r in ev:
        k = (r["user_id"], r["event_type"])
        t = r["ts"]
        if k not in first or t < first[k]:
            first[k] = t
        if k not in last or t > last[k]:
            last[k] = t
    users = {u for u, _ in first}
    expect = collections.Counter()
    for u in users:
        types = [t for (uu, t) in first if uu == u]
        for a in types:
            for b in types:
                if a != b and first[(u, a)] < last[(u, b)]:
                    expect[(a, b)] += 1
    got = {
        (r["ante"], r["cons"]): r["support"]
        for r in q_seq_pattern_pairs(spark, SF).collect()
    }
    assert got == dict(expect)


def test_seq_pattern_pairs_plan_one_scan(spark):
    plan = _plan_of(q_seq_pattern_pairs(spark, SF))
    # per-(user,type) rollup feeds BOTH join sides; Spark dedups the
    # scan via exchange reuse or re-scans — either way no Window and
    # no cartesian; the join is an equi-join on user_id
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# negative_sampling_table
# ---------------------------------------------------------------------------


def test_negative_sampling_matches_naive(spark):
    cnt = collections.Counter()
    for r in _docs(spark):
        for w in (r["text"] or "").split(" "):
            if w != "":
                cnt[w] += 1
    wq = {w: int(math.floor(c**0.75 * 1e6 + 0.5)) for w, c in cnt.items()}
    z = sum(wq.values())
    rows = q_negative_sampling_table(spark, SF).collect()
    assert len(rows) == len(cnt)
    for r in rows:
        assert r["c"] == cnt[r["w"]]
        assert r["w_micro"] == wq[r["w"]]
        assert r["p_ppb"] == int(math.floor(wq[r["w"]] / z * 1e9 + 0.5))
    # the ppb distribution sums to ~1e9 (quantization slack ≤ one per word)
    tot = sum(r["p_ppb"] for r in rows)
    assert abs(tot - 1_000_000_000) <= len(rows)


def test_negative_sampling_flattens_the_unigram(spark):
    # ^0.75 must compress the ratio between the most and least common
    rows = q_negative_sampling_table(spark, SF).collect()
    hi = max(rows, key=lambda r: r["c"])
    lo = min(rows, key=lambda r: r["c"])
    assert hi["c"] > lo["c"]  # fixture is Zipfian
    assert hi["p_ppb"] / lo["p_ppb"] < hi["c"] / lo["c"]


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------


def test_rfm_segments_matches_naive(spark):
    ev = _events(spark)
    t_max = max(r["ts"] for r in ev)
    per = {}
    for r in ev:
        u = r["user_id"]
        d = per.setdefault(u, {"last": r["ts"], "n": 0, "m": 0})
        d["last"] = max(d["last"], r["ts"])
        d["n"] += 1
        d["m"] += int(math.floor(r["value"]))
    n = len(per)

    def quint(vals):
        # vals: list of (user, value); rank by (value, user) 0-based
        order = sorted(vals, key=lambda t: (t[1], t[0]))
        return {
            u: int(math.floor(i * _RFM_Q / n)) + 1
            for i, (u, _) in enumerate(order)
        }

    rec = {u: (t_max.date() - d["last"].date()).days for u, d in per.items()}
    rq = quint(list(rec.items()))
    fq = quint([(u, d["n"]) for u, d in per.items()])
    mq = quint([(u, d["m"]) for u, d in per.items()])
    rows = q_rfm_segments(spark, SF).collect()
    assert len(rows) == n
    for r in rows:
        u = r["user_id"]
        assert r["recency_d"] == rec[u]
        assert r["frequency"] == per[u]["n"]
        assert r["monetary_u"] == per[u]["m"]
        assert (r["r_q"], r["f_q"], r["m_q"]) == (rq[u], fq[u], mq[u])
        assert r["segment"] == f"{rq[u]}-{fq[u]}-{mq[u]}"


def test_rfm_quintiles_are_balanced(spark):
    rows = q_rfm_segments(spark, SF).collect()
    n = len(rows)
    for col in ("r_q", "f_q", "m_q"):
        counts = collections.Counter(r[col] for r in rows)
        assert set(counts) <= set(range(1, _RFM_Q + 1))
        # exact rank → every quintile within one of n/Q
        for q in counts:
            assert abs(counts[q] - n / _RFM_Q) <= math.ceil(n / _RFM_Q)


def test_rfm_plan_windows_only_over_histograms(spark):
    plan = _plan_of(q_rfm_segments(spark, SF))
    # the global window is the prefix over per-VALUE counts (the
    # two-level rank); the per-value row_number windows are
    # partitioned.  No corpus-wide unpartitioned row_number over the
    # raw events may appear: every Window must sit above an aggregate.
    assert "CartesianProduct" not in plan
    assert _n_nodes(plan, "Window") >= 3  # one prefix per metric


# ---------------------------------------------------------------------------
# bipartite_projection
# ---------------------------------------------------------------------------


def test_bipartite_projection_matches_naive(spark):
    ev = _events(spark)
    ut = {(r["user_id"], r["event_type"]) for r in ev}
    users_of = collections.defaultdict(set)
    for u, t in ut:
        users_of[t].add(u)
    types = sorted(users_of)
    expect = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            shared = len(users_of[a] & users_of[b])
            if shared == 0:
                continue
            da, db = len(users_of[a]), len(users_of[b])
            jm = int(math.floor(shared / (da + db - shared) * 1e6 + 0.5))
            expect[(a, b)] = (shared, da, db, jm)
    got = {
        (r["type_a"], r["type_b"]): (
            r["shared_users"],
            r["deg_a"],
            r["deg_b"],
            r["jaccard_micro"],
        )
        for r in q_bipartite_projection(spark, SF).collect()
    }
    assert got == expect


def test_bipartite_projection_plan_single_scan(spark):
    plan = _plan_of(q_bipartite_projection(spark, SF))
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
