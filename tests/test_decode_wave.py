"""Semantics tests for the wave-37 decoding/storage/nonparametrics
entries: Viterbi decode, encoding planner, Wilcoxon signed-rank, Gini
split search, and Chao1 richness.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math
import re

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_decode import (
    _GINI_LABEL,
    _HMM_EMIT,
    _HMM_INIT,
    _HMM_TRANS,
    _HMM_TYPES,
    q_chao1_richness,
    q_encoding_planner,
    q_gini_split_search,
    q_viterbi_decode,
    q_wilcoxon_signed_rank,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.MULTILINE))


def _events(spark):
    return (
        Q._t(spark, SF, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .collect()
    )


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )


# ---------------------------------------------------------------------------
# viterbi_decode
# ---------------------------------------------------------------------------


def _viterbi_naive(seq):
    ei = {t: i for i, t in enumerate(_HMM_TYPES)}
    x0 = ei[seq[0]]
    s = [_HMM_INIT[0] + _HMM_EMIT[0][x0], _HMM_INIT[1] + _HMM_EMIT[1][x0]]
    p = ["0", "1"]
    for et in seq[1:]:
        x = ei[et]
        c00, c10 = s[0] + _HMM_TRANS[0][0], s[1] + _HMM_TRANS[1][0]
        c01, c11 = s[0] + _HMM_TRANS[0][1], s[1] + _HMM_TRANS[1][1]
        n0 = max(c00, c10) + _HMM_EMIT[0][x]
        n1 = max(c01, c11) + _HMM_EMIT[1][x]
        p = [
            (p[0] if c00 >= c10 else p[1]) + "0",
            (p[0] if c01 >= c11 else p[1]) + "1",
        ]
        s = [n0, n1]
    return (max(s), p[0] if s[0] >= s[1] else p[1])


def test_viterbi_decode_matches_naive(spark):
    ev = _events(spark)
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1e6), r["event_id"], r["event_type"])
        )
    rows = {r["user_id"]: r for r in q_viterbi_decode(spark, SF).collect()}
    assert set(rows) == set(by_user)
    for u, evs in by_user.items():
        evs.sort()
        best, path = _viterbi_naive([t for _, _, t in evs])
        r = rows[u]
        assert r["n_events"] == len(evs)
        assert r["best_micro"] == best
        assert r["path"] == path
        assert len(r["path"]) == len(evs)
        assert set(r["path"]) <= {"0", "1"}


def test_viterbi_path_score_is_maximal_on_small_seq(spark):
    # brute-force all 2^T paths on a short prefix and confirm the DP
    # score equals the true max-plus optimum
    ei = {t: i for i, t in enumerate(_HMM_TYPES)}
    seq = ["view", "click", "purchase", "error", "view", "signup"]
    best_dp, _ = _viterbi_naive(seq)
    best_brute = None
    for mask in range(2 ** len(seq)):
        states = [(mask >> i) & 1 for i in range(len(seq))]
        sc = _HMM_INIT[states[0]] + _HMM_EMIT[states[0]][ei[seq[0]]]
        for i in range(1, len(seq)):
            sc += _HMM_TRANS[states[i - 1]][states[i]]
            sc += _HMM_EMIT[states[i]][ei[seq[i]]]
        best_brute = sc if best_brute is None else max(best_brute, sc)
    assert best_dp == best_brute


def test_viterbi_plan_one_scan_no_window(spark):
    plan = _plan_of(q_viterbi_decode(spark, SF))
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "Window" not in plan, plan


# ---------------------------------------------------------------------------
# encoding_planner
# ---------------------------------------------------------------------------


def test_encoding_planner_matches_naive(spark):
    docs = sorted(_docs(spark), key=lambda r: r["doc_id"])
    ids = {r["doc_id"] for r in docs}
    rows = {r["column"]: r for r in q_encoding_planner(spark, SF).collect()}
    assert set(rows) == {"source", "lang"}
    for col in ("source", "lang"):
        vals = {r["doc_id"]: (r[col] or "") for r in docs}
        eq_adj = sum(
            1 for i in ids if (i + 1) in ids and vals[i] == vals[i + 1]
        )
        n = len(docs)
        distinct = {v for v in vals.values()}
        plain = sum(len(v) for v in vals.values())
        r = rows[col]
        assert r["n_rows"] == n
        assert r["n_distinct"] == len(distinct)
        assert r["n_runs"] == n - eq_adj
        assert r["plain_bytes"] == plain
        assert r["dict_bytes"] == sum(len(v) for v in distinct) + 2 * n
        avg = int(math.floor(plain / n + 0.5))
        assert r["rle_bytes"] == (n - eq_adj) * (avg + 4)
        # dictionary wins exactly when codes (2 B) undercut the average
        # value — e.g. 2-char lang codes genuinely do NOT benefit, and
        # the planner must say so rather than flatter the encoding
        if plain / n > 2:
            assert r["dict_bytes"] < r["plain_bytes"]
        else:
            assert r["dict_bytes"] >= r["plain_bytes"]


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank
# ---------------------------------------------------------------------------


def test_wilcoxon_matches_naive(spark):
    ev = _events(spark)
    us = lambda t: int(t.timestamp() * 1_000_000)
    t0 = min(us(r["ts"]) for r in ev)
    t1 = max(us(r["ts"]) for r in ev)
    per = collections.defaultdict(int)
    for r in ev:
        vm = int(math.floor(r["value"] * 1e6 + 0.5))
        per[r["user_id"]] += vm if us(r["ts"]) * 2 > t0 + t1 else -vm
    diffs = [d for d in per.values() if d != 0]
    n = len(diffs)
    hist = collections.Counter(abs(d) for d in diffs)
    pos_at = collections.Counter(abs(d) for d in diffs if d > 0)
    prefix = 0
    w2 = 0
    tie3 = 0
    for ad in sorted(hist):
        t = hist[ad]
        mr2 = 2 * prefix + t + 1
        w2 += pos_at.get(ad, 0) * mr2
        tie3 += t**3 - t
        prefix += t
    z = (w2 - n * (n + 1) / 2.0) / (
        2.0 * math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0)
    )
    row = q_wilcoxon_signed_rank(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["w_plus_x2"] == w2
    assert row["tie3"] == tie3
    assert row["z_micro"] == int(math.floor(z * 1e6 + 0.5))


def test_wilcoxon_rank_sum_identity(spark):
    # doubled midranks over all signs sum to n(n+1): W+ + W- = total
    row = q_wilcoxon_signed_rank(spark, SF).collect()[0]
    n = row["n"]
    assert 0 <= row["w_plus_x2"] <= n * (n + 1)


# ---------------------------------------------------------------------------
# gini_split_search
# ---------------------------------------------------------------------------


def test_gini_split_matches_naive(spark):
    docs = _docs(spark)
    pts = [(r["n_chars"], 1 if (r["lang"] or "") == _GINI_LABEL else 0) for r in docs]
    n = len(pts)
    pos = sum(y for _, y in pts)
    hist = collections.defaultdict(lambda: [0, 0])
    for v, y in pts:
        hist[v][0] += 1
        hist[v][1] += y

    def gini(p, m):
        pr = p / m
        return 1.0 - pr * pr - (1.0 - pr) ** 2

    best = None
    n_l = p_l = 0
    for v in sorted(hist):
        n_l += hist[v][0]
        p_l += hist[v][1]
        if n_l >= n:
            continue
        w = (n_l * gini(p_l, n_l) + (n - n_l) * gini(pos - p_l, n - n_l)) / n
        key = (int(math.floor(w * 1e9 + 0.5)), v)
        cand = (key, (v, n_l, p_l, n - n_l, pos - p_l))
        if best is None or key < best[0]:
            best = cand
    row = q_gini_split_search(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    (g, v), (tv, nl, pl, nr, pr_) = best
    assert (
        r["threshold"],
        r["n_left"],
        r["pos_left"],
        r["n_right"],
        r["pos_right"],
        r["gini_nano"],
    ) == (tv, nl, pl, nr, pr_, g)
    # the chosen split must beat the no-split (root) impurity
    root = int(math.floor(gini(pos, n) * 1e9 + 0.5))
    assert r["gini_nano"] <= root


# ---------------------------------------------------------------------------
# chao1_richness
# ---------------------------------------------------------------------------


def test_chao1_matches_naive(spark):
    docs = _docs(spark)
    cws = collections.Counter()
    for r in docs:
        s = r["source"] or ""
        for w in (r["text"] or "").split(" "):
            if w != "":
                cws[(s, w)] += 1
    per = collections.defaultdict(lambda: [0, 0, 0])
    for (s, _), c in cws.items():
        per[s][0] += 1
        if c == 1:
            per[s][1] += 1
        elif c == 2:
            per[s][2] += 1
    rows = {r["source"]: r for r in q_chao1_richness(spark, SF).collect()}
    assert set(rows) == set(per)
    for s, (v, f1, f2) in per.items():
        r = rows[s]
        assert (r["v_obs"], r["f1"], r["f2"]) == (v, f1, f2)
        assert r["chao1"] == int(math.floor(v + f1 * (f1 - 1) / (2.0 * (f2 + 1)) + 0.5))
        # Chao1 never estimates fewer species than observed
        assert r["chao1"] >= v
