"""Semantics tests for the wave-35 forecasting/survival/linkage
entries: Holt smoothing, Kaplan–Meier, range-partition planning,
Fellegi–Sunter weights, and KMV sketch intersection.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op against
an independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math
import re

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_survival import (
    _FS_LEN_BUCKET,
    _FS_SHIFT,
    _HOLT_ALPHA_INV,
    _HOLT_BETA_INV,
    _KM_CENSOR_D,
    _KMV_K,
    _RPP_BUCKETS,
    q_fellegi_sunter,
    q_holt_smoothing,
    q_kaplan_meier,
    q_kmv_intersect,
    q_range_partition_plan,
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
        Q._t(spark, SF, "events").select("user_id", "event_type", "ts").collect()
    )


# ---------------------------------------------------------------------------
# holt_smoothing
# ---------------------------------------------------------------------------


def _holt_naive(counts):
    # counts: day-ordered list of ints
    l = counts[0] * 1_000_000
    b = 0
    for x in counts[1:]:
        l_new = int(math.floor((x * 1e6 + l + b) / _HOLT_ALPHA_INV + 0.5))
        b = int(
            math.floor(((l_new - l) + (_HOLT_BETA_INV - 1) * b) / _HOLT_BETA_INV + 0.5)
        )
        l = l_new
    return l, b


def test_holt_smoothing_matches_naive(spark):
    ev = _events(spark)
    daily = collections.Counter((r["event_type"], r["ts"].date()) for r in ev)
    series = collections.defaultdict(dict)
    for (t, d), c in daily.items():
        series[t][d] = c
    rows = {r["event_type"]: r for r in q_holt_smoothing(spark, SF).collect()}
    assert set(rows) == set(series)
    for t, by_day in series.items():
        counts = [by_day[d] for d in sorted(by_day)]
        l, b = _holt_naive(counts)
        r = rows[t]
        assert r["n_days"] == len(counts)
        assert (r["level_micro"], r["trend_micro"]) == (l, b)
        assert r["forecast_micro"] == l + b


def test_holt_constant_series_has_zero_trend(spark):
    # closed-form sanity: a constant series must converge to level = x,
    # trend = 0 under any (alpha, beta)
    l, b = _holt_naive([7] * 50)
    assert b == 0
    assert l == 7_000_000


def test_holt_plan_one_scan_no_window(spark):
    plan = _plan_of(q_holt_smoothing(spark, SF))
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "Window" not in plan, plan  # recursion lives in F.aggregate


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_matches_naive(spark):
    ev = _events(spark)
    first, last = {}, {}
    for r in ev:
        u, d = r["user_id"], r["ts"].date()
        first[u] = min(first.get(u, d), d)
        last[u] = max(last.get(u, d), d)
    d_max = max(last.values())
    subj = {
        u: ((last[u] - first[u]).days, (d_max - last[u]).days >= _KM_CENSOR_D)
        for u in first
    }
    hist = collections.defaultdict(lambda: [0, 0])
    for dur, event in subj.values():
        hist[dur][0 if event else 1] += 1
    n_total = len(subj)
    rows = sorted(q_kaplan_meier(spark, SF).collect(), key=lambda r: r["dur"])
    assert [r["dur"] for r in rows] == sorted(hist)
    seen = 0
    cum = 0
    dead = False
    for r in rows:
        d_n, c_n = hist[r["dur"]]
        n_risk = n_total - seen
        assert (r["d_n"], r["c_n"], r["n_risk"]) == (d_n, c_n, n_risk)
        if d_n >= n_risk:
            dead = True
        else:
            cum += int(math.floor(math.log(1.0 - d_n / n_risk) * 1e6 + 0.5))
        expect_s = 0 if dead else int(math.floor(math.exp(cum / 1e6) * 1e6 + 0.5))
        assert r["s_ppm"] == expect_s
        seen += d_n + c_n
    # survival is monotone non-increasing and starts <= 1
    s = [r["s_ppm"] for r in rows]
    assert all(a >= b for a, b in zip(s, s[1:]))
    assert s[0] <= 1_000_000


def test_kaplan_meier_plan_windows_over_histogram_only(spark):
    plan = _plan_of(q_kaplan_meier(spark, SF))
    assert "CartesianProduct" not in plan
    # windows sit above the duration-histogram aggregate, so a
    # HashAggregate must appear below the first Window in the tree
    assert "Window" in plan and "HashAggregate" in plan


# ---------------------------------------------------------------------------
# range_partition_plan
# ---------------------------------------------------------------------------


def test_range_partition_plan_matches_naive(spark):
    vals = [
        r["n_chars"]
        for r in Q._t(spark, SF, "documents").select("n_chars").collect()
    ]
    n = len(vals)
    vc = collections.Counter(vals)
    prefix = 0
    assign = {}
    for v in sorted(vc):
        b = min(prefix * _RPP_BUCKETS // n, _RPP_BUCKETS - 1) + 1
        assign[v] = b
        prefix += vc[v]
    expect = collections.defaultdict(lambda: [None, None, 0, 0])
    for v in sorted(vc):
        e = expect[assign[v]]
        e[0] = v if e[0] is None else min(e[0], v)
        e[1] = v if e[1] is None else max(e[1], v)
        e[2] += vc[v]
        e[3] += 1
    rows = {r["bucket"]: r for r in q_range_partition_plan(spark, SF).collect()}
    assert set(rows) == set(expect)
    for b, (lo, hi, n_rows, n_vals) in expect.items():
        r = rows[b]
        assert (r["lo"], r["hi"], r["n_rows"], r["n_values"]) == (
            lo,
            hi,
            n_rows,
            n_vals,
        )
    # buckets are contiguous, ordered, and cover all rows
    order = sorted(rows)
    for a, b in zip(order, order[1:]):
        assert rows[a]["hi"] < rows[b]["lo"]
    assert sum(r["n_rows"] for r in rows.values()) == n


def test_range_partition_plan_balance(spark):
    # with mostly-distinct values the planner must be near-balanced:
    # every bucket within one value-group of the ideal share
    rows = q_range_partition_plan(spark, SF).collect()
    n = sum(r["n_rows"] for r in rows)
    ideal = n / _RPP_BUCKETS
    for r in rows:
        assert r["n_rows"] <= ideal + max(
            1, max(rows, key=lambda x: x["n_rows"] / max(x["n_values"], 1))["n_rows"]
        )


# ---------------------------------------------------------------------------
# fellegi_sunter
# ---------------------------------------------------------------------------


def test_fellegi_sunter_matches_naive(spark):
    docs = {
        r["doc_id"]: r
        for r in Q._t(spark, SF, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .collect()
    }
    matches = {
        (r["doc_a"], r["doc_b"])
        for r in Q.QUERIES["dedup_minhash_verify"](spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    }
    nonm = [
        (i, i + _FS_SHIFT)
        for i in docs
        if (i + _FS_SHIFT) in docs and (i, i + _FS_SHIFT) not in matches
    ]

    def agree(pairs):
        out = collections.Counter()
        for a, b in pairs:
            da, db = docs[a], docs[b]
            out["lang"] += (da["lang"] or "") == (db["lang"] or "")
            out["source"] += (da["source"] or "") == (db["source"] or "")
            out["len_bucket"] += (
                da["n_chars"] // _FS_LEN_BUCKET == db["n_chars"] // _FS_LEN_BUCKET
            )
        return out

    am, au = agree(matches), agree(nonm)
    rows = {r["field"]: r for r in q_fellegi_sunter(spark, SF).collect()}
    assert set(rows) == {"lang", "source", "len_bucket"}
    for f, r in rows.items():
        assert r["n_match"] == len(matches)
        assert r["n_nonmatch"] == len(nonm)
        assert r["agree_match"] == am[f]
        assert r["agree_nonmatch"] == au[f]
        m = (am[f] + 1) / (len(matches) + 2)
        u = (au[f] + 1) / (len(nonm) + 2)
        assert r["m_micro"] == int(math.floor(m * 1e6 + 0.5))
        assert r["u_micro"] == int(math.floor(u * 1e6 + 0.5))
        assert r["weight_micro"] == int(math.floor(math.log2(m / u) * 1e6 + 0.5))
    # near-dups agree on fields far more than random pairs: every
    # field's match weight must be positive on this fixture
    assert all(r["weight_micro"] > 0 for r in rows.values())


# ---------------------------------------------------------------------------
# kmv_intersect
# ---------------------------------------------------------------------------


def _h32(text: str) -> int:
    h = hashlib.md5(text.encode("utf-8")).hexdigest()[:8]
    return int(h, 16)


def test_kmv_intersect_matches_naive(spark):
    rows = (
        Q._t(spark, SF, "documents")
        .where("text is not null")
        .select("source", "text")
        .collect()
    )
    by_src = collections.defaultdict(set)
    for r in rows:
        by_src[r["source"]].add(_h32(r["text"]))
    srcs = sorted(by_src)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sk_a = sorted(by_src[a])[:_KMV_K]
            sk_b = sorted(by_src[b])[:_KMV_K]
            union = sorted(set(sk_a) | set(sk_b))[:_KMV_K]
            kth = union[-1]
            k_eff = len(union)
            shared = sum(1 for h in union if h in set(sk_a) and h in set(sk_b))
            theta = (kth + 1.0) / 2**32
            est_u = (k_eff - 1.0) / theta
            expect[(a, b)] = (
                k_eff,
                shared,
                int(math.floor(est_u + 0.5)),
                int(math.floor(shared / k_eff * est_u + 0.5)),
                len(by_src[a]),
                len(by_src[b]),
                len(by_src[a] & by_src[b]),
            )
    got = {
        (r["src_a"], r["src_b"]): (
            r["k_eff"],
            r["shared_k"],
            r["est_union"],
            r["est_inter"],
            r["exact_a"],
            r["exact_b"],
            r["exact_inter"],
        )
        for r in q_kmv_intersect(spark, SF).collect()
    }
    assert got == expect


def test_kmv_estimates_are_sane(spark):
    # union estimate within 4x of truth on every pair (k=64 at small
    # cardinalities is exact-ish since the sketch holds everything)
    for r in q_kmv_intersect(spark, SF).collect():
        exact_union = r["exact_a"] + r["exact_b"] - r["exact_inter"]
        if exact_union <= _KMV_K:
            # sketch holds the whole union: estimate must be close
            assert abs(r["est_union"] - exact_union) <= max(2, exact_union // 4)
            assert r["shared_k"] == r["exact_inter"]
