"""Semantics tests for the wave-47 distfit entries: exact 1-D
Wasserstein, empirical-Bayes rate shrinkage, vocabulary trie profile,
exact trimmed/winsorized means, and the Cramér–von Mises exponential
fit.  The DuckDB value-hash gate is scripts/check_queries.py; these
pin each op against an independent single-node recomputation plus
plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_distshape import (
    _PT_D,
    _TS_PCT,
    q_cvm_expfit,
    q_eb_shrinkage,
    q_prefix_tree_stats,
    q_trimmed_stats,
    q_wasserstein_1d,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# wasserstein_1d
# ---------------------------------------------------------------------------


def test_wasserstein_matches_local(spark):
    docs = _docs(spark)
    a = sorted(r["n_chars"] for r in docs if r["lang"] == "en")
    b = sorted(r["n_chars"] for r in docs if r["lang"] != "en")
    na, nb = len(a), len(b)
    vals = sorted(set(a) | set(b))
    ca = cb = 0
    ia = ib = 0
    scaled = 0
    for v, nxt in zip(vals, vals[1:]):
        while ia < na and a[ia] <= v:
            ia += 1
        while ib < nb and b[ib] <= v:
            ib += 1
        scaled += abs(ia * nb - ib * na) * (nxt - v)
    row = q_wasserstein_1d(spark, SF).collect()[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["w1_scaled"] == scaled
    assert row["w1"] == _micro(scaled / (na * nb))


def test_wasserstein_vs_mean_gap(spark):
    docs = _docs(spark)
    a = [r["n_chars"] for r in docs if r["lang"] == "en"]
    b = [r["n_chars"] for r in docs if r["lang"] != "en"]
    row = q_wasserstein_1d(spark, SF).collect()[0]
    # W1 dominates the difference of means in 1-D
    assert row["w1"] >= abs(
        sum(a) / len(a) - sum(b) / len(b)
    ) - 1e-6
    plan = _plan_of(q_wasserstein_1d(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# eb_shrinkage
# ---------------------------------------------------------------------------


def test_eb_shrinkage_matches_local(spark):
    per = collections.defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        s = per[r["source"] or ""]
        s[0] += 1
        s[1] += 1 if r["lang"] == "en" else 0
    rqs = {
        g: math.floor(e / n * 1e6 + 0.5) for g, (n, e) in per.items()
    }
    k = len(per)
    s1 = sum(rqs.values())
    s2 = sum(r * r for r in rqs.values())
    m = s1 / k / 1e6
    v = (k * s2 - s1 * s1) / (k * (k - 1)) / 1e12
    mraw = m * (1 - m) / v - 1.0
    mq = 0 if (k < 2 or v <= 0 or mraw <= 0) else math.floor(mraw * 1e6 + 0.5)
    aq = 0 if mq == 0 else math.floor(m * (mq / 1e6) * 1e6 + 0.5)
    rows = q_eb_shrinkage(spark, SF).collect()
    assert [r["source"] for r in rows] == sorted(per)
    for r in rows:
        n, e = per[r["source"]]
        assert (r["n_s"], r["e_s"]) == (n, e)
        assert r["rate"] == rqs[r["source"]] / 1e6
        assert r["prior_mass"] == mq / 1e6
        want = (
            rqs[r["source"]] / 1e6
            if mq == 0
            else _micro((e * 1_000_000 + aq) / (n * 1_000_000 + mq))
        )
        assert r["shrunk_rate"] == want


def test_eb_shrinkage_pulls_toward_grand_mean(spark):
    rows = q_eb_shrinkage(spark, SF).collect()
    if rows[0]["prior_mass"] == 0.0:
        return  # degenerate prior: no shrinkage to assert
    grand = sum(r["e_s"] for r in rows) / sum(r["n_s"] for r in rows)
    for r in rows:
        # shrunk sits between the raw rate and the prior mean side
        lo, hi = sorted((r["rate"], grand))
        assert lo - 0.01 <= r["shrunk_rate"] <= hi + 0.01
    plan = _plan_of(q_eb_shrinkage(spark, SF))
    assert "BroadcastExchange" in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# prefix_tree_stats
# ---------------------------------------------------------------------------


def test_prefix_tree_matches_local(spark):
    types = set()
    for r in _docs(spark):
        types.update(t for t in (r["text"] or "").split(" ") if t)
    want = {}
    prev = None
    for d in range(1, _PT_D + 1):
        covered = [t for t in types if len(t) >= d]
        if not covered:
            continue
        pfx = {t[:d] for t in covered}
        ends = sum(1 for t in covered if len(t) == d)
        fan = (
            0.0
            if prev in (None, 0)
            else _micro(len(pfx) / prev)
        )
        want[d] = (len(pfx), len(covered), ends, fan)
        prev = len(pfx)
    rows = q_prefix_tree_stats(spark, SF).collect()
    got = {
        r["depth"]: (
            r["n_prefixes"],
            r["n_types_covered"],
            r["n_exact_ends"],
            r["fanout"],
        )
        for r in rows
    }
    assert got == want


def test_prefix_tree_monotone_and_plan(spark):
    rows = q_prefix_tree_stats(spark, SF).collect()
    cov = [r["n_types_covered"] for r in rows]
    assert cov == sorted(cov, reverse=True)  # coverage shrinks with depth
    plan = _plan_of(q_prefix_tree_stats(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# trimmed_stats
# ---------------------------------------------------------------------------


def test_trimmed_matches_local(spark):
    vs = sorted(r["n_chars"] for r in _docs(spark))
    n = len(vs)
    k = n // _TS_PCT
    kept = vs[k : n - k]
    v_lo, v_hi = vs[k], vs[n - k - 1]
    row = q_trimmed_stats(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["k_trim"] == k
    assert (row["v_lo"], row["v_hi"]) == (v_lo, v_hi)
    assert row["mean"] == _micro(sum(vs) / n)
    assert row["trimmed_mean"] == _micro(sum(kept) / len(kept))
    assert row["winsorized_mean"] == _micro(
        (sum(kept) + k * v_lo + k * v_hi) / n
    )


def test_trimmed_robustness_ordering(spark):
    row = q_trimmed_stats(spark, SF).collect()[0]
    assert row["v_lo"] <= row["trimmed_mean"] <= row["v_hi"]
    plan = _plan_of(q_trimmed_stats(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# cvm_expfit
# ---------------------------------------------------------------------------


def _deltas(spark):
    rows = (
        Q._t(spark, SF, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    dts = []
    for seq in by_user.values():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            td = b - a
            us = (
                td.days * 86_400_000_000
                + td.seconds * 1_000_000
                + td.microseconds
            )
            if us > 0:
                dts.append(us)
    return dts


def test_cvm_matches_local(spark):
    dts = _deltas(spark)
    n, sx = len(dts), sum(dts)
    hist = collections.Counter(dts)

    def g(kk):
        return kk * (4 * kk * kk - 1) // 3

    c = 0
    tsum = 0
    for v in sorted(hist):
        m = hist[v]
        fx = 1.0 - math.exp(-(n / sx) * v)
        term = (
            m * fx * fx
            - fx * (m * (2 * c + m)) / n
            + (g(c + m) - g(c)) / (4.0 * n * n)
        )
        tsum += math.floor(term * 1e9 + 0.5)
        c += m
    w2 = _micro(tsum / 1e9 + 1.0 / (12.0 * n))
    row = q_cvm_expfit(spark, SF).collect()[0]
    assert row["n_intervals"] == n
    assert row["lambda_per_sec"] == _micro(n / sx * 1e6)
    assert row["w2"] == w2


def test_cvm_nonnegative_and_plan(spark):
    row = q_cvm_expfit(spark, SF).collect()[0]
    assert row["w2"] >= 0.0
    plan = _plan_of(q_cvm_expfit(spark, SF))
    assert plan.count("Window") >= 2  # lead window + two-level cumsum
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave47_registered():
    for name in (
        "wasserstein_1d",
        "eb_shrinkage",
        "prefix_tree_stats",
        "trimmed_stats",
        "cvm_expfit",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
