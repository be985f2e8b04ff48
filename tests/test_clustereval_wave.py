"""Semantics tests for the wave-48 cluster-eval entries: B-cubed of
the production near-dup clustering, SimHash bit balance, two-
proportion power analysis, Kendall's W, and the token position
profile.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against an independent single-node recomputation
plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_clustereval import (
    _KW_K,
    _TP_CAP,
    _Z_ALPHA,
    _Z_BETA,
    q_bcubed_eval,
    q_kendalls_w,
    q_power_analysis,
    q_simhash_bit_balance,
    q_token_position_profile,
)
from occular_ocr_spark.queries_ext import q_dedup_groups

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# bcubed_eval
# ---------------------------------------------------------------------------


def test_bcubed_matches_local_labels(spark):
    import hashlib

    labels = {
        r["doc_id"]: r["group_id"]
        for r in q_dedup_groups(spark, SF).collect()
    }
    truth = {
        r["doc_id"]: hashlib.md5((r["text"] or "").encode()).hexdigest()
        for r in _docs(spark)
    }
    cells = collections.Counter(
        (labels[d], truth[d]) for d in labels
    )
    csz = collections.Counter()
    tsz = collections.Counter()
    for (c, t), m in cells.items():
        csz[c] += m
        tsz[t] += m
    n = sum(cells.values())
    ps = sum(
        math.floor(m * m / csz[c] * 1e6 + 0.5) for (c, t), m in cells.items()
    )
    rs = sum(
        math.floor(m * m / tsz[t] * 1e6 + 0.5) for (c, t), m in cells.items()
    )
    prec = math.floor(ps / n + 0.5) / 1e6
    rec = math.floor(rs / n + 0.5) / 1e6
    f1 = _micro(2 * prec * rec / (prec + rec))
    row = q_bcubed_eval(spark, SF).collect()[0]
    assert row["n_docs"] == n == 500
    assert row["n_clusters"] == len(csz)
    assert row["n_truth_classes"] == len(tsz)
    assert row["precision"] == prec
    assert row["recall"] == rec
    assert row["f1"] == f1


def test_bcubed_recall_dominates(spark):
    # near-dup clusters merge exact-dup classes, never split them
    # (identical texts share every MinHash signature), so recall = 1
    row = q_bcubed_eval(spark, SF).collect()[0]
    assert row["recall"] == 1.0
    assert 0.0 < row["precision"] <= 1.0
    assert row["n_clusters"] <= row["n_truth_classes"]


# ---------------------------------------------------------------------------
# simhash_bit_balance
# ---------------------------------------------------------------------------


def test_simhash_bits_match_local(spark):
    fps = [r["simhash"] for r in Q.q_dedup_simhash(spark, SF).collect()]
    n = len(fps)
    rows = q_simhash_bit_balance(spark, SF).collect()
    assert [r["bit"] for r in rows] == list(range(16))
    for r in rows:
        ones = sum((f >> r["bit"]) & 1 for f in fps)
        assert r["n_docs"] == n
        assert r["ones"] == ones
        assert r["ones_share"] == (2_000_000 * ones + n) // (2 * n) / 1e6
        assert r["abs_dev"] == _micro(abs(ones / n - 0.5))
        assert r["chi2_term"] == _micro((2 * ones - n) ** 2 / n)


def test_simhash_bits_balanced(spark):
    rows = q_simhash_bit_balance(spark, SF).collect()
    # a healthy signature: no bit should be fully degenerate
    assert all(0 < r["ones"] < r["n_docs"] for r in rows)
    plan = _plan_of(q_simhash_bit_balance(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# power_analysis
# ---------------------------------------------------------------------------


def test_power_matches_local(spark):
    per = collections.defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        s = per[r["source"] or ""]
        s[0] += 1
        s[1] += 1 if r["lang"] == "en" else 0
    ordered = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))
    (ga, (na, ea)), (gb, (nb, eb)) = ordered[0], ordered[1]
    p1, p2 = ea / na, eb / nb
    row = q_power_analysis(spark, SF).collect()[0]
    assert (row["source_a"], row["source_b"]) == (ga, gb)
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["p_a"] == _micro(p1)
    assert row["p_b"] == _micro(p2)
    assert row["delta"] == _micro(abs(p1 - p2))
    if p1 == p2:
        assert row["n_per_arm"] == 0
    else:
        pbar = (ea + eb) / (na + nb)
        want = math.ceil(
            (
                _Z_ALPHA * math.sqrt(2 * pbar * (1 - pbar))
                + _Z_BETA * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
            )
            ** 2
            / (p1 - p2) ** 2
        )
        assert row["n_per_arm"] == want


def test_power_plan(spark):
    plan = _plan_of(q_power_analysis(spark, SF))
    assert "PythonUDF" not in plan
    assert "Window" in plan  # rank over the #sources frame


# ---------------------------------------------------------------------------
# kendalls_w
# ---------------------------------------------------------------------------


def test_kendalls_w_matches_local(spark):
    tf = collections.Counter()
    dfc = collections.defaultdict(set)
    for r in _docs(spark):
        for t in _tokens(r["text"]):
            tf[t] += 1
            dfc[t].add(r["doc_id"])
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:_KW_K]
    toks = [t for t, _ in top]
    n = len(toks)
    rk1 = {t: i + 1 for i, t in enumerate(toks)}
    rk2 = {
        t: i + 1
        for i, t in enumerate(
            sorted(toks, key=lambda t: (-len(dfc[t]), t))
        )
    }
    rk3 = {
        t: i + 1
        for i, t in enumerate(sorted(toks, key=lambda t: (-len(t), t)))
    }
    s4 = sum(
        (2 * (rk1[t] + rk2[t] + rk3[t]) - 3 * (n + 1)) ** 2
        for t in toks
    )
    w = _micro(s4 / (3.0 * (n**3 - n)))
    row = q_kendalls_w(spark, SF).collect()[0]
    assert row["n_items"] == n
    assert row["s4"] == s4
    assert row["w"] == w


def test_kendalls_w_bounds(spark):
    row = q_kendalls_w(spark, SF).collect()[0]
    assert 0.0 <= row["w"] <= 1.0
    plan = _plan_of(q_kendalls_w(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# token_position_profile
# ---------------------------------------------------------------------------


def test_token_position_matches_local(spark):
    docs = _docs(spark)
    dfc = collections.defaultdict(set)
    for r in docs:
        for t in _tokens(r["text"]):
            dfc[t].add(r["doc_id"])
    bucket = {
        t: min(int(math.floor(math.log(len(ds)) / math.log(2.0))), _TP_CAP)
        for t, ds in dfc.items()
    }
    agg = collections.defaultdict(lambda: [0, 0, 0])  # n, s1, front
    for r in docs:
        toks = _tokens(r["text"])
        if len(toks) < 2:
            continue
        for i, t in enumerate(toks):
            relq = math.floor(i / (len(toks) - 1) * 1e6 + 0.5)
            s = agg[bucket[t]]
            s[0] += 1
            s[1] += relq
            s[2] += 1 if relq < 250_000 else 0
    rows = q_token_position_profile(spark, SF).collect()
    got = {
        r["df_bucket"]: (
            r["n_occurrences"],
            r["mean_rel_pos"],
            r["front_share"],
        )
        for r in rows
    }
    want = {
        b: (
            s[0],
            (2 * s[1] + s[0]) // (2 * s[0]) / 1e6,
            (2_000_000 * s[2] + s[0]) // (2 * s[0]) / 1e6,
        )
        for b, s in agg.items()
    }
    assert got == want


def test_token_position_plan(spark):
    plan = _plan_of(q_token_position_profile(spark, SF))
    assert "PythonUDF" not in plan
    assert "Generate" in plan  # the posexplode


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave48_registered():
    for name in (
        "bcubed_eval",
        "simhash_bit_balance",
        "power_analysis",
        "kendalls_w",
        "token_position_profile",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
