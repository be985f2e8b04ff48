"""Semantics tests for the wave-29 corpus-audit entries: char-LM
bits-per-byte, near-dup partition modularity, join cardinality audit,
Benford leading-digit screen, and integer-moment shape profiles.  The
DuckDB value-hash gate is scripts/check_queries.py; these pin each op
against an independent single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_audit import (
    _BENFORD_P,
    _JSA_JOINS,
    q_benford_check,
    q_char_lm_bpb,
    q_graph_modularity,
    q_join_size_audit,
    q_moments_profile,
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
        .select("doc_id", "text", "source", "n_chars")
        .collect()
    )


# ---------------------------------------------------------------------------
# char_lm_bpb
# ---------------------------------------------------------------------------


def test_char_lm_bpb_matches_naive(spark):
    rows = [r for r in _docs(spark) if r["text"]]
    corpus = collections.Counter()
    per_src = collections.defaultdict(collections.Counter)
    for r in rows:
        corpus.update(r["text"])
        per_src[r["source"]].update(r["text"])
    t = sum(corpus.values())
    got = {r["source"]: r for r in q_char_lm_bpb(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        nll = -sum(
            c * (math.log(corpus[ch]) - math.log(t)) for ch, c in cnt.items()
        )
        want = round(nll / (math.log(2) * n), 6)
        assert got[src]["n_chars"] == n
        assert abs(got[src]["bpb"] - want) <= 1e-5
        # a unigram char LM of natural-ish text sits in a sane band
        assert 0.5 < got[src]["bpb"] < 8.0


def test_char_lm_bpb_plan_broadcast_lm(spark):
    p = _plan_of(q_char_lm_bpb(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # the #chars-row LM broadcasts back


# ---------------------------------------------------------------------------
# graph_modularity
# ---------------------------------------------------------------------------


def test_graph_modularity_matches_naive(spark):
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in Q.QUERIES["dedup_minhash_verify"](spark, SF).collect()
    ]
    labels = {
        r["doc_id"]: r["group_id"]
        for r in Q.QUERIES["dedup_groups"](spark, SF).collect()
    }
    m = len(edges)
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    d_c = collections.Counter()
    for v, d in deg.items():
        d_c[labels[v]] += d
    l_c = collections.Counter()
    for a, b in edges:
        assert labels[a] == labels[b]  # CC labels: every edge intra
        l_c[labels[a]] += 1
    num = sum(4 * m * l_c[c] - d_c[c] * d_c[c] for c in d_c)
    want = round(num / (4 * m * m), 6) if m else 0.0
    row = q_graph_modularity(spark, SF).collect()[0]
    assert row["m"] == m
    assert row["n_communities"] == len(d_c)
    assert abs(row["modularity"] - want) <= 1e-9
    # CC partition of a non-trivial pair graph must beat the hairball
    assert row["modularity"] > 0.5


def test_graph_modularity_total_on_empty(spark, tmp_path):
    d = tmp_path / "empty"
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    rows = q_graph_modularity(spark, str(d)).collect()
    assert len(rows) == 1
    assert (rows[0]["m"], rows[0]["modularity"]) == (0, 0.0)


# ---------------------------------------------------------------------------
# join_size_audit
# ---------------------------------------------------------------------------


def test_join_size_audit_matches_naive(spark):
    got = {r["join_name"]: r for r in q_join_size_audit(spark, SF).collect()}
    assert set(got) == {n for n, *_ in _JSA_JOINS}
    for name, lt, lk, rt, rk in _JSA_JOINS:
        left = [r[lk] for r in Q._t(spark, SF, lt).select(lk).collect()]
        right = [r[rk] for r in Q._t(spark, SF, rt).select(rk).collect()]
        ca, cb = collections.Counter(left), collections.Counter(right)
        est = len(left) * len(right) // max(len(ca), len(cb))
        actual = sum(ca[k] * cb[k] for k in ca.keys() & cb.keys())
        r = got[name]
        assert (r["n_left"], r["n_right"]) == (len(left), len(right))
        assert (r["ndv_left"], r["ndv_right"]) == (len(ca), len(cb))
        assert (r["est_rows"], r["actual_rows"]) == (est, actual)
        want = ((2_000_000 * actual + est) // (2 * est)) / 1e6
        assert abs(r["actual_over_est"] - want) <= 1e-12
        # the estimate must be in the right ballpark for FK joins
        assert actual > 0


def test_join_size_audit_total_on_empty(spark, tmp_path):
    d = tmp_path / "empty"
    for name, schema in {
        "orders": "o_orderkey long, o_custkey long, o_orderstatus string, "
                  "o_totalprice double, o_orderdate date",
        "lineitem": "l_orderkey long, l_partkey long, l_suppkey long, "
                    "l_linenumber int, l_quantity double",
        "part": "p_partkey long, p_name string",
        "customer": "c_custkey long, c_name string",
    }.items():
        spark.createDataFrame([], schema).write.parquet(
            str(d / f"{name}.parquet")
        )
    rows = q_join_size_audit(spark, str(d)).collect()
    assert len(rows) == 3  # the 3 audit rows survive, ratios NULL
    for r in rows:
        assert (r["n_left"], r["n_right"], r["actual_rows"]) == (0, 0, 0)
        assert r["est_rows"] is None and r["actual_over_est"] is None


def test_join_size_audit_fk_joins_estimate_exactly(spark):
    # orders→lineitem is a textbook FK join on uniformish keys: the
    # uniformity estimate should land within 2x of the truth
    got = {r["join_name"]: r for r in q_join_size_audit(spark, SF).collect()}
    r = got["orders_lineitem"]
    assert 0.5 <= r["actual_over_est"] <= 2.0


# ---------------------------------------------------------------------------
# benford_check
# ---------------------------------------------------------------------------


def test_benford_check_matches_naive(spark):
    rows = [r for r in _docs(spark) if r["n_chars"] > 0]
    obs = collections.Counter(int(str(r["n_chars"])[0]) for r in rows)
    n = sum(obs.values())
    got = {r["digit"]: r for r in q_benford_check(spark, SF).collect()}
    assert set(got) == set(obs)
    for d, c in obs.items():
        p = float(_BENFORD_P[d])
        r = got[d]
        assert r["n_obs"] == c
        assert abs(r["exp_n"] - round(n * p, 6)) <= 1e-9
        assert abs(r["chi2_term"] - round((c - n * p) ** 2 / (n * p), 6)) <= 1e-6


def test_benford_probabilities_sum_to_one(spark):
    assert abs(sum(float(p) for p in _BENFORD_P.values()) - 1.0) <= 1e-9


def test_benford_plan_map_side_then_tiny_agg(spark):
    p = _plan_of(q_benford_check(spark, SF))
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p
    assert "SortMergeJoin" not in p


# ---------------------------------------------------------------------------
# moments_profile
# ---------------------------------------------------------------------------


def test_moments_profile_matches_naive(spark):
    per_src = collections.defaultdict(list)
    for r in _docs(spark):
        per_src[r["source"]].append(r["n_chars"])
    got = {r["source"]: r for r in q_moments_profile(spark, SF).collect()}
    for src, xs in per_src.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        if m2 == 0:
            assert src not in got
            continue
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        r = got[src]
        assert r["n_docs"] == n
        assert abs(r["skewness"] - m3 / m2**1.5) <= 1e-4
        assert abs(r["kurtosis_excess"] - (m4 / m2**2 - 3)) <= 1e-4


def test_moments_profile_plan_single_groupby(spark):
    p = _plan_of(q_moments_profile(spark, SF))
    assert "Join" not in p and "Exchange" in p  # one shuffle: groupBy(source)
    assert p.count("HashAggregate") <= 4  # partial+final, nothing more
