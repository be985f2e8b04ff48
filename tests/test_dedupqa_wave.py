"""Semantics tests for the wave-27 dedup-QA & mixture-planning entries:
LSH band capacity report, near-dup-graph transitivity, char entropy,
IDF-weighted pair overlap, and the integer water-fill allocator.  The
DuckDB value-hash gate is scripts/check_queries.py; these pin each op
against an independent single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_dedupqa import (
    q_char_entropy,
    q_dedup_transitivity,
    q_lsh_band_load,
    q_mixture_waterfill,
    q_pair_idf_overlap,
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
        .select("doc_id", "text", "source")
        .collect()
    )


def _shingle_set(text):
    toks = text.split(" ")
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _band_rows(rows):
    """Naive (doc_id, band, band_key) LSH band rows — independent
    hashlib recomputation of queries._minhash_bands."""
    out = []
    for r in rows:
        shs = _shingle_set(r["text"])
        if not shs:
            continue
        mh = [
            min(
                hashlib.md5(f"{k}:{sh}".encode()).hexdigest() for sh in shs
            )
            for k in range(Q._MINHASH_SEEDS)
        ]
        for b in range(Q._MINHASH_SEEDS // Q._MINHASH_BAND_ROWS):
            key = "|".join(
                mh[b * Q._MINHASH_BAND_ROWS + r2]
                for r2 in range(Q._MINHASH_BAND_ROWS)
            )
            out.append((r["doc_id"], b, key))
    return out


# ---------------------------------------------------------------------------
# lsh_band_load
# ---------------------------------------------------------------------------


def test_lsh_band_load_matches_naive(spark):
    sizes = collections.Counter()
    for _doc, b, key in _band_rows(_docs(spark)):
        sizes[(b, key)] += 1
    want = {}
    for b in range(Q._MINHASH_SEEDS // Q._MINHASH_BAND_ROWS):
        ns = [n for (bb, _), n in sizes.items() if bb == b]
        want[b] = (
            len(ns),
            sum(1 for n in ns if n >= 2),
            max(ns),
            sum(1 for n in ns if n > Q._LSH_BAND_CAP),
            sum(n for n in ns if n > Q._LSH_BAND_CAP),
            sum(n * (n - 1) // 2 for n in ns if 2 <= n <= Q._LSH_BAND_CAP),
        )
    got = {r["band"]: r for r in q_lsh_band_load(spark, SF).collect()}
    assert set(got) == set(want)
    for b, (nb, cb, mx, ocb, ocd, cp) in want.items():
        r = got[b]
        assert (
            r["n_buckets"],
            r["collision_buckets"],
            r["max_bucket_docs"],
            r["over_cap_buckets"],
            r["over_cap_docs"],
            r["candidate_pairs"],
        ) == (nb, cb, mx, ocb, ocd, cp)


def test_lsh_band_load_pairs_bound_candidate_set(spark):
    # the report's per-band pair budget upper-bounds the distinct
    # candidate pairs the LSH path actually emits
    total_budget = sum(
        r["candidate_pairs"] for r in q_lsh_band_load(spark, SF).collect()
    )
    n_cands = Q.QUERIES["dedup_minhash_lsh"](spark, SF).count()
    assert 0 < n_cands <= total_budget


def test_lsh_band_load_plan_two_aggs_no_join(spark):
    p = _plan_of(q_lsh_band_load(spark, SF))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "HashAggregate" in p  # partial-agg bucket sizing


# ---------------------------------------------------------------------------
# dedup_transitivity
# ---------------------------------------------------------------------------


def test_dedup_transitivity_matches_naive_graph_math(spark):
    edges = {
        (r["doc_a"], r["doc_b"])
        for r in Q.QUERIES["dedup_minhash_verify"](spark, SF).collect()
    }
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = sum(
        1
        for (a, b) in edges
        for (a2, c) in edges
        if a2 == a and b < c and (b, c) in edges
    )
    row = q_dedup_transitivity(spark, SF).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    want = round(3 * tri / wedges, 6) if wedges else 0.0
    assert abs(row["transitivity"] - want) <= 1e-9


def test_dedup_transitivity_bounded(spark):
    row = q_dedup_transitivity(spark, SF).collect()[0]
    assert 0.0 <= row["transitivity"] <= 1.0
    # every triangle contributes exactly 3 closed wedges
    assert 3 * row["n_triangles"] <= row["n_wedges"]


def test_dedup_transitivity_total_on_empty(spark, tmp_path):
    d = tmp_path / "empty"
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    rows = q_dedup_transitivity(spark, str(d)).collect()
    assert len(rows) == 1
    assert (
        rows[0]["n_edges"],
        rows[0]["n_wedges"],
        rows[0]["n_triangles"],
        rows[0]["transitivity"],
    ) == (0, 0, 0, 0.0)


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------


def test_char_entropy_matches_naive(spark):
    rows = [r for r in _docs(spark) if r["text"]]
    got = {r["doc_id"]: r for r in q_char_entropy(spark, SF).collect()}
    assert set(got) == {r["doc_id"] for r in rows}
    for r in rows:
        cnt = collections.Counter(r["text"])
        n = sum(cnt.values())
        want = round(
            math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n, 6
        )
        g = got[r["doc_id"]]
        assert g["n_chars"] == n
        assert g["n_distinct"] == len(cnt)
        assert abs(g["char_entropy"] - want) <= 1e-5


def test_char_entropy_bounded_by_alphabet(spark):
    # 0 ≤ H ≤ ln(n_distinct): single-char docs hit 0, uniform hits ln(k)
    for r in q_char_entropy(spark, SF).collect():
        assert -1e-6 <= r["char_entropy"] <= math.log(r["n_distinct"]) + 1e-6


def test_char_entropy_plan_partial_agg_no_join(spark):
    p = _plan_of(q_char_entropy(spark, SF))
    assert "Join" not in p and "CartesianProduct" not in p
    assert "HashAggregate" in p
    assert "Generate" in p  # the explode stays map-side


# ---------------------------------------------------------------------------
# pair_idf_overlap
# ---------------------------------------------------------------------------


def test_pair_idf_overlap_matches_naive(spark):
    rows = _docs(spark)
    toksets = {r["doc_id"]: set(t for t in r["text"].split(" ") if t) for r in rows}
    n = len(rows)
    df = collections.Counter()
    for ts in toksets.values():
        df.update(ts)
    idf = {t: math.log(n) - math.log(c) for t, c in df.items()}
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in Q.QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in q_pair_idf_overlap(spark, SF).collect()
    }
    want_keys = {
        (a, b) for (a, b) in cands if toksets[a] & toksets[b]
    }
    assert set(got) == want_keys  # union idf > 0 whenever a rare token exists
    for (a, b), r in got.items():
        shared = toksets[a] & toksets[b]
        s = sum(idf[t] for t in shared)
        u = sum(idf[t] for t in toksets[a]) + sum(idf[t] for t in toksets[b]) - s
        assert r["n_shared_toks"] == len(shared)
        assert abs(r["idf_overlap"] - round(s / u, 6)) <= 1e-5


def test_pair_idf_overlap_plan_broadcasts_candidates(spark):
    p = _plan_of(q_pair_idf_overlap(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # candidate pairs + idf totals broadcast


# ---------------------------------------------------------------------------
# mixture_waterfill
# ---------------------------------------------------------------------------


def _naive_waterfill(caps: dict):
    total = sum(caps.values())
    budget = total // 2
    ordered = sorted(caps.items(), key=lambda kv: (kv[1], kv[0]))
    s = len(ordered)
    pfx, k, pfx_k = 0, 0, 0
    for i, (_, c) in enumerate(ordered, start=1):
        pfx += c
        if pfx + c * (s - i) <= budget:
            k, pfx_k = i, pfx
    level = (budget - pfx_k) // (s - k)
    out = {}
    for i, (src, c) in enumerate(ordered, start=1):
        sat = 1 if i <= k else 0
        out[src] = (c, c if sat else min(c, level), sat)
    return out


def test_mixture_waterfill_matches_naive(spark):
    caps = collections.Counter()
    for r in _docs(spark):
        caps[r["source"]] += len(r["text"].split(" "))
    want = _naive_waterfill(dict(caps))
    got = {r["source"]: r for r in q_mixture_waterfill(spark, SF).collect()}
    assert set(got) == set(want)
    for src, (cap, alloc, sat) in want.items():
        r = got[src]
        assert (r["cap_tokens"], r["alloc_tokens"], r["saturated"]) == (
            cap,
            alloc,
            sat,
        )


def test_mixture_waterfill_respects_budget_and_caps(spark):
    rows = q_mixture_waterfill(spark, SF).collect()
    total = sum(r["cap_tokens"] for r in rows)
    budget = total // 2
    alloc = sum(r["alloc_tokens"] for r in rows)
    assert alloc <= budget  # floor division may undershoot, never overshoot
    n_unsat = sum(1 for r in rows if not r["saturated"])
    assert budget - alloc < max(n_unsat, 1)  # undershoot < 1 token/survivor
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
    # saturated sources contribute everything they have
    for r in rows:
        if r["saturated"]:
            assert r["alloc_tokens"] == r["cap_tokens"]


def test_mixture_waterfill_uniform_level_on_survivors(spark):
    rows = q_mixture_waterfill(spark, SF).collect()
    levels = {r["alloc_tokens"] for r in rows if not r["saturated"]}
    assert len(levels) == 1  # every unsaturated source gets the same level
    (level,) = levels
    for r in rows:
        if r["saturated"]:
            assert r["cap_tokens"] <= level
