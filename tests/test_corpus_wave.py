"""Semantics tests for the wave-25 corpus-behavior entries: session
paths, pair n-gram recall, perplexity terciles, turn self-repetition,
and the near-dup 2-core.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io

from pyspark.sql import functions as F

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_corpus import (
    _KCORE_K,
    _SP_GAP_S,
    _SP_PATH_CAP,
    q_kcore_decompose,
    q_pair_ngram_recall,
    q_perplexity_buckets,
    q_session_paths,
    q_turn_self_repetition,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _dup_adjacency(spark):
    adj = collections.defaultdict(set)
    for r in Q.q_dedup_minhash_verify(spark, SF).collect():
        adj[r["doc_a"]].add(r["doc_b"])
        adj[r["doc_b"]].add(r["doc_a"])
    return adj


# ---------------------------------------------------------------------------
# session_paths
# ---------------------------------------------------------------------------


def _naive_session_paths(spark):
    rows = (
        Q._t(spark, SF, "events")
        .select("user_id",
                F.col("ts").cast("timestamp").cast("long").alias("ep"),
                "event_id", "event_type")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ep"], r["event_id"], r["event_type"]))
    paths = collections.defaultdict(lambda: [0, set()])
    for u, evs in by_user.items():
        evs.sort()
        sessions, cur, last = [], [], None
        for ep, eid, et in evs:
            if last is not None and ep - last > _SP_GAP_S:
                sessions.append(cur)
                cur = []
            cur.append(et)
            last = ep
        sessions.append(cur)
        for s in sessions:
            p = ">".join(s[:_SP_PATH_CAP])
            paths[p][0] += 1
            paths[p][1].add(u)
    return {p: (n, len(us)) for p, (n, us) in paths.items()}


def test_session_paths_matches_naive(spark):
    want = _naive_session_paths(spark)
    got = {
        r["path"]: (r["n_sessions"], r["n_users"])
        for r in q_session_paths(spark, SF).collect()
    }
    assert got == want


def test_session_paths_cap_bounds_key(spark):
    for r in q_session_paths(spark, SF).collect():
        assert len(r["path"].split(">")) <= _SP_PATH_CAP


def test_session_paths_plan_no_cartesian(spark):
    p = _plan_of(q_session_paths(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# pair_ngram_recall
# ---------------------------------------------------------------------------


def _grams(text: str, n: int) -> collections.Counter:
    toks = text.split(" ")
    return collections.Counter(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def test_pair_ngram_recall_matches_naive(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in Q._t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in Q.q_dedup_minhash_verify(spark, SF).collect()
    ]
    got = {
        (r["doc_a"], r["doc_b"], r["n"]): r
        for r in q_pair_ngram_recall(spark, SF).collect()
    }
    assert set(got) == {(a, b, n) for a, b in pairs for n in (1, 2)}
    for a, b in pairs:
        for n in (1, 2):
            ca, cb = _grams(texts[a], n), _grams(texts[b], n)
            overlap = sum((ca & cb).values())
            ref = sum(ca.values())
            r = got[(a, b, n)]
            assert r["overlap"] == overlap
            assert r["ref_total"] == ref
            want = 0.0 if ref == 0 else round(overlap / ref, 6)
            assert abs(r["recall"] - want) <= 5e-7


def test_pair_ngram_recall_near_dups_overlap_heavily(spark):
    # verified pairs share >= 50% shingle Jaccard, so unigram recall
    # should be well above zero for every pair
    rows = q_pair_ngram_recall(spark, SF).where(F.col("n") == 1).collect()
    assert rows
    assert all(r["recall"] > 0.3 for r in rows)


def test_pair_ngram_recall_plan_no_cartesian(spark):
    p = _plan_of(q_pair_ngram_recall(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    Q.release_persists()


# ---------------------------------------------------------------------------
# perplexity_buckets
# ---------------------------------------------------------------------------


def test_perplexity_buckets_matches_naive(spark):
    lp = {
        r["doc_id"]: r["logprob2"]
        for r in Q.QUERIES["unigram_logprob"](spark, SF).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in Q._t(spark, SF, "documents").select("doc_id", "lang").collect()
    }
    by_lang = collections.defaultdict(list)
    for doc, lang in langs.items():
        by_lang[lang].append((lp[doc], doc))
    want = collections.defaultdict(lambda: [0, None, None])
    for lang, docs in by_lang.items():
        docs.sort()
        n = len(docs)
        for rank, (v, _) in enumerate(docs, start=1):
            b = 1 + (3 * rank > n) + (3 * rank > 2 * n)
            slot = want[(lang, b)]
            slot[0] += 1
            slot[1] = v if slot[1] is None else min(slot[1], v)
            slot[2] = v if slot[2] is None else max(slot[2], v)
    got = {
        (r["lang"], r["bucket"]): (r["n_docs"], r["min_lp"], r["max_lp"])
        for r in q_perplexity_buckets(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_perplexity_buckets_tercile_sizes(spark):
    # bucket sizes per lang differ by at most 1 from n/3 rounding
    rows = q_perplexity_buckets(spark, SF).collect()
    per_lang = collections.defaultdict(dict)
    for r in rows:
        per_lang[r["lang"]][r["bucket"]] = r["n_docs"]
    for lang, sizes in per_lang.items():
        n = sum(sizes.values())
        for b in (1, 2, 3):
            assert abs(sizes.get(b, 0) - n / 3) < 1
        # buckets are ordered: every bucket-1 lp <= every bucket-3 lp
    b1max = {r["lang"]: r["max_lp"] for r in rows if r["bucket"] == 1}
    b3min = {r["lang"]: r["min_lp"] for r in rows if r["bucket"] == 3}
    for lang in b1max:
        if lang in b3min:
            assert b1max[lang] <= b3min[lang]


def test_perplexity_buckets_no_global_window(spark):
    # the rank decomposes over (lang, bin) — no empty-partition window
    # (a single-task global sort) may appear anywhere in the plan
    p = _plan_of(q_perplexity_buckets(spark, SF))
    assert "CartesianProduct" not in p
    for line in p.splitlines():
        if "Window" in line and "partition" in line.lower():
            assert "PartitionSpec: []" not in line


# ---------------------------------------------------------------------------
# turn_self_repetition
# ---------------------------------------------------------------------------


def test_turn_self_repetition_matches_naive(spark):
    rows = Q._t(spark, SF, "documents").select("doc_id", "text").collect()
    per_conv = collections.defaultdict(list)
    for r in rows:
        per_conv[r["doc_id"] // 10].append(r["text"] or "")
    got = {r["conv"]: r for r in q_turn_self_repetition(spark, SF).collect()}
    assert set(got) == set(per_conv)
    for conv, turns in per_conv.items():
        c = collections.Counter(turns)
        r = got[conv]
        assert r["n_turns"] == len(turns)
        assert r["n_distinct_turns"] == len(c)
        assert r["max_multiplicity"] == max(c.values())
        want = round((len(turns) - len(c)) / len(turns), 6)
        assert abs(r["rep_ratio"] - want) <= 5e-7


def test_turn_self_repetition_plan_partial_agg(spark):
    p = _plan_of(q_turn_self_repetition(spark, SF))
    assert "partial" in p  # map-side combine on both groupBys
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# kcore_decompose
# ---------------------------------------------------------------------------


def _naive_kcore(adj, k):
    adj = {u: set(vs) for u, vs in adj.items()}
    changed = True
    while changed:
        changed = False
        kill = [u for u, vs in adj.items() if len(vs) < k]
        for u in kill:
            changed = True
            for v in adj[u]:
                adj[v].discard(u)
            del adj[u]
    return adj


def test_kcore_matches_naive_peel(spark):
    core = _naive_kcore(_dup_adjacency(spark), _KCORE_K)
    got = {r["doc_id"]: r["core_degree"] for r in q_kcore_decompose(spark, SF).collect()}
    assert got == {u: len(vs) for u, vs in core.items()}
    Q.release_persists()


def test_kcore_is_subset_with_min_degree(spark):
    rows = q_kcore_decompose(spark, SF).collect()
    assert rows  # fixture graph has a non-trivial 2-core
    assert all(r["core_degree"] >= _KCORE_K for r in rows)
    adj = _dup_adjacency(spark)
    assert set(r["doc_id"] for r in rows) <= set(adj)
    Q.release_persists()
