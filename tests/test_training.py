"""Training-set assembly ops (preference pairs / padding waste):
algorithmic invariants on the Spark side.  Gate-level value-hash
equality vs DuckDB is covered by scripts/check_queries.py."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from occular_ocr_spark.queries_training import (
    _PW_MIN_CAP,
    q_padding_waste,
    q_preference_pairs,
)

SF = "/root/testdata/sf0.001"


def test_preference_pairs_margins_and_disjointness(spark):
    rows = q_preference_pairs(spark, SF).collect()
    assert rows
    used = [r.chosen_doc for r in rows] + [r.rejected_doc for r in rows]
    assert len(used) == len(set(used))  # each doc in at most one pair
    for r in rows:
        assert r.margin >= 0  # chosen is never worse
        assert r.chosen_doc != r.rejected_doc
    # exact pair count: floor(group_size / 2) per source
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = int(sum(n // 2 for n in docs.groupby("source").size()))
    assert len(rows) == want


def test_preference_pairs_chosen_matches_rank_order(spark):
    rows = q_preference_pairs(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    score = dict(zip(docs.doc_id, docs.n_chars))
    for r in rows:
        cs, rs = score[r.chosen_doc], score[r.rejected_doc]
        # higher n_chars wins; doc_id breaks exact ties
        assert (cs, -r.chosen_doc) >= (rs, -r.rejected_doc)
        assert r.margin == cs - rs


def test_padding_waste_buckets_and_accounting(spark):
    rows = q_padding_waste(spark, SF).collect()
    assert rows
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n_docs = len(docs)
    assert sum(r.docs for r in rows) == n_docs
    for r in rows:
        # caps are powers of two >= the floor
        assert r.cap >= _PW_MIN_CAP
        assert r.cap & (r.cap - 1) == 0
        assert r.padded_tokens == r.cap * r.docs
        assert r.waste_tokens == r.padded_tokens - r.real_tokens
        assert r.waste_tokens >= 0
        assert r.waste_ratio == pytest.approx(
            r.waste_tokens / r.padded_tokens, abs=1e-6
        )
        # every doc in the bucket fits: real <= cap per doc on average
        # and the bucket below would not fit at least one doc
        assert r.real_tokens <= r.padded_tokens


def test_padding_waste_bucket_assignment_brute_force(spark):
    rows = {r.cap: r for r in q_padding_waste(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    want = Counter()
    toks_sum = Counter()
    for t in docs.text.fillna(""):
        toks = max(len(t.split(" ")), 1)
        cap = max(toks, _PW_MIN_CAP)
        cap = 2 ** math.ceil(math.log2(cap))
        want[cap] += 1
        toks_sum[cap] += toks
    assert {c: r.docs for c, r in rows.items()} == dict(want)
    assert {c: r.real_tokens for c, r in rows.items()} == dict(toks_sum)


# ---------------------------------------------------------------------------
# epoch_shuffle (wave 8)
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_a_permutation(spark):
    from occular_ocr_spark.queries_training import q_epoch_shuffle

    rows = q_epoch_shuffle(spark, SF).collect()
    pos = sorted(r["train_pos"] for r in rows)
    assert pos == list(range(len(rows)))
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(rows) == len(docs)


def test_epoch_shuffle_matches_md5_reference(spark):
    import hashlib

    from occular_ocr_spark.queries_training import _EPOCH_SEED, q_epoch_shuffle

    rows = q_epoch_shuffle(spark, SF).collect()
    for r in rows[:50]:
        want = int(
            hashlib.md5(f"{r['doc_id']}:{_EPOCH_SEED}".encode()).hexdigest()[:4], 16
        )
        assert r["shuffle_key"] == want
    # rank order == (key, doc_id) order
    by_pos = sorted(rows, key=lambda r: r["train_pos"])
    keys = [(r["shuffle_key"], r["doc_id"]) for r in by_pos]
    assert keys == sorted(keys)


def test_epoch_shuffle_actually_shuffles(spark):
    from occular_ocr_spark.queries_training import q_epoch_shuffle

    rows = q_epoch_shuffle(spark, SF).collect()
    # the permutation is not (anti-)monotone in doc_id
    by_doc = sorted(rows, key=lambda r: r["doc_id"])
    pos = [r["train_pos"] for r in by_doc]
    asc = sum(1 for a, b in zip(pos, pos[1:]) if b > a)
    assert 0.3 < asc / (len(pos) - 1) < 0.7


def test_epoch_shuffle_no_global_sort(spark):
    from occular_ocr_spark.queries_training import q_epoch_shuffle
    from tests.test_plans import n_nodes, plan_of

    p = plan_of(q_epoch_shuffle(spark, SF))
    # the only ordered structure is the 65,536-row-bounded prefix
    # window; row-shaped data is never range-partitioned
    assert p.count("rangepartitioning") <= 1  # prefix window only
    assert "hashpartitioning(shuffle_key" in p
    assert n_nodes(p, "BroadcastHashJoin") >= 1  # prefix rides a broadcast


# ---------------------------------------------------------------------------
# bradley_terry
# ---------------------------------------------------------------------------


def test_bradley_terry_matches_naive_mm(spark):
    import math
    import struct

    from occular_ocr_spark.queries import _t
    from occular_ocr_spark.queries_training import _BT_ITERS, q_bradley_terry

    docs = sorted(
        (r["doc_id"], r["source"], r["n_chars"])
        for r in _t(spark, SF, "documents").collect()
    )
    by_id = {d[0]: d for d in docs}
    wins = {}
    for did, src, nc in docs:
        nxt = by_id.get(did + 1)
        if not nxt or nxt[1] == src:
            continue
        w, l = (src, nxt[1]) if nc >= nxt[2] else (nxt[1], src)
        wins[(w, l)] = wins.get((w, l), 0) + 1
    srcs = sorted({s for p in wins for s in p})
    n_ij = {}
    w_tot = {s: 0 for s in srcs}
    for (w, l), c in wins.items():
        n_ij[(w, l)] = n_ij.get((w, l), 0) + c
        n_ij[(l, w)] = n_ij.get((l, w), 0) + c
        w_tot[w] += c

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    p = {s: 1.0 for s in srcs}
    for _ in range(_BT_ITERS):
        nxt_p = {}
        for i in srcs:
            d9 = sum(
                math.floor(n / (p[i] + p[j]) * 1e9 + 0.5)
                for (a, j), n in n_ij.items()
                if a == i
            )
            nxt_p[i] = f32(w_tot[i] / (d9 / 1e9)) if d9 else None
        p = nxt_p
    out = {r["source"]: r for r in q_bradley_terry(spark, SF).collect()}
    assert set(out) == set(srcs)
    for s in srcs:
        r = out[s]
        assert r["n_wins"] == w_tot[s]
        assert r["n_matches"] == sum(
            n for (a, _), n in n_ij.items() if a == s
        )
        assert r["rating"] == round(p[s], 6)
    # the fit discriminates: ratings are not all identical
    assert len({r["rating"] for r in out.values()}) > 1


def test_bradley_terry_rating_orders_with_win_rate(spark):
    # Spearman-style sanity: the best and worst win-rate sources must
    # not invert in rating (the MM fit preserves dominance at the
    # extremes even after 2 iterations)
    from occular_ocr_spark.queries_training import q_bradley_terry

    rows = [r for r in q_bradley_terry(spark, SF).collect() if r["rating"]]
    best = max(rows, key=lambda r: r["n_wins"] / r["n_matches"])
    worst = min(rows, key=lambda r: r["n_wins"] / r["n_matches"])
    assert best["rating"] > worst["rating"]
