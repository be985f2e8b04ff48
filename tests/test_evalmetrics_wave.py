"""Semantics tests for the wave-49 eval-metric entries: pairwise
BLEU-2, chrF, self-BLEU-lite source diversity, ECE, and UCB1 arm
ranking.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against an independent single-node recomputation
plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_evalmetrics import (
    _ECE_BINS,
    _ECE_K,
    _ECE_W,
    q_bleu_pairs,
    q_chrf_pairs,
    q_ece_score,
    q_self_bleu_lite,
    q_ucb_arm_ranking,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return {
        r["doc_id"]: r
        for r in Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    }


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _pairs(spark):
    return [
        (r["doc_a"], r["doc_b"])
        for r in Q.q_dedup_minhash_verify(spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    ]


# ---------------------------------------------------------------------------
# bleu_pairs
# ---------------------------------------------------------------------------


def _ngrams(toks, n):
    return collections.Counter(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def test_bleu_matches_local(spark):
    docs = _docs(spark)
    rows = {(r["doc_a"], r["doc_b"]): r for r in q_bleu_pairs(spark, SF).collect()}
    assert set(rows) == set(_pairs(spark))
    for (a, b), r in rows.items():
        ta, tb = _tokens(docs[a]["text"]), _tokens(docs[b]["text"])
        for n, (pcol) in ((1, "p1"), (2, "p2")):
            ga, gb = _ngrams(ta, n), _ngrams(tb, n)
            clip = sum(min(c, ga[g]) for g, c in gb.items())
            tot = sum(gb.values())
            want = 0.0 if tot == 0 else (2_000_000 * clip + tot) // (2 * tot) / 1e6
            assert r[pcol] == want
        rl, cl = len(ta), len(tb)
        bp = 0.0 if cl == 0 else _micro(min(1.0, math.exp(1.0 - rl / cl)))
        assert r["bp"] == bp
        g1a, g1b = _ngrams(ta, 1), _ngrams(tb, 1)
        g2a, g2b = _ngrams(ta, 2), _ngrams(tb, 2)
        c1 = sum(min(c, g1a[g]) for g, c in g1b.items())
        c2 = sum(min(c, g2a[g]) for g, c in g2b.items())
        t1, t2 = sum(g1b.values()), sum(g2b.values())
        if t1 == 0 or t2 == 0 or c1 == 0 or c2 == 0 or cl == 0:
            want_bleu = 0.0
        else:
            want_bleu = _micro(
                min(1.0, math.exp(1.0 - rl / cl))
                * math.sqrt((c1 / t1) * (c2 / t2))
            )
        assert r["bleu2"] == want_bleu


def test_bleu_near_dups_score_high(spark):
    rows = q_bleu_pairs(spark, SF).collect()
    # verified near-dups share most n-grams
    assert sum(r["bleu2"] for r in rows) / len(rows) > 0.5


# ---------------------------------------------------------------------------
# chrf_pairs
# ---------------------------------------------------------------------------


def _chargrams(text):
    s = (text or "").replace(" ", "")
    return collections.Counter(s[i : i + 3] for i in range(len(s) - 2))


def test_chrf_matches_local(spark):
    docs = _docs(spark)
    rows = {
        (r["doc_a"], r["doc_b"]): r for r in q_chrf_pairs(spark, SF).collect()
    }
    assert set(rows) == set(_pairs(spark))
    for (a, b), r in rows.items():
        ga, gb = _chargrams(docs[a]["text"]), _chargrams(docs[b]["text"])
        clip = sum(min(c, ga[g]) for g, c in gb.items())
        rt, ct = sum(ga.values()), sum(gb.values())
        p = 0.0 if ct == 0 else (2_000_000 * clip + ct) // (2 * ct) / 1e6
        rr = 0.0 if rt == 0 else (2_000_000 * clip + rt) // (2 * rt) / 1e6
        assert r["precision"] == p
        assert r["recall"] == rr
        if clip == 0 or ct == 0 or rt == 0:
            want = 0.0
        else:
            want = _micro(
                5.0 * (clip / ct) * (clip / rt)
                / (4.0 * clip / ct + clip / rt)
            )
        assert r["chrf"] == want


def test_chrf_bounds(spark):
    rows = q_chrf_pairs(spark, SF).collect()
    assert all(0.0 <= r["chrf"] <= 1.0 for r in rows)
    plan = _plan_of(q_chrf_pairs(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# self_bleu_lite
# ---------------------------------------------------------------------------


def test_self_bleu_matches_local(spark):
    docs = _docs(spark)
    by_src = collections.defaultdict(dict)
    for d, r in docs.items():
        toks = _tokens(r["text"])
        if len(toks) < 2:
            continue
        bgs = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        by_src[r["source"] or ""][d] = bgs
    want = {}
    for g, per in by_src.items():
        cnt = collections.Counter()
        for bgs in per.values():
            cnt.update(bgs)
        shares = []
        for bgs in per.values():
            nsh = sum(1 for b in bgs if cnt[b] >= 2)
            shares.append(
                (2_000_000 * nsh + len(bgs)) // (2 * len(bgs))
            )
        want[g] = (
            len(per),
            (2 * sum(shares) + len(shares)) // (2 * len(shares)) / 1e6,
            min(shares) / 1e6,
            max(shares) / 1e6,
        )
    got = {
        r["source"]: (
            r["n_docs"],
            r["mean_reuse"],
            r["min_reuse"],
            r["max_reuse"],
        )
        for r in q_self_bleu_lite(spark, SF).collect()
    }
    assert got == want


def test_self_bleu_plan(spark):
    plan = _plan_of(q_self_bleu_lite(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# ece_score
# ---------------------------------------------------------------------------


def test_ece_matches_local(spark):
    docs = _docs(spark)
    tr = collections.defaultdict(lambda: [0, 0])
    for d, r in docs.items():
        if d % 2 == 0:
            b = min(r["n_chars"] // _ECE_W, _ECE_K - 1)
            tr[b][0] += 1
            tr[b][1] += 1 if r["lang"] == "en" else 0
    pq = {
        b: math.floor((e + 1) / (n + 2) * 1e6 + 0.5)
        for b, (n, e) in tr.items()
    }
    bins = collections.defaultdict(lambda: [0, 0, 0])
    for d, r in docs.items():
        if d % 2 == 1:
            b = min(r["n_chars"] // _ECE_W, _ECE_K - 1)
            if b not in pq:
                continue
            conf = max(pq[b], 1_000_000 - pq[b])
            pred = 1 if pq[b] >= 500_000 else 0
            y = 1 if r["lang"] == "en" else 0
            bi = min(conf * _ECE_BINS // 1_000_000, _ECE_BINS - 1)
            s = bins[bi]
            s[0] += 1
            s[1] += conf
            s[2] += 1 if pred == y else 0
    n = sum(s[0] for s in bins.values())
    werr = sum(
        math.floor(
            abs(s[2] / s[0] - s[1] / s[0] / 1e6) * s[0] * 1e6 + 0.5
        )
        for s in bins.values()
    )
    row = q_ece_score(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["n_bins_used"] == len(bins)
    assert row["ece"] == math.floor(werr / n + 0.5) / 1e6


def test_ece_bounds_and_plan(spark):
    row = q_ece_score(spark, SF).collect()[0]
    assert 0.0 <= row["ece"] <= 1.0
    plan = _plan_of(q_ece_score(spark, SF))
    assert "BroadcastExchange" in plan  # the rate table
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# ucb_arm_ranking
# ---------------------------------------------------------------------------


def test_ucb_matches_local(spark):
    per = collections.defaultdict(lambda: [0, 0])
    for r in _docs(spark).values():
        s = per[r["source"] or ""]
        s[0] += 1
        s[1] += 1 if r["lang"] == "en" else 0
    n = sum(s[0] for s in per.values())
    scores = {
        g: _micro(e / ns + math.sqrt(2.0 * math.log(n) / ns))
        for g, (ns, e) in per.items()
    }
    order = sorted(per, key=lambda g: (-scores[g], g))
    rows = q_ucb_arm_ranking(spark, SF).collect()
    assert [r["source"] for r in rows] == order
    for r in rows:
        ns, e = per[r["source"]]
        assert r["n_s"] == ns
        assert r["rate"] == _micro(e / ns)
        assert r["ucb_score"] == scores[r["source"]]
    assert [r["rank"] for r in rows] == list(range(1, len(order) + 1))


def test_ucb_exploration_bonus(spark):
    rows = q_ucb_arm_ranking(spark, SF).collect()
    # every arm's UCB strictly exceeds its raw rate
    assert all(r["ucb_score"] > r["rate"] for r in rows)
    plan = _plan_of(q_ucb_arm_ranking(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave49_registered():
    for name in (
        "bleu_pairs",
        "chrf_pairs",
        "self_bleu_lite",
        "ece_score",
        "ucb_arm_ranking",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
