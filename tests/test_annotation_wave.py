"""Semantics tests for the wave-72 annotation-quality entries:
labeler accuracy, majority vote, Fleiss' kappa, vote-rule sweep,
difficulty profile.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against a pure-Python
replay of the synthetic labeler model and statistical sanity bounds."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_annotation import (
    _FLIP_MICRO,
    _K,
    _L,
    q_fleiss_kappa,
    q_item_difficulty_profile,
    q_labeler_accuracy_report,
    q_majority_vote_eval,
    q_vote_rule_sweep,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _votes():
    rows = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    out = []
    for vec_id, label in rows:
        for k, p in enumerate(_FLIP_MICRO, start=1):
            if _h8(f"v:{k}:{vec_id}") % 1_000_000 >= p:
                vote = label
            else:
                vote = (label + 1 + _h8(f"w:{k}:{vec_id}") % (_L - 1)) % _L
            out.append((vec_id, label, k, p, vote))
    return out


def _majorities():
    votes = _votes()
    per = defaultdict(list)
    truth = {}
    for vec_id, label, _k, _p, vote in votes:
        per[vec_id].append(vote)
        truth[vec_id] = label
    maj = {}
    for vec_id, vs in per.items():
        c = Counter(vs)
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        maj[vec_id] = (best[0], best[1], truth[vec_id], len(set(vs)))
    return maj


def test_labeler_accuracy_matches_model(spark):
    votes = _votes()
    got = {
        r["labeler"]: r
        for r in q_labeler_accuracy_report(spark, SF).collect()
    }
    for k, p in enumerate(_FLIP_MICRO, start=1):
        mine = [(v == l) for _i, l, kk, _p, v in votes if kk == k]
        r = got[k]
        assert r["designed_flip_micro"] == p
        assert r["n_items"] == len(mine)
        assert r["n_correct"] == sum(mine)
        assert r["accuracy_micro"] == _halfup(
            1_000_000 * sum(mine), len(mine)
        )
        # observed accuracy near the designed 1-p (binomial noise)
        assert abs(r["accuracy_micro"] - (1_000_000 - p)) < 80_000


def test_majority_vote_matches_replay(spark):
    maj = _majorities()
    n = len(maj)
    correct = sum(1 for m, _c, t, _d in maj.values() if m == t)
    unanimous = sum(1 for _m, c, _t, _d in maj.values() if c == _K)
    ties = sum(1 for _m, c, _t, _d in maj.values() if c == 1)
    [r] = q_majority_vote_eval(spark, SF).collect()
    assert r["n_items"] == n
    assert r["n_correct"] == correct
    assert r["n_unanimous"] == unanimous
    assert r["n_ties"] == ties
    assert r["accuracy_micro"] == _halfup(1_000_000 * correct, n)
    # majority beats the best single labeler on this model
    best_single = max(
        r2["accuracy_micro"]
        for r2 in q_labeler_accuracy_report(spark, SF).collect()
    )
    assert r["accuracy_micro"] >= best_single


def test_fleiss_kappa_matches_replay(spark):
    votes = _votes()
    per = defaultdict(Counter)
    cat = Counter()
    for vec_id, _l, _k, _p, vote in votes:
        per[vec_id][vote] += 1
        cat[vote] += 1
    n = len(per)
    agree = sum(
        nij * (nij - 1) for c in per.values() for nij in c.values()
    )
    po = _halfup(1_000_000 * agree, n * _K * (_K - 1))
    pjs = [_halfup(1_000_000 * cat[j], n * _K) for j in sorted(cat)]
    pe = _halfup(sum(p * p for p in pjs), 1_000_000)
    if po >= pe:
        kappa = _halfup(1_000_000 * (po - pe), 1_000_000 - pe)
    else:
        kappa = -_halfup(1_000_000 * (pe - po), 1_000_000 - pe)
    [r] = q_fleiss_kappa(spark, SF).collect()
    assert r["n_items"] == n
    assert r["po_micro"] == po
    assert r["pe_micro"] == pe
    assert r["kappa_micro"] == kappa
    # low-noise labelers agree far beyond chance
    assert r["kappa_micro"] > 500_000


def test_vote_rule_sweep_matches_replay(spark):
    maj = _majorities()
    t = len(maj)
    got = {r["rule"]: r for r in q_vote_rule_sweep(spark, SF).collect()}
    una = [(m, tr) for m, c, tr, _d in maj.values() if c == _K]
    mjr = [(m, tr) for m, c, tr, _d in maj.values() if c >= 2]
    votes = _votes()
    single = [(v, l) for _i, l, k, _p, v in votes if k == 1]
    for rule, pairs in (
        ("unanimous", una),
        ("majority", mjr),
        ("single", single),
    ):
        r = got[rule]
        correct = sum(1 for a, b in pairs if a == b)
        assert r["covered"] == len(pairs)
        assert r["correct"] == correct
        assert r["coverage_micro"] == _halfup(1_000_000 * len(pairs), t)
        assert r["accuracy_micro"] == _halfup(
            1_000_000 * correct, len(pairs)
        )
    # the frontier: unanimity trades coverage for accuracy
    assert got["unanimous"]["coverage_micro"] < got["majority"][
        "coverage_micro"
    ]
    assert got["unanimous"]["accuracy_micro"] >= got["majority"][
        "accuracy_micro"
    ]


def test_item_difficulty_matches_replay(spark):
    maj = _majorities()
    buckets = defaultdict(lambda: [0, 0])
    for m, _c, tr, d in maj.values():
        buckets[d][0] += 1
        buckets[d][1] += 1 if m == tr else 0
    t = len(maj)
    got = {
        r["n_distinct"]: r
        for r in q_item_difficulty_profile(spark, SF).collect()
    }
    assert set(got) == set(buckets)
    for d, (ni, nc) in buckets.items():
        r = got[d]
        assert r["n_items"] == ni and r["n_correct"] == nc
        assert r["share_micro"] == _halfup(1_000_000 * ni, t)
        assert r["accuracy_micro"] == _halfup(1_000_000 * nc, ni)
    # accuracy degrades with disagreement
    accs = [got[d]["accuracy_micro"] for d in sorted(got)]
    assert accs[0] >= accs[-1]


def test_registered_in_catalog():
    for name in (
        "labeler_accuracy_report",
        "majority_vote_eval",
        "fleiss_kappa",
        "vote_rule_sweep",
        "item_difficulty_profile",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
