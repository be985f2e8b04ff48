"""Semantics tests for the wave-87 causal-evaluation entries: Qini,
SMD balance, value-level matching, permutation test, IPF raking.  The
DuckDB value-hash gate is scripts/check_queries.py; these pin the
placebo ground truth (hash treatment ⇒ near-zero effects, permutation
p NOT extreme), the matching optimality, and the raking margins."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_causal import (
    _PERM_K,
    q_att_nearest_match,
    q_covariate_balance_smd,
    q_ipf_raking_2iter,
    q_placebo_permutation_test,
    q_qini_curve,
)

SF = "/root/testdata/sf0.001"


def _coin(doc_id: int, salt: str) -> int:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()
    return int(h[:4], 16) % 2


def _units():
    rows = duckdb.sql(
        f"SELECT doc_id, n_chars, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    return [
        (int(d), int(v), 1 if l == "en" else 0, _coin(int(d), "t0"))
        for d, v, l in rows
    ]


def test_qini_curve_matches_local(spark):
    us = _units()
    # descending-score deciles from the value histogram
    hist = Counter(v for _d, v, _y, _t in us)
    n = len(us)
    dec_of = {}
    cum = 0
    for v in sorted(hist, reverse=True):
        cum += hist[v]
        # the SQL assigns a value block by its LAST row's position
        dec_of[v] = ((cum - 1) * 10) // n + 1
    per = defaultdict(lambda: [0, 0, 0, 0])
    for _d, v, y, t in us:
        e = per[dec_of[v]]
        if t == 1:
            e[0] += 1
            e[1] += y
        else:
            e[2] += 1
            e[3] += y
    got = {r["decile"]: r for r in q_qini_curve(spark, SF).collect()}
    cnt = [0, 0, 0, 0]
    for d in sorted(per):
        for i in range(4):
            cnt[i] += per[d][i]
        if cnt[2] == 0:
            continue
        r = got[d]
        assert (r["cum_nt"], r["cum_ct"], r["cum_nc"], r["cum_cc"]) == tuple(cnt)
        num = cnt[1] * cnt[2] - cnt[3] * cnt[0]
        den = cnt[2]
        want = (
            (2_000_000 * num + den) // (2 * den)
            if num >= 0
            else -((2_000_000 * -num + den) // (2 * den))
        )
        assert r["qini_micro"] == want
    # placebo: final Qini is small relative to the corpus size
    last = got[max(got)]
    assert abs(last["qini_micro"]) < last["cum_nt"] * 200_000


def test_smd_balance_near_zero(spark):
    rows = {r["covariate"]: r for r in q_covariate_balance_smd(spark, SF).collect()}
    assert set(rows) == {"n_chars", "tokens"}
    for r in rows.values():
        assert r["n_t"] + r["n_c"] == 500
        # hash treatment ⇒ balanced covariates (|SMD| < 0.25 loose)
        assert abs(r["smd_micro"]) < 250_000


def test_matching_is_nearest(spark):
    us = _units()
    cv = sorted({v for _d, v, _y, t in us if t == 0})
    got = {r["v"]: r for r in q_att_nearest_match(spark, SF).collect()}
    tv = {v for _d, v, _y, t in us if t == 1}
    assert set(got) == tv
    for v, r in got.items():
        best = min(cv, key=lambda c: (abs(v - c), c))
        assert r["matched_v"] == best
        assert r["match_dist"] == abs(v - best)
    # aggregate ATT from the per-value table is near zero (placebo)
    ntot = sum(r["nt"] for r in got.values())
    att = sum(r["nt"] * r["delta_micro"] for r in got.values()) / ntot
    assert abs(att) < 300_000


def test_permutation_p_not_extreme(spark):
    rows = {r["salt"]: r for r in q_placebo_permutation_test(spark, SF).collect()}
    assert set(rows) == set(range(_PERM_K + 1))
    obs = rows[0]
    assert obs["abs_ge_observed"] == 1
    # local replay of salt 0
    us = _units()
    nt = sum(1 for *_x, t in us if t == 1)
    ct = sum(y for _d, _v, y, t in us if t == 1)
    nc = len(us) - nt
    cc = sum(y for _d, _v, y, t in us if t == 0)
    assert (obs["n_t"], obs["c_t"], obs["n_c"], obs["c_c"]) == (nt, ct, nc, cc)
    # the placebo effect is not the most extreme of 21 hash coins
    p_num = sum(rows[k]["abs_ge_observed"] for k in range(1, _PERM_K + 1))
    assert p_num >= 1


def test_ipf_margins_converge(spark):
    rows = q_ipf_raking_2iter(spark, SF).collect()
    n = sum(r["c"] for r in rows)
    langs = {r["lang"] for r in rows}
    # after the final column step, every lang margin hits its target
    # exactly up to half-up rounding of the cell weights
    for l in langs:
        mass = sum(r["c"] * r["weight_micro"] for r in rows if r["lang"] == l)
        target = n * 1_000_000 // len(langs)
        assert abs(mass - target) <= n  # ≤1 micro per unit of count
    for r in rows:
        assert r["weight_micro"] > 0
        assert r["raked_mass_micro"] == r["c"] * r["weight_micro"]


def test_registered_in_catalog():
    for name in (
        "qini_curve",
        "covariate_balance_smd",
        "att_nearest_match",
        "placebo_permutation_test",
        "ipf_raking_2iter",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
