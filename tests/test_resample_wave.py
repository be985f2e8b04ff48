"""Semantics tests for the wave-66 resampling-inference entries:
sign-flip paired test, randomization label test, grouped jackknife,
energy distance, Ansari-Bradley.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against brute-force
hashlib recomputations of the textbook definitions."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_resample import (
    _LANG_A,
    _RL_K,
    _SF_K,
    q_ansari_bradley,
    q_energy_distance,
    q_jackknife_groups,
    q_randomization_label_test,
    q_signflip_paired_test,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()


# ---------------------------------------------------------------------------
# signflip_paired_test
# ---------------------------------------------------------------------------


def test_signflip_matches_local(spark):
    rows = duckdb.sql(
        f"""SELECT user_id,
              sum(CASE WHEN event_type = 'click' THEN 1
                       WHEN event_type = 'view' THEN -1 ELSE 0 END)
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    d = {int(u): int(v) for u, v in rows}
    t_obs = sum(d.values())
    extreme = 0
    for k in range(_SF_K):
        t_k = sum(
            v if _h8(f"f:{k}:{u}") % 2 == 0 else -v for u, v in d.items()
        )
        if abs(t_k) >= abs(t_obs):
            extreme += 1
    [r] = q_signflip_paired_test(spark, SF).collect()
    assert r["n_users"] == len(d)
    assert r["t_obs"] == t_obs
    assert r["k_flips"] == _SF_K
    assert r["n_extreme"] == extreme
    assert r["p_micro"] == _halfup(1_000_000 * extreme, _SF_K)


# ---------------------------------------------------------------------------
# randomization_label_test
# ---------------------------------------------------------------------------


def test_randomization_matches_local(spark):
    docs = _docs()
    n = len(docs)
    a = [(x) for _d, lg, x in docs if lg == _LANG_A]
    b = [(x) for _d, lg, x in docs if lg != _LANG_A]
    share = _halfup(1_000_000 * len(a), n)
    diff_obs = _halfup(1_000_000 * sum(a), len(a)) - _halfup(
        1_000_000 * sum(b), len(b)
    )
    extreme = 0
    k_valid = 0
    for k in range(_RL_K):
        sa = na = sb = nb = 0
        for doc_id, _lg, x in docs:
            if _h8(f"r:{k}:{doc_id}") % 1_000_000 < share:
                sa += x
                na += 1
            else:
                sb += x
                nb += 1
        if na == 0 or nb == 0:
            continue
        k_valid += 1
        dk = _halfup(1_000_000 * sa, na) - _halfup(1_000_000 * sb, nb)
        if abs(dk) >= abs(diff_obs):
            extreme += 1
    [r] = q_randomization_label_test(spark, SF).collect()
    assert r["n_docs"] == n and r["n_a"] == len(a)
    assert r["diff_obs_micro"] == diff_obs
    assert r["k_reps"] == k_valid
    assert r["n_extreme"] == extreme
    assert r["p_micro"] == _halfup(1_000_000 * extreme, k_valid)


# ---------------------------------------------------------------------------
# jackknife_groups
# ---------------------------------------------------------------------------


def test_jackknife_matches_local(spark):
    docs = _docs()
    per = defaultdict(lambda: [0, 0])
    for _d, lg, x in docs:
        per[lg][0] += 1
        per[lg][1] += x
    g = len(per)
    n = sum(v[0] for v in per.values())
    s = sum(v[1] for v in per.values())
    theta = _halfup(1_000_000 * s, n)
    pseudos = {}
    for lg, (nj, sj) in per.items():
        tm = _halfup(1_000_000 * (s - sj), n - nj)
        pseudos[lg] = (nj, tm, g * theta - (g - 1) * tm)
    pbar = _halfup(sum(p for _n, _t, p in pseudos.values()), g)
    var = _halfup(
        sum((p - pbar) ** 2 for _n, _t, p in pseudos.values()),
        g * (g - 1),
    )
    got = {r["lang"]: r for r in q_jackknife_groups(spark, SF).collect()}
    assert set(got) == set(pseudos)
    for lg, (nj, tm, p) in pseudos.items():
        r = got[lg]
        assert r["n_excluded"] == nj
        assert r["theta_micro"] == theta
        assert r["theta_minus_micro"] == tm
        assert r["pseudo_micro"] == p
        assert r["pseudo_mean_micro"] == pbar
        assert r["jack_var_micro2"] == var


# ---------------------------------------------------------------------------
# energy_distance
# ---------------------------------------------------------------------------


def test_energy_matches_bruteforce(spark):
    docs = _docs()
    a = sorted(x for _d, lg, x in docs if lg == _LANG_A)
    b = sorted(x for _d, lg, x in docs if lg != _LANG_A)
    s_ab = sum(abs(x - y) for x in a for y in b)
    s_aa = sum(
        abs(a[i] - a[j]) for i in range(len(a)) for j in range(i + 1, len(a))
    )
    s_bb = sum(
        abs(b[i] - b[j]) for i in range(len(b)) for j in range(i + 1, len(b))
    )
    [r] = q_energy_distance(spark, SF).collect()
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert r["s_ab"] == s_ab
    assert r["s_aa"] == s_aa
    assert r["s_bb"] == s_bb
    want = (
        2 * _halfup(1_000_000 * s_ab, len(a) * len(b))
        - _halfup(2_000_000 * s_aa, len(a) ** 2)
        - _halfup(2_000_000 * s_bb, len(b) ** 2)
    )
    assert r["energy_micro"] == want
    # energy distance is nonnegative up to half-up rounding
    assert r["energy_micro"] >= -2


# ---------------------------------------------------------------------------
# ansari_bradley
# ---------------------------------------------------------------------------


def test_ansari_bradley_matches_local(spark):
    docs = sorted(((x, d, lg) for d, lg, x in docs_iter()), key=lambda t: t[:2])
    n = len(docs)
    ab = 0
    total = 0
    n_a = 0
    for i, (_x, _d, lg) in enumerate(docs, start=1):
        score = min(i, n + 1 - i)
        total += score
        if lg == _LANG_A:
            ab += score
            n_a += 1
    [r] = q_ansari_bradley(spark, SF).collect()
    assert r["n_a"] == n_a and r["n_b"] == n - n_a
    assert r["ab_stat"] == ab
    assert r["score_total"] == total
    null_mean = _halfup(1_000_000 * n_a * total, n)
    assert r["null_mean_micro"] == null_mean
    assert r["centered_micro"] == 1_000_000 * ab - null_mean


def docs_iter():
    return _docs()


def test_registered_in_catalog():
    for name in (
        "signflip_paired_test",
        "randomization_label_test",
        "jackknife_groups",
        "energy_distance",
        "ansari_bradley",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
