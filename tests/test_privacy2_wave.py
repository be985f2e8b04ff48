"""Semantics tests for the wave-52 release-audit entries: Yule's K
panel, Cochran's Q, entropy l-diversity, t-closeness, and the
Horvitz-Thompson estimator.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_privacy2 import (
    _EL_BUCKET_CAP,
    _EL_BUCKET_W,
    _HT_A,
    _HT_M,
    q_cochran_q,
    q_entropy_ldiversity,
    q_horvitz_thompson,
    q_t_closeness,
    q_yule_k,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


# ---------------------------------------------------------------------------
# yule_k
# ---------------------------------------------------------------------------


def test_yule_k_matches_local(spark):
    freq = collections.defaultdict(collections.Counter)
    for r in _docs(spark):
        freq[r["source"] or ""].update(_tokens(r["text"]))
    rows = {r["source"]: r for r in q_yule_k(spark, SF).collect()}
    assert sorted(rows) == sorted(freq)
    for g, cnt in freq.items():
        n = sum(cnt.values())
        v = len(cnt)
        spec = collections.Counter(cnt.values())
        m2v = sum(m * m * vm for m, vm in spec.items())
        row = rows[g]
        assert row["n_tok"] == n and row["vocab"] == v
        assert row["yule_k"] == _micro(1e4 * (m2v - n) / (float(n) * n))
        assert row["sichel_s"] == _micro(spec.get(2, 0) / v)
        v1 = spec.get(1, 0)
        exp_r = (
            0.0
            if v1 == v
            else _micro(100.0 * math.log(n) / (1.0 - v1 / v))
        )
        assert row["honore_r"] == exp_r


def test_yule_k_single_scan(spark):
    plan = _plan_of(q_yule_k(spark, SF))
    assert plan.count("documents.parquet") == 1


# ---------------------------------------------------------------------------
# cochran_q
# ---------------------------------------------------------------------------


def test_cochran_q_matches_local(spark):
    rows = (
        Q._t(spark, SF, "events").select("user_id", "event_type").collect()
    )
    ut = {(r["user_id"], r["event_type"]) for r in rows}
    users = {u for u, _ in ut}
    types = sorted({t for _, t in ut})
    k = len(types)
    ri = collections.Counter(u for u, _ in ut)
    cj = collections.Counter(t for _, t in ut)
    n = len(ut)
    sr, sr2 = sum(ri.values()), sum(x * x for x in ri.values())
    sc2 = sum(x * x for x in cj.values())
    row = q_cochran_q(spark, SF).collect()[0]
    assert row["n_users"] == len(users)
    assert row["k"] == k and row["df"] == k - 1
    exp = (
        0.0
        if k * sr - sr2 <= 0
        else _micro((k - 1.0) * (k * sc2 - n * n) / (k * sr - sr2))
    )
    assert row["q_stat"] == exp
    assert row["q_stat"] >= 0.0


def test_cochran_q_reduces_to_mcnemar_shape():
    # identity check: with k=2 and the 2x2 table (b, c) discordant,
    # Q = (b - c)^2 / (b + c) — McNemar without continuity correction
    b, c, n11 = 7, 3, 5
    # rows: n11 users with both (ri=2), b with only A, c with only B
    ri = [2] * n11 + [1] * (b + c)
    ca = n11 + b
    cb = n11 + c
    k = 2
    n = sum(ri)
    sr, sr2 = n, sum(x * x for x in ri)
    sc2 = ca * ca + cb * cb
    q = (k - 1.0) * (k * sc2 - n * n) / (k * sr - sr2)
    assert abs(q - (b - c) ** 2 / (b + c)) < 1e-9


# ---------------------------------------------------------------------------
# entropy_ldiversity
# ---------------------------------------------------------------------------


def test_entropy_ldiversity_matches_local(spark):
    groups = collections.defaultdict(collections.Counter)
    for r in _docs(spark):
        lb = min(r["n_chars"] // _EL_BUCKET_W, _EL_BUCKET_CAP)
        groups[(r["lang"], lb)][r["source"]] += 1
    rows = {
        (r["lang"], r["len_bucket"]): r
        for r in q_entropy_ldiversity(spark, SF).collect()
    }
    assert sorted(rows) == sorted(groups)
    for key, cnt in groups.items():
        n = sum(cnt.values())
        sum_h = sum(
            math.floor(-(c / n) * math.log(c / n) * 1e6 + 0.5)
            for c in cnt.values()
        )
        row = rows[key]
        assert row["n"] == n
        assert row["h_entropy"] == sum_h / 1e6
        eff = _micro(math.exp(sum_h / 1e6))
        assert row["eff_l"] == eff
        assert row["l_ok"] == (eff >= 2.0)
        # effective l never exceeds the distinct count (up to the
        # half-up micro-quantization of the per-value entropy terms)
        assert row["eff_l"] <= len(cnt) * (1 + 1e-4)


# ---------------------------------------------------------------------------
# t_closeness
# ---------------------------------------------------------------------------


def test_t_closeness_matches_local(spark):
    docs = _docs(spark)
    langs = sorted({r["lang"] or "" for r in docs})
    glob = collections.Counter((r["lang"] or "") for r in docs)
    n = len(docs)
    k = len(langs)
    per = collections.defaultdict(collections.Counter)
    for r in docs:
        per[r["source"] or ""][r["lang"] or ""] += 1
    rows = {r["source"]: r for r in q_t_closeness(spark, SF).collect()}
    assert sorted(rows) == sorted(per)
    for g, cnt in per.items():
        n_g = sum(cnt.values())
        cum = 0
        semd = 0
        for lang in langs:
            cum += cnt.get(lang, 0) * n - glob[lang] * n_g
            semd += abs(cum)
        exp = _micro(semd / n / n_g / (k - 1))
        assert rows[g]["n_g"] == n_g
        assert rows[g]["t_close"] == exp
        assert 0.0 <= rows[g]["t_close"] <= 1.0 + 1e-6


def test_t_closeness_identical_distribution_is_zero(spark):
    # a source whose lang distribution equals the corpus has t = 0;
    # replay the formula on a synthetic uniform case
    langs = ["a", "b"]
    glob = {"a": 10, "b": 10}
    cnt = {"a": 5, "b": 5}
    n, n_g = 20, 10
    cum = semd = 0
    for lang in langs:
        cum += cnt[lang] * n - glob[lang] * n_g
        semd += abs(cum)
    assert semd == 0


# ---------------------------------------------------------------------------
# horvitz_thompson
# ---------------------------------------------------------------------------


def test_horvitz_thompson_matches_local(spark):
    per = collections.defaultdict(
        lambda: {"n": 0, "ns": 0, "est": 0, "tru": 0}
    )
    for r in _docs(spark):
        g = r["source"] or ""
        tok = len(_tokens(r["text"]))
        u = (r["doc_id"] * _HT_A) % _HT_M
        if len(g) % 2 == 0:
            w = 5 if u % 10 < 2 else 0
        else:
            w = 2 if u % 10 < 5 else 0
        st = per[g]
        st["n"] += 1
        st["tru"] += tok
        if w:
            st["ns"] += 1
            st["est"] += w * tok
    rows = {r["source"]: r for r in q_horvitz_thompson(spark, SF).collect()}
    assert sorted(rows) == sorted(per)
    for g, st in per.items():
        row = rows[g]
        assert row["n_docs"] == st["n"]
        assert row["n_sampled"] == st["ns"]
        assert row["ht_weight"] == (5 if len(g) % 2 == 0 else 2)
        assert row["est_tokens"] == st["est"]
        assert row["true_tokens"] == st["tru"]
        exp = (
            0.0
            if st["tru"] == 0
            else _micro((st["est"] - st["tru"]) / st["tru"])
        )
        assert row["rel_err"] == exp


def test_horvitz_thompson_sample_never_materializes(spark):
    plan = _plan_of(q_horvitz_thompson(spark, SF))
    assert plan.count("documents.parquet") == 1
    # inclusion + weighting fold into the map side before the agg
    assert "partial_sum" in plan
