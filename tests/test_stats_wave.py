"""Semantics tests for the wave-11 entries: ndcg_eval (retrieval
grading), chi_square_independence / welch_ttest (statistical QA), and
agent_loop_detect (transcript tool-revisit profile).  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op against
an independent single-node recomputation plus the plan shapes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_drift import (
    _CHI2_BUCKET_CAP,
    _CHI2_BUCKET_WIDTH,
    _WELCH_LANG,
    q_chi_square_independence,
    q_welch_ttest,
)
from occular_ocr_spark.queries_evalharness import (
    _NDCG_IDEAL,
    _NDCG_K,
    _NDCG_Q,
    _NDCG_REL_LANG,
    _NDCG_REL_TF,
    _NDCG_W,
    q_ndcg_eval,
)
from occular_ocr_spark.queries_transcript import (
    _ALD_LOOP_GAP,
    _turns,
    q_agent_loop_detect,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ndcg_eval
# ---------------------------------------------------------------------------


def test_ndcg_weight_tables(spark):
    for r in range(1, _NDCG_K + 1):
        assert abs(_NDCG_W[r] - 1e9 / math.log2(r + 1)) <= 0.5
    for m in range(1, _NDCG_K + 1):
        assert _NDCG_IDEAL[m] == sum(_NDCG_W[r] for r in range(1, m + 1))


def test_ndcg_eval_metric_consistency(spark):
    rows = q_ndcg_eval(spark, SF).collect()
    assert len(rows) == _NDCG_Q
    for r in rows:
        assert 0 <= r["n_ret_rel"] <= min(_NDCG_K, r["n_rel"])
        assert abs(r["p_at_k"] - r["n_ret_rel"] / _NDCG_K) <= 5e-7
        if r["n_rel"] == 0:
            assert r["ndcg"] is None and r["recall_at_k"] is None
        else:
            assert 0.0 <= r["ndcg"] <= 1.0
            assert abs(r["recall_at_k"] - r["n_ret_rel"] / r["n_rel"]) <= 5e-7
            # perfect precision at full-K relevance forces ndcg = 1
            if r["n_ret_rel"] == _NDCG_K and r["n_rel"] >= _NDCG_K:
                assert r["ndcg"] == 1.0
    # on real data the ranker makes mistakes: not every query is perfect
    assert any(r["ndcg"] is not None and r["ndcg"] < 1.0 for r in rows)


def test_ndcg_eval_matches_naive_recompute(spark):
    # rebuild one query's grade from raw postings on the driver
    docs = _t(spark, SF, "documents").collect()
    lang = {d["doc_id"]: d["lang"] for d in docs}
    postings = {}
    for d in docs:
        for tok in (d["text"] or "").split(" "):
            if tok:
                postings.setdefault(tok, {}).setdefault(d["doc_id"], 0)
                postings[tok][d["doc_id"]] += 1
    dfs = {t: len(m) for t, m in postings.items()}
    qtok = sorted(dfs, key=lambda t: (-dfs[t], t))[0]
    dl = {}
    for t, m in postings.items():
        for did, tf in m.items():
            dl[did] = dl.get(did, 0) + tf
    avgdl = sum(dl.values()) / len(dl)
    nd = len(dl)
    k1, b = 1.2, 0.75
    idf = math.log(1 + (nd - dfs[qtok] + 0.5) / (dfs[qtok] + 0.5))
    scored = sorted(
        (
            (
                -round(
                    idf
                    * tf
                    * (k1 + 1)
                    / (tf + k1 * (1 - b + b * dl[did] / avgdl)),
                    4,
                ),
                did,
                tf,
            )
            for did, tf in postings[qtok].items()
        )
    )
    topk = scored[:_NDCG_K]
    dcg = sum(
        _NDCG_W[r + 1]
        for r, (_, did, tf) in enumerate(topk)
        if tf >= _NDCG_REL_TF and lang[did] == _NDCG_REL_LANG
    )
    n_rel = sum(
        1
        for did, tf in postings[qtok].items()
        if tf >= _NDCG_REL_TF and lang[did] == _NDCG_REL_LANG
    )
    idcg = _NDCG_IDEAL[min(_NDCG_K, n_rel)] if n_rel else 0
    expect = ((2_000_000 * dcg + idcg) // (2 * idcg)) / 1e6 if idcg else None
    got = {r["tok"]: r for r in q_ndcg_eval(spark, SF).collect()}[qtok]
    assert got["n_rel"] == n_rel
    assert got["ndcg"] == expect


# ---------------------------------------------------------------------------
# chi_square_independence
# ---------------------------------------------------------------------------


def test_chi_square_matches_naive(spark):
    docs = _t(spark, SF, "documents").collect()
    cells = {}
    for d in docs:
        key = (d["lang"], min(d["n_chars"] // _CHI2_BUCKET_WIDTH, _CHI2_BUCKET_CAP))
        cells[key] = cells.get(key, 0) + 1
    langs = sorted({k[0] for k in cells})
    buckets = sorted({k[1] for k in cells})
    n = sum(cells.values())
    rt = {l: sum(v for k, v in cells.items() if k[0] == l) for l in langs}
    ct = {b: sum(v for k, v in cells.items() if k[1] == b) for b in buckets}
    chi2 = sum(
        round(
            ((cells.get((l, b), 0) * n - rt[l] * ct[b]) ** 2)
            / (n * rt[l] * ct[b]),
            6,
        )
        for l in langs
        for b in buckets
    )
    r = q_chi_square_independence(spark, SF).collect()[0]
    assert r["r_levels"] == len(langs) and r["c_levels"] == len(buckets)
    assert r["n_cells"] == len(langs) * len(buckets)
    assert r["dof"] == (len(langs) - 1) * (len(buckets) - 1)
    assert abs(r["chi2"] - chi2) <= 1e-6
    assert r["chi2"] >= 0.0


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------


def test_welch_ttest_matches_naive(spark):
    docs = _t(spark, SF, "documents").collect()
    a = [d["n_chars"] for d in docs if d["lang"] == _WELCH_LANG]
    bb = [d["n_chars"] for d in docs if d["lang"] != _WELCH_LANG]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    va_n, vb_n = var(a) / len(a), var(bb) / len(bb)
    t = (sum(a) / len(a) - sum(bb) / len(bb)) / math.sqrt(va_n + vb_n)
    df = (va_n + vb_n) ** 2 / (
        va_n**2 / (len(a) - 1) + vb_n**2 / (len(bb) - 1)
    )
    r = q_welch_ttest(spark, SF).collect()[0]
    assert r["n_a"] == len(a) and r["n_b"] == len(bb)
    assert abs(r["t_stat"] - t) <= 1e-4
    assert abs(r["welch_df"] - df) <= max(1e-3, df * 1e-6)
    # Welch df is bounded by the two-sample df range
    assert min(len(a), len(bb)) - 1 <= r["welch_df"] <= len(a) + len(bb) - 2


def test_stats_single_pass_plans(spark):
    # both statistics are one partial-agg scan: no more than one
    # Exchange should carry row-scaled data (welch: exactly one scan)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_welch_ttest(spark, SF).explain("formatted")
    p = buf.getvalue()
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", p, flags=re.MULTILINE)) == 1


# ---------------------------------------------------------------------------
# agent_loop_detect
# ---------------------------------------------------------------------------


def test_agent_loop_detect_matches_naive(spark):
    turns = _turns(spark, SF).where(F.col("tool").isNotNull()).collect()
    calls = {}
    for t in turns:
        calls.setdefault((t["conv_id"], t["tool"]), []).append(t["turn_idx"])
    out = {
        (r["conv_id"], r["tool"]): r
        for r in q_agent_loop_detect(spark, SF).collect()
    }
    assert set(out) == set(calls)
    for key, idxs in calls.items():
        idxs.sort()
        r = out[key]
        assert r["n_calls"] == len(idxs)
        assert r["first_turn"] == idxs[0] and r["last_turn"] == idxs[-1]
        if len(idxs) == 1:
            assert r["min_gap"] is None and r["is_loopy"] is False
        else:
            gap = min(b - a for a, b in zip(idxs, idxs[1:]))
            assert r["min_gap"] == gap
            assert r["is_loopy"] == (gap <= _ALD_LOOP_GAP)
    # the fixture synthesis produces both loopy and single-call profiles
    assert any(r["is_loopy"] for r in out.values())
    assert any(not r["is_loopy"] for r in out.values())


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_quantile_normalize_matches_naive(spark):
    from occular_ocr_spark.queries_analytics import q_quantile_normalize

    docs = _t(spark, SF, "documents").collect()
    g = sorted((d["n_chars"], d["doc_id"]) for d in docs)
    n = len(g)
    by_src = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append((d["n_chars"], d["doc_id"]))
    expect = {}
    for src, vals in by_src.items():
        vals.sort()
        ns = len(vals)
        for r, (v, did) in enumerate(vals, start=1):
            k = ((2 * r - 1) * n + 2 * ns - 1) // (2 * ns)
            expect[did] = (src, v, r, k, g[k - 1][0])
    out = {r["doc_id"]: r for r in q_quantile_normalize(spark, SF).collect()}
    assert set(out) == set(expect)
    for did, (src, v, r, k, norm) in expect.items():
        row = out[did]
        assert (
            row["source"],
            row["n_chars"],
            row["src_rank"],
            row["global_rank"],
            row["normalized"],
        ) == (src, v, r, k, norm)


def test_quantile_normalize_monotone_and_bounded(spark):
    from occular_ocr_spark.queries_analytics import q_quantile_normalize

    rows = q_quantile_normalize(spark, SF).collect()
    n = len(rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    gmin = min(r["n_chars"] for r in rows)
    gmax = max(r["n_chars"] for r in rows)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["src_rank"])
        # target ranks strictly increase with source rank, stay in [1, N]
        ks = [r["global_rank"] for r in rs]
        assert all(1 <= k <= n for k in ks)
        assert ks == sorted(ks)
        # normalized values are global values, monotone in source rank
        nv = [r["normalized"] for r in rs]
        assert nv == sorted(nv)
        assert gmin <= nv[0] and nv[-1] <= gmax


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def test_label_propagation_matches_naive(spark):
    from occular_ocr_spark.queries import QUERIES
    from occular_ocr_spark.queries_pipeline import (
        _LP_HIDE_MOD,
        _LP_ROUNDS,
        q_label_propagation,
    )

    docs = {r["doc_id"]: r["lang"] for r in _t(spark, SF, "documents").collect()}
    pairs = QUERIES["dedup_minhash_verify"](spark, SF).collect()
    nbrs = {}
    for p in pairs:
        nbrs.setdefault(p["doc_a"], []).append(p["doc_b"])
        nbrs.setdefault(p["doc_b"], []).append(p["doc_a"])
    lbl = {
        d: (None if d % _LP_HIDE_MOD == 0 else lang) for d, lang in docs.items()
    }
    for _ in range(_LP_ROUNDS):
        votes = {}
        for u, vs in nbrs.items():
            for v in vs:
                if lbl[v] is not None:
                    votes.setdefault(u, {}).setdefault(lbl[v], 0)
                    votes[u][lbl[v]] += 1
        nxt = dict(lbl)
        for u, vv in votes.items():
            if lbl[u] is None:
                nxt[u] = min(vv, key=lambda l: (-vv[l], l))
        lbl = nxt
    out = {r["doc_id"]: r for r in q_label_propagation(spark, SF).collect()}
    hidden = {d for d in docs if d % _LP_HIDE_MOD == 0}
    assert set(out) == hidden
    for d in hidden:
        r = out[d]
        assert r["true_lang"] == docs[d]
        assert r["propagated"] == lbl[d]
        if lbl[d] is None:
            assert r["correct"] is None
        else:
            assert r["correct"] == (lbl[d] == docs[d])
    # propagation does real work on the fixture: some repairs happen,
    # and isolated hidden docs stay NULL
    assert any(r["propagated"] is not None for r in out.values())
    assert any(r["propagated"] is None for r in out.values())


# ---------------------------------------------------------------------------
# k_anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_matches_naive(spark):
    from occular_ocr_spark.queries_curation import (
        _KA_BUCKET_CAP,
        _KA_BUCKET_W,
        _KA_K,
        _KA_L,
        q_k_anonymity,
    )

    docs = _t(spark, SF, "documents").collect()
    groups = {}
    for d in docs:
        key = (d["lang"], min(d["n_chars"] // _KA_BUCKET_W, _KA_BUCKET_CAP))
        groups.setdefault(key, []).append(d["source"])
    out = {(r["lang"], r["len_bucket"]): r for r in q_k_anonymity(spark, SF).collect()}
    assert set(out) == set(groups)
    assert sum(r["n"] for r in out.values()) == len(docs)
    for key, sensitives in groups.items():
        r = out[key]
        assert r["n"] == len(sensitives)
        assert r["n_sensitive"] == len(set(sensitives))
        assert r["k_ok"] == (len(sensitives) >= _KA_K)
        assert r["l_ok"] == (len(set(sensitives)) >= _KA_L)


# ---------------------------------------------------------------------------
# cusum_drift / mann_kendall
# ---------------------------------------------------------------------------


def _daily_micro(spark):
    rows = _t(spark, SF, "events").where(F.col("value").isNotNull()).collect()
    agg = {}
    for r in rows:
        d = r["ts"].date()
        c = math.floor(r["value"] * 100 + 0.5)
        s, n = agg.get(d, (0, 0))
        agg[d] = (s + c, n + 1)
    return {d: (20000 * s + c) // (2 * c) for d, (s, c) in agg.items()}


def test_cusum_matches_sequential_recursion(spark):
    from occular_ocr_spark.queries_drift import _CUSUM_H, q_cusum_drift

    x = _daily_micro(spark)
    days = sorted(x)
    mu = (2 * sum(x.values()) + len(x)) // (2 * len(x))
    sp = sn = 0
    expect = {}
    for d in days:
        dev = x[d] - mu
        sp = max(0, sp + dev)
        sn = max(0, sn - dev)
        expect[d] = (x[d], dev, sp, sn, sp > _CUSUM_H or sn > _CUSUM_H)
    out = {r["day"]: r for r in q_cusum_drift(spark, SF).collect()}
    assert set(out) == set(expect)
    for d, (xv, dev, sp, sn, alarm) in expect.items():
        r = out[d]
        assert (r["x"], r["dev"], r["cusum_pos"], r["cusum_neg"], r["alarm"]) == (
            xv,
            dev,
            sp,
            sn,
            alarm,
        )
    # the chart does real work on the fixture: both alarm states occur
    vals = {r["alarm"] for r in out.values()}
    assert vals == {True, False}


def test_mann_kendall_matches_naive(spark):
    from occular_ocr_spark.queries_drift import q_mann_kendall

    x = _daily_micro(spark)
    days = sorted(x)
    s = sum(
        (x[b] > x[a]) - (x[b] < x[a])
        for i, a in enumerate(days)
        for b in days[i + 1 :]
    )
    n_pairs = len(days) * (len(days) - 1) // 2
    sign = (s > 0) - (s < 0)
    tau = sign * (((2_000_000 * abs(s) + n_pairs) // (2 * n_pairs)) / 1e6)
    r = q_mann_kendall(spark, SF).collect()[0]
    assert r["n_days"] == len(days)
    assert r["s_stat"] == s
    assert r["tau"] == tau
    assert -1.0 <= r["tau"] <= 1.0


# ---------------------------------------------------------------------------
# bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_ci_matches_naive(spark):
    import hashlib

    from occular_ocr_spark.queries_evalharness import (
        _BOOT_B,
        _BOOT_T,
        q_bootstrap_ci,
    )

    docs = [(r["doc_id"], r["n_chars"]) for r in _t(spark, SF, "documents").collect()]

    def mult(doc_id, b):
        u = int(hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()[:4], 16)
        for k, t in enumerate(_BOOT_T):
            if u < t:
                return k
        return 5

    expect = {}
    for b in range(_BOOT_B):
        s = n = 0
        for did, x in docs:
            c = mult(did, b)
            s += c * x
            n += c
        expect[b] = (n, ((2_000_000 * s + n) // (2 * n)) / 1e6)
    out = {r["b"]: r for r in q_bootstrap_ci(spark, SF).collect()}
    assert set(out) == set(expect)
    for b, (n, m) in expect.items():
        assert (out[b]["n_eff"], out[b]["boot_mean"]) == (n, m)
    # the resample is live: effective sizes vary around N, means vary
    # around the true mean but are not all identical
    true_mean = sum(x for _, x in docs) / len(docs)
    n_docs = len(docs)
    for r in out.values():
        assert abs(r["n_eff"] - n_docs) < 4 * n_docs**0.5 + 1
        assert abs(r["boot_mean"] - true_mean) < 0.2 * true_mean
    assert len({r["boot_mean"] for r in out.values()}) > 1


# ---------------------------------------------------------------------------
# incremental_agg
# ---------------------------------------------------------------------------


def test_incremental_agg_equals_full_recompute(spark):
    from occular_ocr_spark.queries_warehouse import (
        _IA_DEL_MOD,
        _IA_DEL_VAL,
        _IA_INS_MOD,
        _IA_INS_VAL,
        q_incremental_agg,
    )

    docs = _t(spark, SF, "documents").collect()
    state = {}
    for d in docs:
        did = d["doc_id"]
        ins = did % _IA_INS_MOD == _IA_INS_VAL
        dele = (not ins) and did % _IA_DEL_MOD == _IA_DEL_VAL
        if ins or not dele:
            n, s = state.get(d["lang"], (0, 0))
            state[d["lang"]] = (n + 1, s + d["n_chars"])
    out = {r["lang"]: r for r in q_incremental_agg(spark, SF).collect()}
    assert set(out) == {k for k, (n, _) in state.items() if n > 0}
    for lang, (n, s) in state.items():
        assert (out[lang]["n_docs"], out[lang]["total_chars"]) == (n, s)
    # the delta is live: some rows were actually inserted and deleted
    assert any(d["doc_id"] % _IA_INS_MOD == _IA_INS_VAL for d in docs)
    assert any(
        d["doc_id"] % _IA_INS_MOD != _IA_INS_VAL
        and d["doc_id"] % _IA_DEL_MOD == _IA_DEL_VAL
        for d in docs
    )


# ---------------------------------------------------------------------------
# mixture_temperature
# ---------------------------------------------------------------------------


def test_mixture_temperature_matches_naive(spark):
    from occular_ocr_spark.queries_pipeline import q_mixture_temperature

    docs = _t(spark, SF, "documents").collect()
    counts = {}
    for d in docs:
        counts[d["lang"]] = counts.get(d["lang"], 0) + 1
    w = {l: math.floor(math.sqrt(n) * 1e6 + 0.5) for l, n in counts.items()}
    total, w_sum, w_min = sum(counts.values()), sum(w.values()), min(w.values())
    out = {r["lang"]: r for r in q_mixture_temperature(spark, SF).collect()}
    assert set(out) == set(counts)
    for l, n in counts.items():
        r = out[l]
        assert r["n_docs"] == n
        assert r["share_raw"] == ((2_000_000 * n + total) // (2 * total)) / 1e6
        assert r["share_temp"] == ((2_000_000 * w[l] + w_sum) // (2 * w_sum)) / 1e6
        assert r["keep_permille"] == (2000 * w_min + w[l]) // (2 * w[l])
    # temperature compresses the mix: the dominant language's share
    # shrinks, the smallest grows, and the smallest is kept whole
    big = max(counts, key=counts.get)
    small = min(counts, key=counts.get)
    assert out[big]["share_temp"] < out[big]["share_raw"]
    assert out[small]["share_temp"] > out[small]["share_raw"]
    assert out[small]["keep_permille"] == 1000
    assert all(0 < r["keep_permille"] <= 1000 for r in out.values())


# ---------------------------------------------------------------------------
# dedup_ttl_window / hard_negative_mining
# ---------------------------------------------------------------------------


def test_dedup_ttl_window_matches_naive(spark):
    from occular_ocr_spark.queries_mining import _TTL_DAYS, q_dedup_ttl_window

    rows = _t(spark, SF, "events").where(F.col("value").isNotNull()).collect()
    keyed = {}
    for r in rows:
        v = math.floor(r["value"] * 100 + 0.5) // 100
        sec = int(r["ts"].timestamp())
        keyed.setdefault((r["user_id"], r["event_type"], v), []).append(
            (sec, r["event_id"])
        )
    expect = {}
    for key, lst in keyed.items():
        lst.sort()
        prev = None
        for sec, eid in lst:
            gap = (sec - prev) // 86400 if prev is not None else None
            expect[eid] = (gap, True if gap is None else gap > _TTL_DAYS)
            prev = sec
    out = {r["event_id"]: r for r in q_dedup_ttl_window(spark, SF).collect()}
    assert set(out) == set(expect)
    for eid, (gap, kept) in expect.items():
        assert (out[eid]["gap_days"], out[eid]["kept"]) == (gap, kept)
    # the TTL is live on the fixture: suppressions actually happen
    assert any(not r["kept"] for r in out.values())
    assert sum(1 for r in out.values() if r["kept"]) > len(out) // 2


def test_hard_negative_mining_ranks_and_labels(spark):
    from occular_ocr_spark.queries_retrieval import (
        _HN_P,
        _HN_Q,
        _HN_REL_LANG,
        _HN_REL_TF,
        q_hard_negative_mining,
    )

    rows = q_hard_negative_mining(spark, SF).collect()
    by_tok = {}
    for r in rows:
        by_tok.setdefault(r["tok"], []).append(r)
    assert 0 < len(by_tok) <= _HN_Q
    lang = {
        d["doc_id"]: d["lang"] for d in _t(spark, SF, "documents").collect()
    }
    docs_text = {
        d["doc_id"]: (d["text"] or "") for d in _t(spark, SF, "documents").collect()
    }
    for tok, rs in by_tok.items():
        rs.sort(key=lambda r: r["r"])
        assert [r["r"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _HN_P
        for r in rs:
            # positives satisfy the label; negatives don't
            pos_tf = docs_text[r["pos_doc"]].split(" ").count(tok)
            neg_tf = docs_text[r["neg_doc"]].split(" ").count(tok)
            assert pos_tf >= _HN_REL_TF and lang[r["pos_doc"]] == _HN_REL_LANG
            assert not (
                neg_tf >= _HN_REL_TF and lang[r["neg_doc"]] == _HN_REL_LANG
            )
        # margins weakly decrease in pos rank direction is NOT guaranteed,
        # but at least one hard case (margin <= 0) should exist somewhere
    assert any(r["margin"] is not None for r in rows)


# ---------------------------------------------------------------------------
# langid_confusion
# ---------------------------------------------------------------------------


def test_langid_confusion_matches_naive(spark):
    from occular_ocr_spark.queries import QUERIES, _LANG_MARKERS
    from occular_ocr_spark.queries_evalharness import q_langid_confusion

    truth = {d["doc_id"]: d["lang"] for d in _t(spark, SF, "documents").collect()}
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in QUERIES["lang_quality"](spark, SF).collect()
    }
    cells = {}
    for did, lang in truth.items():
        key = (lang, pred[did])
        cells[key] = cells.get(key, 0) + 1
    rowtot = {}
    for (lang, _), n in cells.items():
        rowtot[lang] = rowtot.get(lang, 0) + n
    out = {(r["lang"], r["lang_pred"]): r for r in q_langid_confusion(spark, SF).collect()}
    assert set(out) == set(cells)
    for key, n in cells.items():
        r = out[key]
        assert r["n"] == n
        assert r["is_correct"] == (key[0] == key[1])
        rt = rowtot[key[0]]
        assert r["share_of_true"] == ((2_000_000 * n + rt) // (2 * rt)) / 1e6
    assert sum(r["n"] for r in out.values()) == len(truth)
    # the covered languages mostly self-identify; the uncovered ones
    # cannot land on their own label at all
    covered = set(_LANG_MARKERS)
    for lang in {l for l, _ in cells}:
        if lang not in covered:
            assert (lang, lang) not in cells


# ---------------------------------------------------------------------------
# vocab_overlap / wilson_intervals
# ---------------------------------------------------------------------------


def test_vocab_overlap_matches_naive(spark):
    from occular_ocr_spark.queries_drift import q_vocab_overlap

    docs = _t(spark, SF, "documents").collect()
    vocab = {}
    for d in docs:
        vocab.setdefault(d["source"], set()).update(
            t for t in (d["text"] or "").split(" ") if t
        )
    out = {(r["src_a"], r["src_b"]): r for r in q_vocab_overlap(spark, SF).collect()}
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in out
                continue
            r = out[(a, b)]
            union = len(vocab[a] | vocab[b])
            assert r["n_common"] == inter
            assert r["n_types_a"] == len(vocab[a])
            assert r["n_types_b"] == len(vocab[b])
            assert r["jaccard"] == ((2_000_000 * inter + union) // (2 * union)) / 1e6
    # overlap is informative: neither all-zero nor all-one
    js = [r["jaccard"] for r in out.values()]
    assert js and min(js) < 1.0


def test_wilson_intervals_match_naive(spark):
    from occular_ocr_spark.queries_drift import (
        _WIL_PASS_CHARS,
        _WIL_Z,
        q_wilson_intervals,
    )

    docs = _t(spark, SF, "documents").collect()
    agg = {}
    for d in docs:
        n, k = agg.get(d["source"], (0, 0))
        agg[d["source"]] = (n + 1, k + (d["n_chars"] >= _WIL_PASS_CHARS))
    out = {r["source"]: r for r in q_wilson_intervals(spark, SF).collect()}
    assert set(out) == set(agg)
    z2 = _WIL_Z * _WIL_Z
    for src, (n, k) in agg.items():
        p = k / n
        denom = 1 + z2 / n
        cnum = p + z2 / (2 * n)
        hnum = _WIL_Z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        r = out[src]
        assert r["n"] == n and r["k"] == k
        assert abs(r["pass_rate"] - p) <= 5e-7
        assert abs(r["wilson_lo"] - (cnum - hnum) / denom) <= 1e-6
        assert abs(r["wilson_hi"] - (cnum + hnum) / denom) <= 1e-6
        # the interval brackets the point estimate and stays in [0, 1]
        assert 0.0 <= r["wilson_lo"] <= r["pass_rate"] <= r["wilson_hi"] <= 1.0


# ---------------------------------------------------------------------------
# fighting_words
# ---------------------------------------------------------------------------


def test_fighting_words_matches_naive(spark):
    from occular_ocr_spark.queries_drift import (
        _FW_A0,
        _FW_TOPK,
        q_fighting_words,
    )

    docs = _t(spark, SF, "documents").collect()
    ya, yb = {}, {}
    for d in docs:
        tgt = ya if d["doc_id"] % 2 == 0 else yb
        for t in (d["text"] or "").split(" "):
            if t:
                tgt[t] = tgt.get(t, 0) + 1
    vocab = set(ya) | set(yb)
    na, nb = sum(ya.values()), sum(yb.values())
    zs = {}
    for t in vocab:
        a, b = ya.get(t, 0), yb.get(t, 0)
        alpha = _FW_A0 * (a + b) / (na + nb)
        delta = math.log((a + alpha) / (na + _FW_A0 - a - alpha)) - math.log(
            (b + alpha) / (nb + _FW_A0 - b - alpha)
        )
        zs[t] = round(delta / math.sqrt(1 / (a + alpha) + 1 / (b + alpha)), 6)
    top_a = sorted(vocab, key=lambda t: (-zs[t], t))[:_FW_TOPK]
    top_b = sorted(vocab, key=lambda t: (zs[t], t))[:_FW_TOPK]
    out = q_fighting_words(spark, SF).collect()
    got_a = [r["tok"] for r in out if r["side"] == "a"]
    got_b = [r["tok"] for r in out if r["side"] == "b"]
    assert got_a == top_a and got_b == top_b
    for r in out:
        assert abs(r["z"] - zs[r["tok"]]) <= 2e-6
        assert r["y_a"] == ya.get(r["tok"], 0)
        assert r["y_b"] == yb.get(r["tok"], 0)
    # the comparison separates: side-a markers score positive, side-b
    # markers negative (on any corpus where halves differ at all)
    assert max(zs[t] for t in got_a) > 0 > min(zs[t] for t in got_b)


# ---------------------------------------------------------------------------
# token_entropy / zipf_fit
# ---------------------------------------------------------------------------


def _source_tf(spark):
    tf = {}
    for d in _t(spark, SF, "documents").collect():
        m = tf.setdefault(d["source"], {})
        for t in (d["text"] or "").split(" "):
            if t:
                m[t] = m.get(t, 0) + 1
    return tf


def test_token_entropy_matches_naive(spark):
    from occular_ocr_spark.queries_quality import q_token_entropy

    tf = _source_tf(spark)
    out = {r["source"]: r for r in q_token_entropy(spark, SF).collect()}
    assert set(out) == set(tf)
    for src, m in tf.items():
        n = sum(m.values())
        h = math.log(n) - sum(y * math.log(y) for y in m.values()) / n
        hapax = sum(1 for y in m.values() if y == 1)
        r = out[src]
        assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (n, len(m), hapax)
        assert abs(r["entropy_nats"] - h) <= 2e-6
        assert abs(r["entropy_norm"] - h / math.log(len(m))) <= 2e-6
        # entropy bounds: 0 <= H <= ln(V)
        assert 0.0 <= r["entropy_norm"] <= 1.0 + 1e-9


def test_zipf_fit_matches_naive(spark):
    from occular_ocr_spark.queries_quality import _ZIPF_TOPN, q_zipf_fit

    tf = _source_tf(spark)
    out = {r["source"]: r for r in q_zipf_fit(spark, SF).collect()}
    for src, m in tf.items():
        ranked = sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOPN]
        pts = [
            (
                math.floor(math.log(i + 1) * 1e6 + 0.5),
                math.floor(math.log(y) * 1e6 + 0.5),
            )
            for i, (_, y) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        cov = float(n) * float(sxy) - float(sx) * float(sy)
        varx = float(n) * float(sxx) - float(sx) * float(sx)
        vary = float(n) * float(syy) - float(sy) * float(sy)
        r = out[src]
        assert r["n_ranks"] == n
        assert abs(r["zipf_slope"] - cov / varx) <= 2e-6
        assert abs(r["r2"] - cov * cov / (varx * vary)) <= 2e-6
        # a frequency-ranked curve slopes downward and fits decently
        assert r["zipf_slope"] < 0
        assert 0.0 <= r["r2"] <= 1.0
