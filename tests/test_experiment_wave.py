"""Semantics tests for the wave-36 experimentation/classification
entries: Naive Bayes confusion, Burrows' Delta, CUPED adjustment,
windowFunnel, and Good–Turing counts.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math
import re

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_experiment import (
    _BD_TOP,
    _CUPED_VARIANTS,
    _WF_STEPS,
    _WF_WINDOW_D,
    q_burrows_delta,
    q_cuped_adjustment,
    q_good_turing_counts,
    q_naive_bayes_eval,
    q_window_funnel,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.MULTILINE))


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source")
        .collect()
    )


def _events(spark):
    return (
        Q._t(spark, SF, "events")
        .select("user_id", "event_type", "ts", "value")
        .collect()
    )


# ---------------------------------------------------------------------------
# naive_bayes_eval
# ---------------------------------------------------------------------------


def _nb_naive(rows):
    toks_by_doc = {}
    lang_of = {}
    for r in rows:
        toks_by_doc[r["doc_id"]] = [
            w for w in (r["text"] or "").split(" ") if w != ""
        ]
        lang_of[r["doc_id"]] = r["lang"] or ""
    cwl = collections.Counter()
    tok_l = collections.Counter()
    vocab = set()
    for d, ws in toks_by_doc.items():
        for w in ws:
            cwl[(w, lang_of[d])] += 1
            tok_l[lang_of[d]] += 1
            vocab.add(w)
    langs = sorted(tok_l)
    v = len(vocab)
    n = len(rows)
    n_l = collections.Counter(lang_of.values())
    prior = {
        l: int(math.floor(math.log(n_l[l] / n) * 1e6 + 0.5)) for l in langs
    }
    z = {
        l: int(math.floor(math.log(tok_l[l] + v) * 1e6 + 0.5)) for l in langs
    }
    lp = {
        k: int(math.floor(math.log(c + 1) * 1e6 + 0.5)) for k, c in cwl.items()
    }
    conf = collections.Counter()
    for d, ws in toks_by_doc.items():
        if not ws:
            continue  # zero-token docs drop out of scoring on both engines
        best = None
        for l in langs:
            s = prior[l] - len(ws) * z[l]
            s += sum(lp.get((w, l), 0) for w in ws)
            if best is None or (-s, l) < best:
                best = (-s, l)
        conf[(lang_of[d], best[1])] += 1
    return dict(conf)


def test_naive_bayes_eval_matches_naive(spark):
    expect = _nb_naive(_docs(spark))
    got = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in q_naive_bayes_eval(spark, SF).collect()
    }
    assert got == expect


def test_naive_bayes_beats_majority_baseline(spark):
    # resubstitution NB must beat predicting the majority language
    rows = _docs(spark)
    langs = collections.Counter(r["lang"] for r in rows)
    conf = q_naive_bayes_eval(spark, SF).collect()
    correct = sum(r["n"] for r in conf if r["true_lang"] == r["pred_lang"])
    total = sum(r["n"] for r in conf)
    assert correct / total > langs.most_common(1)[0][1] / len(rows)


# ---------------------------------------------------------------------------
# burrows_delta
# ---------------------------------------------------------------------------


def test_burrows_delta_matches_naive(spark):
    rows = _docs(spark)
    tokens = collections.defaultdict(list)
    for r in rows:
        tokens[r["source"] or ""].extend(
            w for w in (r["text"] or "").split(" ") if w != ""
        )
    corpus = collections.Counter()
    for ws in tokens.values():
        corpus.update(ws)
    top = [
        w
        for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_BD_TOP
        ]
    ]
    srcs = sorted(tokens)
    f = {}
    for s in srcs:
        cnt = collections.Counter(tokens[s])
        tot = len(tokens[s])
        for w in top:
            f[(w, s)] = int(math.floor(cnt[w] / tot * 1e6 + 0.5))
    z = {}
    k = len(srcs)
    for w in top:
        vals = [f[(w, s)] for s in srcs]
        sf_, sff = sum(vals), sum(v * v for v in vals)
        mean = int(math.floor(sf_ / k + 0.5))
        std = int(math.floor(math.sqrt(k * sff - sf_ * sf_) / k + 0.5))
        for s in srcs:
            z[(w, s)] = (
                int(math.floor((f[(w, s)] - mean) / std * 1000 + 0.5))
                if std > 0
                else 0
            )
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            diffs = [abs(z[(w, a)] - z[(w, b)]) for w in top]
            expect[(a, b)] = (
                len(top),
                int(math.floor(sum(diffs) / len(top) + 0.5)),
            )
    got = {
        (r["src_a"], r["src_b"]): (r["k"], r["delta_milli"])
        for r in q_burrows_delta(spark, SF).collect()
    }
    assert got == expect


def test_burrows_delta_is_symmetric_nonnegative(spark):
    for r in q_burrows_delta(spark, SF).collect():
        assert r["delta_milli"] >= 0
        assert r["src_a"] < r["src_b"]


# ---------------------------------------------------------------------------
# cuped_adjustment
# ---------------------------------------------------------------------------


def _hash16(uid) -> int:
    h = hashlib.md5((str(uid) + ":cuped").encode()).hexdigest()[:4]
    return int(h, 16)


def test_cuped_adjustment_matches_naive(spark):
    ev = _events(spark)
    t0 = min(r["ts"] for r in ev)
    t1 = max(r["ts"] for r in ev)
    us = lambda t: int(t.timestamp() * 1_000_000)  # naive ts -> epoch µs
    mid2 = us(t0) + us(t1)
    per = collections.defaultdict(lambda: [0, 0])
    for r in ev:
        vm = int(math.floor(r["value"] * 1e6 + 0.5))
        if us(r["ts"]) * 2 <= mid2:
            per[r["user_id"]][0] += vm
        else:
            per[r["user_id"]][1] += vm
    n = len(per)
    sx = sum(p[0] for p in per.values())
    sy = sum(p[1] for p in per.values())
    sxx = sum(p[0] * p[0] for p in per.values())
    sxy = sum(p[0] * p[1] for p in per.values())
    th = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    pre_mean = sx / n
    agg = collections.defaultdict(lambda: [0, 0, 0])  # n, sum_post, sum_adj
    for u, (pre, post) in per.items():
        var = _hash16(u) % _CUPED_VARIANTS
        adj = int(math.floor(post - th * (pre - pre_mean) + 0.5))
        a = agg[var]
        a[0] += 1
        a[1] += post
        a[2] += adj
    rows = {r["variant"]: r for r in q_cuped_adjustment(spark, SF).collect()}
    assert set(rows) == set(agg)
    for var, (nn, sp, sa) in agg.items():
        r = rows[var]
        assert r["n_users"] == nn
        assert r["post_mean_micro"] == int(math.floor(sp / nn + 0.5))
        assert r["adj_mean_micro"] == int(math.floor(sa / nn + 0.5))
        assert r["theta_micro"] == int(math.floor(th * 1e6 + 0.5))


def test_cuped_reduces_cross_user_variance(spark):
    # the whole point of CUPED: adjusted values vary less than raw post
    ev = _events(spark)
    t0 = min(r["ts"] for r in ev)
    t1 = max(r["ts"] for r in ev)
    us = lambda t: int(t.timestamp() * 1_000_000)
    mid2 = us(t0) + us(t1)
    per = collections.defaultdict(lambda: [0, 0])
    for r in ev:
        vm = int(math.floor(r["value"] * 1e6 + 0.5))
        per[r["user_id"]][us(r["ts"]) * 2 > mid2] += vm
    n = len(per)
    sx = sum(p[0] for p in per.values())
    sy = sum(p[1] for p in per.values())
    sxx = sum(p[0] * p[0] for p in per.values())
    sxy = sum(p[0] * p[1] for p in per.values())
    th = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    pre_mean = sx / n
    post = [p[1] for p in per.values()]
    adj = [p[1] - th * (p[0] - pre_mean) for p in per.values()]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    assert var(adj) <= var(post) + 1e-9


# ---------------------------------------------------------------------------
# window_funnel
# ---------------------------------------------------------------------------


def test_window_funnel_matches_naive(spark):
    ev = _events(spark)
    s1, s2, s3 = _WF_STEPS
    win = _WF_WINDOW_D * 86_400_000_000
    us = lambda t: int(t.timestamp() * 1_000_000)
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((us(r["ts"]), r["event_type"]))
    expect = collections.Counter()
    for u, evs in by_user.items():
        evs.sort()
        depth = 0
        for t1, ty in evs:
            if ty != s1:
                continue
            depth = max(depth, 1)
            t2s = [t for t, y in evs if y == s2 and t > t1]
            if not t2s:
                continue
            t2 = min(t2s)
            if t2 <= t1 + win:
                depth = max(depth, 2)
            t3s = [t for t, y in evs if y == s3 and t > t2]
            if t3s and min(t3s) <= t1 + win:
                depth = max(depth, 3)
        expect[depth] += 1
    got = {
        r["depth"]: r["n_users"] for r in q_window_funnel(spark, SF).collect()
    }
    assert got == {k: v for k, v in expect.items() if v}


def test_window_funnel_plan_no_pair_join_blowup(spark):
    plan = _plan_of(q_window_funnel(spark, SF))
    assert "CartesianProduct" not in plan
    # the chained lookup is an equi-join, and windows are partitioned
    assert _n_nodes(plan, "Window") >= 1


# ---------------------------------------------------------------------------
# good_turing_counts
# ---------------------------------------------------------------------------


def test_good_turing_matches_naive(spark):
    cnt = collections.Counter()
    for r in _docs(spark):
        for w in (r["text"] or "").split(" "):
            if w != "":
                cnt[w] += 1
    nr = collections.Counter(cnt.values())
    rows = {r["r"]: r for r in q_good_turing_counts(spark, SF).collect()}
    assert set(rows) == set(nr)
    for r, n_r in nr.items():
        row = rows[r]
        assert row["n_r"] == n_r
        n_r1 = nr.get(r + 1, 0)
        expect = (
            int(math.floor((r + 1) * n_r1 / n_r * 1e6 + 0.5)) if n_r1 else 0
        )
        assert row["r_star_micro"] == expect
    # Good-Turing mass identity: sum over r of N_r * r = corpus tokens
    assert sum(r * n for r, n in nr.items()) == sum(cnt.values())
