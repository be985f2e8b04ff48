"""Semantics tests for the wave-38 coreset/eval/clustering entries:
greedy submodular coverage, pass@k, split-conformal intervals,
grid-density clustering, and trigram paths.  The DuckDB value-hash
gate is scripts/check_queries.py; these pin each op against an
independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math
import re

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_coreset import (
    _CI_ALPHA,
    _GC_EPS,
    _GC_MINPTS,
    _PK_GOOD,
    _PK_K,
    _SC_K,
    _TP_TOP,
    q_conformal_interval,
    q_grid_cluster_cc,
    q_pass_at_k,
    q_submodular_coverage,
    q_trigram_paths,
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
        .select("doc_id", "text", "n_chars")
        .collect()
    )


def _events(spark):
    return (
        Q._t(spark, SF, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
    )


def _bigrams(text):
    toks = [w for w in (text or "").split(" ") if w != ""]
    return {f"{a} {b}" for a, b in zip(toks, toks[1:])}


# ---------------------------------------------------------------------------
# submodular_coverage
# ---------------------------------------------------------------------------


def test_submodular_coverage_matches_greedy(spark):
    docs = {r["doc_id"]: _bigrams(r["text"]) for r in _docs(spark)}
    covered = set()
    chosen = []
    expect = []
    total = 0
    for rank in range(1, _SC_K + 1):
        best = None
        for d, ws in docs.items():
            if d in chosen:
                continue
            g = len(ws - covered)
            if g == 0:
                continue
            key = (-g, d)
            if best is None or key < best[0]:
                best = (key, d, g)
        if best is None:
            break
        _, d, g = best
        chosen.append(d)
        covered |= docs[d]
        total += g
        expect.append((rank, d, g, total))
    got = [
        (r["rank"], r["doc_id"], r["gain"], r["covered_total"])
        for r in sorted(
            q_submodular_coverage(spark, SF).collect(), key=lambda r: r["rank"]
        )
    ]
    assert got == expect


def test_submodular_gains_are_nonincreasing(spark):
    rows = sorted(q_submodular_coverage(spark, SF).collect(), key=lambda r: r["rank"])
    gains = [r["gain"] for r in rows]
    # submodularity: greedy marginal gains never increase
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    assert rows[-1]["covered_total"] == sum(gains)


# ---------------------------------------------------------------------------
# pass_at_k
# ---------------------------------------------------------------------------


def test_pass_at_k_matches_combinatorics(spark):
    ev = _events(spark)
    per = collections.defaultdict(lambda: [0, 0])
    for r in ev:
        per[r["user_id"]][0] += 1
        per[r["user_id"]][1] += r["event_type"] == _PK_GOOD
    rows = {r["user_id"]: r for r in q_pass_at_k(spark, SF).collect()}
    assert set(rows) == set(per)
    for u, (n, c) in per.items():
        k = min(_PK_K, n)
        r = rows[u]
        assert (r["n"], r["c"], r["k_eff"]) == (n, c, k)
        if c > n - k:
            expect = 1_000_000
        else:
            # reference formula via exact binomials
            p = 1.0 - math.comb(n - c, k) / math.comb(n, k)
            expect = int(math.floor(p * 1e6 + 0.5))
        # the product form and the binomial form agree to 1 micro
        assert abs(r["pass_micro"] - expect) <= 1, (u, n, c)


def test_pass_at_k_monotone_in_c(spark):
    # same n, more correct samples -> pass@k cannot decrease
    by_n = collections.defaultdict(list)
    for r in q_pass_at_k(spark, SF).collect():
        by_n[r["n"]].append((r["c"], r["pass_micro"]))
    for n, pairs in by_n.items():
        pairs.sort()
        for (c1, p1), (c2, p2) in zip(pairs, pairs[1:]):
            if c1 < c2:
                assert p1 <= p2


# ---------------------------------------------------------------------------
# conformal_interval
# ---------------------------------------------------------------------------


def _is_cal(doc_id) -> bool:
    h = hashlib.md5((str(doc_id) + ":conf").encode()).hexdigest()[:4]
    return int(h, 16) % 2 == 0


def test_conformal_interval_matches_naive(spark):
    import numpy as np

    docs = _docs(spark)
    feats = []
    for r in docs:
        toks = [w for w in (r["text"] or "").split(" ") if w != ""]
        feats.append(
            (r["doc_id"], len(toks), len(dict.fromkeys(toks)), r["n_chars"])
        )
    cal = [f for f in feats if _is_cal(f[0])]
    test = [f for f in feats if not _is_cal(f[0])]
    X = np.array([[1.0, x1, x2] for _, x1, x2, _ in cal])
    y = np.array([float(yy) for _, _, _, yy in cal])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]

    def r_micro(f):
        _, x1, x2, yy = f
        return int(
            math.floor(abs(yy - (beta[0] + beta[1] * x1 + beta[2] * x2)) * 1e6 + 0.5)
        )

    cal_r = sorted((r_micro(f), f[0]) for f in cal)
    n_cal = len(cal_r)
    m = min(math.ceil((n_cal + 1) * (1.0 - _CI_ALPHA)), n_cal)
    qhat = cal_r[m - 1][0]
    covered = sum(1 for f in test if r_micro(f) <= qhat)
    row = q_conformal_interval(spark, SF).collect()[0]
    assert row["n_cal"] == n_cal
    assert row["n_test"] == len(test)
    assert row["m_rank"] == m
    # numpy lstsq and the exact Cramer solve may differ in the last
    # micro on residuals at the quantile boundary; the rank value and
    # coverage must still match within that slack
    assert abs(row["qhat_micro"] - qhat) <= 2
    assert abs(row["covered"] - covered) <= 2
    assert row["coverage_micro"] == int(
        math.floor(row["covered"] / row["n_test"] * 1e6 + 0.5)
    )


def test_conformal_coverage_near_nominal(spark):
    # split conformal guarantees >= 1 - alpha coverage in expectation;
    # on a fixed split allow modest slack below nominal
    row = q_conformal_interval(spark, SF).collect()[0]
    assert row["coverage_micro"] >= int((1.0 - _CI_ALPHA) * 1e6) - 100_000


# ---------------------------------------------------------------------------
# grid_cluster_cc
# ---------------------------------------------------------------------------


def test_grid_cluster_matches_naive(spark):
    rows = (
        Q._t(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    )
    cells = {}
    for r in rows:
        e = r["embedding"]
        c = (
            math.floor(float(e[0]) / _GC_EPS),
            math.floor(float(e[1]) / _GC_EPS),
        )
        cells[r["vec_id"]] = c
    cnt = collections.Counter(cells.values())
    core = {c for c, n in cnt.items() if n >= _GC_MINPTS}
    code = {c: (c[0] + 1000) * 100000 + (c[1] + 1000) for c in core}
    # naive CC by BFS
    label = {}
    for c in sorted(core, key=lambda c: code[c]):
        if c in label:
            continue
        comp = [c]
        seen = {c}
        while comp:
            cur = comp.pop()
            label[cur] = None
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cur[0] + dx, cur[1] + dy)
                    if nb in core and nb not in seen:
                        seen.add(nb)
                        comp.append(nb)
        lab = min(code[x] for x in seen)
        for x in seen:
            label[x] = lab
    got = {r["vec_id"]: r for r in q_grid_cluster_cc(spark, SF).collect()}
    assert set(got) == set(cells)
    for v, c in cells.items():
        r = got[v]
        if c in core:
            assert r["is_core"] and r["cluster"] == label[c]
        else:
            nbs = [
                label[(c[0] + dx, c[1] + dy)]
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (c[0] + dx, c[1] + dy) in core
            ]
            assert not r["is_core"]
            assert r["cluster"] == (min(nbs) if nbs else -1)


def test_grid_cluster_has_structure(spark):
    rows = q_grid_cluster_cc(spark, SF).collect()
    clusters = {r["cluster"] for r in rows if r["cluster"] != -1}
    assert len(clusters) >= 1  # the fixture embeddings do cluster
    assert any(r["cluster"] == -1 for r in rows) or all(
        r["cluster"] != -1 for r in rows
    )


# ---------------------------------------------------------------------------
# trigram_paths
# ---------------------------------------------------------------------------


def test_trigram_paths_matches_naive(spark):
    ev = _events(spark)
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1e6), r["event_id"], r["event_type"])
        )
    cnt = collections.Counter()
    for evs in by_user.values():
        evs.sort()
        types = [t for _, _, t in evs]
        for i in range(len(types) - 2):
            cnt[f"{types[i]}->{types[i+1]}->{types[i+2]}"] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_TP_TOP]
    got = [
        (r["trigram"], r["support"])
        for r in q_trigram_paths(spark, SF).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expect


def test_trigram_plan_windows_partitioned_only(spark):
    plan = _plan_of(q_trigram_paths(spark, SF))
    assert "CartesianProduct" not in plan
    # the sequence rank is partitioned by user_id — assert the window
    # spec carries a partition clause
    assert re.search(r"Window.*user_id", plan, re.DOTALL), plan
