"""Semantics tests for the wave-33 model-fit & reporting entries: OLS
via exact normal equations, CUBE grouping-sets report, 2-iteration
HITS, source×lang mutual information, and Dunning-G² collocations.
The DuckDB value-hash gate is scripts/check_queries.py; these pin each
op against an independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math
import re

import numpy as np

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_regression import (
    _LLR_MIN_COUNT,
    q_collocations_llr,
    q_grouping_sets_report,
    q_hits_scores,
    q_mutual_information,
    q_ols_fit,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_nodes(plan: str, name: str) -> int:
    # count '(k) Name' detail headers; the tree would double-count
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.MULTILINE))


def _feats(spark):
    rows = (
        Q._t(spark, SF, "documents")
        .select("text", "n_chars", "source", "lang")
        .collect()
    )
    out = []
    for r in rows:
        toks = [w for w in (r["text"] or "").split(" ") if w != ""]
        out.append(
            {
                "x1": len(toks),
                "x2": len(dict.fromkeys(toks)),
                "y": int(r["n_chars"]),
                "source": r["source"],
                "lang": r["lang"],
                "toks": toks,
            }
        )
    return out


# ---------------------------------------------------------------------------
# ols_fit
# ---------------------------------------------------------------------------


def test_ols_fit_matches_numpy_lstsq(spark):
    fe = _feats(spark)
    X = np.array([[1.0, f["x1"], f["x2"]] for f in fe])
    y = np.array([float(f["y"]) for f in fe])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    row = q_ols_fit(spark, SF).collect()[0]
    assert row["n"] == len(fe)
    assert int(row["det"]) != 0
    for i, col in enumerate(["b0", "b1", "b2"]):
        assert abs(row[col] - beta[i]) < 1e-4, (col, row[col], beta[i])
    # the homogeneous form IS the coefficient: det_b_i / det
    for i, col in enumerate(["det_b0", "det_b1", "det_b2"]):
        assert abs(int(row[col]) / int(row["det"]) - beta[i]) < 1e-9


def test_ols_fit_residuals_are_orthogonal(spark):
    # the defining property of OLS: X'(y - X beta) = 0
    fe = _feats(spark)
    row = q_ols_fit(spark, SF).collect()[0]
    b = [int(row[c]) / int(row["det"]) for c in ("det_b0", "det_b1", "det_b2")]
    res = [f["y"] - (b[0] + b[1] * f["x1"] + b[2] * f["x2"]) for f in fe]
    assert abs(sum(res)) < 1e-6 * len(fe)
    assert abs(sum(r * f["x1"] for r, f in zip(res, fe))) < 1e-4 * len(fe)
    assert abs(sum(r * f["x2"] for r, f in zip(res, fe))) < 1e-4 * len(fe)


def test_ols_fit_plan_is_one_scan_no_join(spark):
    plan = _plan_of(q_ols_fit(spark, SF))
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "HashAggregate" in plan


# ---------------------------------------------------------------------------
# grouping_sets_report
# ---------------------------------------------------------------------------


def test_grouping_sets_report_levels(spark):
    fe = _feats(spark)
    rows = q_grouping_sets_report(spark, SF).collect()
    by_grp = collections.defaultdict(list)
    for r in rows:
        by_grp[r["grp_id"]].append(r)
    # grand total: one row, both keys NULL
    assert len(by_grp[3]) == 1
    gt = by_grp[3][0]
    assert gt["source"] is None and gt["lang"] is None
    assert gt["n_docs"] == len(fe)
    assert gt["char_sum"] == sum(f["y"] for f in fe)
    # cells sum to the margins, margins to the total
    cells = {(r["source"], r["lang"]): r["n_docs"] for r in by_grp[0]}
    assert sum(cells.values()) == len(fe)
    for r in by_grp[2]:  # source rolled up -> per-lang margin
        assert r["source"] is None
        assert r["n_docs"] == sum(
            v for (s, l), v in cells.items() if l == r["lang"]
        )
    for r in by_grp[1]:  # lang rolled up -> per-source margin
        assert r["lang"] is None
        assert r["n_docs"] == sum(
            v for (s, l), v in cells.items() if s == r["source"]
        )
    # exact cell counts
    expect = collections.Counter((f["source"], f["lang"]) for f in fe)
    assert cells == dict(expect)


def test_grouping_sets_plan_single_scan_expand(spark):
    plan = _plan_of(q_grouping_sets_report(spark, SF))
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "Expand" in plan, plan  # cube expands map-side
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# hits_scores
# ---------------------------------------------------------------------------


def test_hits_scores_matches_naive(spark):
    ev = Q._t(spark, SF, "events").select("user_id", "event_type").collect()
    w = collections.Counter((r["user_id"], r["event_type"]) for r in ev)
    users = sorted({u for u, _ in w})
    types = sorted({t for _, t in w})
    h = {u: np.float32(1.0) for u in users}
    a = {}
    for _ in range(2):
        raw_a = {
            t: sum(float(w[(u, t)]) * float(h[u]) for u in users if (u, t) in w)
            for t in types
        }
        tot = sum(raw_a.values())
        a = {t: np.float32(v / tot) for t, v in raw_a.items()}
        raw_h = {
            u: sum(float(w[(u, t)]) * float(a[t]) for t in types if (u, t) in w)
            for u in users
        }
        tot = sum(raw_h.values())
        h = {u: np.float32(v / tot) for u, v in raw_h.items()}
    got = {(r["side"], r["node"]): r["score"] for r in q_hits_scores(spark, SF).collect()}
    assert len(got) == len(users) + len(types)
    for u in users:
        assert abs(got[("hub", str(u))] - float(h[u])) < 1e-6
    for t in types:
        assert abs(got[("authority", t)] - float(a[t])) < 1e-6
    # L1 normalization holds on each side
    assert abs(sum(v for (s, _), v in got.items() if s == "hub") - 1.0) < 1e-4
    assert abs(sum(v for (s, _), v in got.items() if s == "authority") - 1.0) < 1e-4


def test_hits_plan_broadcasts_authority_side(spark):
    plan = _plan_of(q_hits_scores(spark, SF))
    # the tiny authority table must ride broadcast joins back to edges,
    # and the persisted edge table means ONE events scan total
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "InMemoryTableScan" in plan, plan


# ---------------------------------------------------------------------------
# mutual_information
# ---------------------------------------------------------------------------


def test_mutual_information_matches_naive(spark):
    fe = _feats(spark)
    n = len(fe)
    cells = collections.Counter((f["source"], f["lang"]) for f in fe)
    mx = collections.Counter(f["source"] for f in fe)
    my = collections.Counter(f["lang"] for f in fe)
    expect = {}
    for (s, l), nxy in cells.items():
        term = nxy / n * math.log2(n * nxy / (mx[s] * my[l]))
        q = math.floor(term * 1e6 + 0.5)
        expect[(s, l)] = (nxy, mx[s], my[l], int(q))
    rows = q_mutual_information(spark, SF).collect()
    assert len(rows) == len(expect)
    total = sum(v[3] for v in expect.values())
    for r in rows:
        nxy, nx, ny, q = expect[(r["source"], r["lang"])]
        assert (r["n_xy"], r["n_x"], r["n_y"], r["mi_term_micro"]) == (
            nxy,
            nx,
            ny,
            q,
        )
        assert r["mi_total_micro"] == total
    # MI is non-negative (up to quantization of the cell terms)
    assert total >= -len(expect)


def test_mutual_information_single_corpus_scan_is_reused(spark):
    # marginals re-aggregate from the PERSISTED cell table: exactly one
    # parquet scan; no corpus-wide window or cartesian anywhere
    plan = _plan_of(q_mutual_information(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "InMemoryTableScan" in plan, plan


# ---------------------------------------------------------------------------
# collocations_llr
# ---------------------------------------------------------------------------


def test_collocations_llr_matches_naive(spark):
    fe = _feats(spark)
    big = collections.Counter()
    for f in fe:
        toks = f["toks"]
        for i in range(len(toks) - 1):
            big[(toks[i], toks[i + 1])] += 1
    cx = collections.Counter()
    cy = collections.Counter()
    for (w1, w2), c in big.items():
        cx[w1] += c
        cy[w2] += c
    nb = sum(big.values())

    def term(o, e):
        return o * math.log(o / e) if o > 0 else 0.0

    expect = {}
    for (w1, w2), c in big.items():
        if c < _LLR_MIN_COUNT:
            continue
        o11, o12 = float(c), float(cx[w1] - c)
        o21 = float(cy[w2] - c)
        o22 = float(nb - cx[w1] - cy[w2] + c)
        r1, r2 = float(cx[w1]), float(nb - cx[w1])
        k1, k2 = float(cy[w2]), float(nb - cy[w2])
        g2 = 2.0 * (
            term(o11, r1 * k1 / nb)
            + term(o12, r1 * k2 / nb)
            + term(o21, r2 * k1 / nb)
            + term(o22, r2 * k2 / nb)
        )
        expect[(w1, w2)] = (c, cx[w1], cy[w2], round(g2, 4) + 0.0)
    rows = q_collocations_llr(spark, SF).collect()
    got = {
        (r["w1"], r["w2"]): (r["c_xy"], r["c_x"], r["c_y"], r["llr"])
        for r in rows
    }
    assert got.keys() == expect.keys()
    for k, (c, a, b, g2) in expect.items():
        gc, ga, gb, gg = got[k]
        assert (gc, ga, gb) == (c, a, b)
        assert abs(gg - g2) < 2e-4, (k, gg, g2)
    # G² of a significant collocation is non-negative
    assert all(v[3] >= 0 or abs(v[3]) < 1e-9 for v in got.values())


def test_collocations_plan_one_scan_no_window(spark):
    plan = _plan_of(q_collocations_llr(spark, SF))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    # the in-array bigram build is an explode (Generate) feeding ONE
    # parquet scan; margins and total reuse the persisted bigram table
    # (InMemoryTableScan), not three more corpus passes
    assert _n_nodes(plan, "Generate") >= 1, plan
    assert _n_nodes(plan, "Scan parquet") == 1, plan
    assert "InMemoryTableScan" in plan, plan
