"""Semantics tests for the wave-50 diagnostics entries: learned-index
audit, Simpson-paradox check, Tukey median polish, Hoeffding bounds,
and the up/down runs test.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_diagnostics import (
    _MP_K,
    _MP_W,
    q_hoeffding_bounds,
    q_learned_index_audit,
    q_median_polish,
    q_simpson_paradox_check,
    q_updown_runs_test,
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
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _lmed(vals):
    vals = sorted(vals)
    return vals[(len(vals) + 1) // 2 - 1]


# ---------------------------------------------------------------------------
# learned_index_audit
# ---------------------------------------------------------------------------


def test_learned_index_matches_local(spark):
    vals = [r["n_chars"] for r in _docs(spark)]
    hist = collections.Counter(vals)
    cum = 0
    pts = []
    for v in sorted(hist):
        cum += hist[v]
        pts.append((v, cum))
    k = len(pts)
    sx = sum(v for v, _ in pts)
    sy = sum(r for _, r in pts)
    sxy = sum(v * r for v, r in pts)
    sxx = sum(v * v for v, _ in pts)
    b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    a = sy / k - b * (sx / k)
    errs = [math.floor(abs(r - (a + b * v)) * 1e6 + 0.5) for v, r in pts]
    row = q_learned_index_audit(spark, SF).collect()[0]
    assert row["n_rows"] == len(vals)
    assert row["n_keys"] == k
    assert row["slope"] == _micro(b)
    assert row["intercept"] == _micro(a)
    assert row["max_err"] == max(errs) / 1e6
    assert row["mean_err"] == math.floor(sum(errs) / k + 0.5) / 1e6


def test_learned_index_learnable(spark):
    row = q_learned_index_audit(spark, SF).collect()[0]
    # near-uniform key distribution: the linear model fits well
    assert row["slope"] > 0
    assert row["max_err"] < row["n_rows"]  # bounded miss
    plan = _plan_of(q_learned_index_audit(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# simpson_paradox_check
# ---------------------------------------------------------------------------


def test_simpson_matches_local(spark):
    per = collections.defaultdict(lambda: [0, 0, 0, 0])  # n1 y1 n0 y0
    for r in _docs(spark):
        s = per[r["source"] or ""]
        y = len(_tokens(r["text"]))
        if r["lang"] == "en":
            s[0] += 1
            s[1] += y
        else:
            s[2] += 1
            s[3] += y
    tn1 = sum(s[0] for s in per.values())
    ty1 = sum(s[1] for s in per.values())
    tn0 = sum(s[2] for s in per.values())
    ty0 = sum(s[3] for s in per.values())
    aq = math.floor((ty1 / tn1 - ty0 / tn0) * 1e6 + 0.5)
    used = flips = mass_used = mass_flip = 0
    for n1, y1, n0, y0 in per.values():
        if n1 > 0 and n0 > 0:
            used += 1
            mass_used += n1 + n0
            gq = math.floor((y1 / n1 - y0 / n0) * 1e6 + 0.5)
            sgn = (gq > 0) - (gq < 0)
            asgn = (aq > 0) - (aq < 0)
            if gq != 0 and sgn != asgn:
                flips += 1
                mass_flip += n1 + n0
    row = q_simpson_paradox_check(spark, SF).collect()[0]
    assert row["n_strata_used"] == used
    assert row["n_flips"] == flips
    assert row["aggregate_gap"] == aq / 1e6
    assert row["flipped_mass_share"] == (
        (2_000_000 * mass_flip + mass_used) // (2 * mass_used) / 1e6
    )
    assert row["paradox_flag"] == (2 * mass_flip > mass_used)


def test_simpson_plan(spark):
    plan = _plan_of(q_simpson_paradox_check(spark, SF))
    assert "BroadcastExchange" in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# median_polish
# ---------------------------------------------------------------------------


def test_median_polish_matches_local(spark):
    cells = collections.defaultdict(list)
    for r in _docs(spark):
        b = min(r["n_chars"] // _MP_W, _MP_K - 1)
        cells[(r["source"] or "", b)].append(len(_tokens(r["text"])))
    grid = {k: _lmed(v) for k, v in cells.items()}
    rows_ = sorted({g for g, _ in grid})
    # sweep 1
    rmed = {
        g: _lmed([y for (gg, _), y in grid.items() if gg == g])
        for g in rows_
    }
    ov = _lmed(list(rmed.values()))
    res = {k: y - rmed[k[0]] for k, y in grid.items()}
    re = {g: rmed[g] - ov for g in rows_}
    cols = sorted({b for _, b in grid})
    cmed = {
        b: _lmed([r for (_, bb), r in res.items() if bb == b])
        for b in cols
    }
    res = {k: r - cmed[k[1]] for k, r in res.items()}
    # sweep 2
    rmed2 = {
        g: _lmed([r for (gg, _), r in res.items() if gg == g])
        for g in rows_
    }
    res = {k: r - rmed2[k[0]] for k, r in res.items()}
    re = {g: re[g] + rmed2[g] for g in rows_}
    cmed2 = {
        b: _lmed([r for (_, bb), r in res.items() if bb == b])
        for b in cols
    }
    res = {k: r - cmed2[k[1]] for k, r in res.items()}
    res_mad = _lmed([abs(r) for r in res.values()])
    got = {
        r["source"]: (
            r["n_cells"],
            r["row_effect"],
            r["overall"],
            r["residual_mad"],
        )
        for r in q_median_polish(spark, SF).collect()
    }
    want = {
        g: (
            sum(1 for (gg, _) in grid if gg == g),
            re[g],
            ov,
            res_mad,
        )
        for g in rows_
    }
    assert got == want


def test_median_polish_plan(spark):
    plan = _plan_of(q_median_polish(spark, SF))
    assert "PythonUDF" not in plan
    assert "Window" in plan  # the bounded median rank windows


# ---------------------------------------------------------------------------
# hoeffding_bounds
# ---------------------------------------------------------------------------


def test_hoeffding_matches_local(spark):
    docs = _docs(spark)
    per = collections.defaultdict(list)
    for r in docs:
        per[r["source"] or ""].append(r["n_chars"])
    allv = [r["n_chars"] for r in docs]
    rng = max(allv) - min(allv)
    grand = sum(allv) / len(allv)
    rows = q_hoeffding_bounds(spark, SF).collect()
    assert [r["source"] for r in rows] == sorted(per)
    for r in rows:
        vs = per[r["source"]]
        mean = sum(vs) / len(vs)
        eps = rng * math.sqrt(math.log(40.0) / (2.0 * len(vs)))
        assert r["n_s"] == len(vs)
        assert r["mean_len"] == _micro(mean)
        assert r["epsilon"] == _micro(eps)
        assert r["excludes_grand"] == (abs(mean - grand) > eps)


def test_hoeffding_plan(spark):
    plan = _plan_of(q_hoeffding_bounds(spark, SF))
    assert "BroadcastExchange" in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# updown_runs_test
# ---------------------------------------------------------------------------


def test_updown_matches_local(spark):
    c = collections.Counter(
        r["ts"].date()
        for r in Q._t(spark, SF, "events").select("ts").collect()
    )
    ys = [c[d] for d in sorted(c)]
    signs = []
    for a, b in zip(ys, ys[1:]):
        if b != a:
            signs.append(1 if b > a else -1)
    m = len(signs)
    runs = sum(
        1 for i, s in enumerate(signs) if i == 0 or signs[i - 1] != s
    )
    n_up = sum(1 for s in signs if s > 0)
    e = (2.0 * (m + 1) - 1.0) / 3.0
    var = (16.0 * (m + 1) - 29.0) / 90.0
    z = 0.0 if m < 2 else _micro((runs - e) / math.sqrt(var))
    row = q_updown_runs_test(spark, SF).collect()[0]
    assert row["n"] == m + 1
    assert row["n_up"] == n_up
    assert row["n_down"] == m - n_up
    assert row["runs"] == runs
    assert row["z"] == z


def test_updown_plan(spark):
    plan = _plan_of(q_updown_runs_test(spark, SF))
    assert "Window" in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave50_registered():
    for name in (
        "learned_index_audit",
        "simpson_paradox_check",
        "median_polish",
        "hoeffding_bounds",
        "updown_runs_test",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
