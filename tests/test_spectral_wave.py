"""Semantics tests for the wave-44 spectral/tail entries:
integer-exact periodogram, Hill tail index, negative-binomial grid
fit, 2-level Haar energies, and Church word adaptation.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op
against an independent single-node recomputation plus plan/property
shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_spectral import (
    _HILL_K,
    _PG_MAX,
    _WA_K,
    q_haar_energy,
    q_hill_tail_index,
    q_negbin_fit,
    q_periodogram_power,
    q_word_adaptation,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _daily(spark):
    c = collections.Counter(
        r["ts"].date()
        for r in Q._t(spark, SF, "events").select("ts").collect()
    )
    return [c[d] for d in sorted(c)]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# periodogram_power
# ---------------------------------------------------------------------------


def test_periodogram_matches_local(spark):
    ys = _daily(spark)
    n, s = len(ys), sum(ys)
    powers = {}
    for p in range(2, _PG_MAX + 1):
        sc = sum(
            math.floor(
                (y / s - 1.0 / n) * math.cos(2 * math.pi * i / p) * 1e6
                + 0.5
            )
            for i, y in enumerate(ys)
        )
        ss = sum(
            math.floor(
                (y / s - 1.0 / n) * math.sin(2 * math.pi * i / p) * 1e6
                + 0.5
            )
            for i, y in enumerate(ys)
        )
        powers[p] = sc * sc + ss * ss
    tot = sum(powers.values())
    rows = q_periodogram_power(spark, SF).collect()
    assert [r["period"] for r in rows] == list(range(2, _PG_MAX + 1))
    for r in rows:
        assert r["power_u"] == powers[r["period"]]
        assert r["share"] == (
            (2_000_000 * powers[r["period"]] + tot) // (2 * tot) / 1e6
        )


def test_periodogram_plan(spark):
    plan = _plan_of(q_periodogram_power(spark, SF))
    assert "Generate" in plan  # the 14x period-grid explode
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------


def test_hill_matches_local(spark):
    vals = [
        math.floor(r["value"] * 100 + 0.5)
        for r in Q._t(spark, SF, "events").select("value").collect()
        if r["value"] is not None and math.floor(r["value"] * 100 + 0.5) > 0
    ]
    top = sorted(vals, reverse=True)[: _HILL_K + 1]
    m = len(top)
    xk = top[-1]
    q = sum(math.floor(math.log(c) * 1e6 + 0.5) for c in top)
    hill_sum = q - m * math.floor(math.log(xk) * 1e6 + 0.5)
    alpha = _micro((m - 1) * 1e6 / hill_sum)
    row = q_hill_tail_index(spark, SF).collect()[0]
    assert row["k"] == m - 1
    assert row["xk_cents"] == xk
    assert row["hill_sum_u"] == hill_sum
    assert row["alpha"] == alpha


def test_hill_plausible_and_plan(spark):
    row = q_hill_tail_index(spark, SF).collect()[0]
    assert row["alpha"] > 0.0
    plan = _plan_of(q_hill_tail_index(spark, SF))
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no sort
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# negbin_fit
# ---------------------------------------------------------------------------


def test_negbin_matches_local(spark):
    rows = (
        Q._t(spark, SF, "events")
        .select("user_id", "ts")
        .collect()
    )
    cells = collections.Counter(
        (r["user_id"], r["ts"].date()) for r in rows
    )
    users = {r["user_id"] for r in rows}
    days = {r["ts"].date() for r in rows}
    grid = [
        cells.get((u, d), 0) for u in users for d in days
    ]
    n = len(grid)
    s1, s2 = sum(grid), sum(c * c for c in grid)
    m = s1 / n
    v = (n * s2 - s1 * s1) / (n * (n - 1))
    row = q_negbin_fit(spark, SF).collect()[0]
    assert row["n_cells"] == n == len(users) * len(days)
    assert row["n_events"] == s1
    assert row["mean_count"] == _micro(m)
    assert row["var_count"] == _micro(v)
    assert row["dispersion"] == _micro(v / m)
    if v > m:
        assert row["nb_r"] == _micro(m * m / (v - m))
        assert row["verdict"] == "overdispersed"
    else:
        assert row["nb_r"] == 0.0
        assert row["verdict"] == "poisson-like"
    assert row["nb_p"] == _micro(m / v)


def test_negbin_plan(spark):
    plan = _plan_of(q_negbin_fit(spark, SF))
    assert "PythonUDF" not in plan
    assert plan.count("HashAggregate") >= 2


# ---------------------------------------------------------------------------
# haar_energy
# ---------------------------------------------------------------------------


def test_haar_matches_local(spark):
    ys = _daily(spark)
    n4 = 4 * (len(ys) // 4)
    ys = ys[:n4]
    a1 = [ys[2 * j] + ys[2 * j + 1] for j in range(n4 // 2)]
    d1 = [ys[2 * j] - ys[2 * j + 1] for j in range(n4 // 2)]
    a2 = [a1[2 * j] + a1[2 * j + 1] for j in range(n4 // 4)]
    d2 = [a1[2 * j] - a1[2 * j + 1] for j in range(n4 // 4)]
    e_total = 4 * sum(y * y for y in ys)
    e_d1 = 2 * sum(x * x for x in d1)
    e_d2 = sum(x * x for x in d2)
    e_a2 = sum(x * x for x in a2)
    row = q_haar_energy(spark, SF).collect()[0]
    assert row["n_days_used"] == n4
    assert row["e_total_x4"] == e_total
    assert row["e_d1_x4"] == e_d1
    assert row["e_d2_x4"] == e_d2
    assert row["e_a2_x4"] == e_a2
    assert row["detail_share"] == (
        (2_000_000 * (e_d1 + e_d2) + e_total) // (2 * e_total) / 1e6
    )


def test_haar_parseval_and_plan(spark):
    row = q_haar_energy(spark, SF).collect()[0]
    # exact integer Parseval: 4*sum(y^2) = 2*sum(d1^2)+sum(d2^2)+sum(a2^2)
    assert (
        row["e_total_x4"]
        == row["e_d1_x4"] + row["e_d2_x4"] + row["e_a2_x4"]
    )
    plan = _plan_of(q_haar_energy(spark, SF))
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# word_adaptation
# ---------------------------------------------------------------------------


def test_word_adaptation_matches_local(spark):
    docs = (
        Q._t(spark, SF, "documents").select("doc_id", "text").collect()
    )
    per = collections.defaultdict(lambda: [0, 0, 0])  # cf df df2
    for r in docs:
        c = collections.Counter(
            t for t in (r["text"] or "").split(" ") if t
        )
        for tok, k in c.items():
            s = per[tok]
            s[0] += k
            s[1] += 1
            s[2] += 1 if k >= 2 else 0
    nd = len(docs)
    top = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))[:_WA_K]
    rows = q_word_adaptation(spark, SF).collect()
    assert [(r["tok"], r["cf"]) for r in rows] == [
        (t, s[0]) for t, s in top
    ]
    for r, (tok, (cf, df, df2)) in zip(rows, top):
        assert (r["df"], r["df2"], r["n_docs"]) == (df, df2, nd)
        assert r["p_repeat"] == (2_000_000 * df2 + df) // (2 * df) / 1e6
        want = (
            0.0 if df2 == 0 else _micro((df2 / df) / (df / nd))
        )
        assert r["adaptation"] == want


def test_word_adaptation_plan(spark):
    plan = _plan_of(q_word_adaptation(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave44_registered():
    for name in (
        "periodogram_power",
        "hill_tail_index",
        "negbin_fit",
        "haar_energy",
        "word_adaptation",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
