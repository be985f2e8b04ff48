"""Semantics tests for the wave-41 nonparametric/vocabulary entries:
Mann–Whitney U rank-sum, Heaps'-law vocabulary-growth fit, Markov
entropy rate, suffix-stripping vocabulary compaction, and the
Wald–Wolfowitz runs test.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan/property shapes."""

from __future__ import annotations

import collections
import contextlib
import io
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_nonparam import (
    _HL_B,
    q_heaps_law,
    q_mannwhitney_u,
    q_markov_entropy_rate,
    q_runs_test,
    q_stem_vocab_reduction,
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
        .select("doc_id", "text", "lang", "n_chars")
        .collect()
    )


def _events(spark):
    return (
        Q._t(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )


def _tokens(text):
    return [t for t in (text or "").split(" ") if t]


def _micro(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# mannwhitney_u
# ---------------------------------------------------------------------------


def test_mannwhitney_matches_local(spark):
    docs = _docs(spark)
    vals = sorted(r["n_chars"] for r in docs)
    # midrank of each value = (#smaller) + (ties+1)/2
    cnt = collections.Counter(vals)
    c, rank2 = 0, {}
    for v in sorted(cnt):
        rank2[v] = 2 * c + cnt[v] + 1  # twice the midrank
        c += cnt[v]
    en = [r["n_chars"] for r in docs if r["lang"] == "en"]
    n1, n = len(en), len(docs)
    n2 = n - n1
    r1x2 = sum(rank2[v] for v in en)
    ties3 = sum(t * t * t - t for t in cnt.values())
    u1 = (r1x2 - n1 * (n1 + 1)) / 2.0
    auc = _micro((r1x2 - n1 * (n1 + 1)) / (2.0 * max(n1 * n2, 1)))
    var = n1 * n2 * (n**3 - n - ties3) / (12.0 * n * (n - 1))
    z = _micro((u1 - n1 * n2 / 2.0) / math.sqrt(var))
    row = q_mannwhitney_u(spark, SF).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u1"] == u1
    assert row["auc"] == auc
    assert row["z"] == z


def test_mannwhitney_u_symmetry_and_plan(spark):
    # U1 + U2 = n1*n2 by construction of the rank sum
    row = q_mannwhitney_u(spark, SF).collect()[0]
    assert 0 <= row["u1"] <= row["n1"] * row["n2"]
    assert 0.0 <= row["auc"] <= 1.0
    plan = _plan_of(q_mannwhitney_u(spark, SF))
    assert plan.count("HashAggregate") >= 2  # histogram + final both partial
    assert "Window" in plan  # cumulative rank over the value histogram
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# heaps_law
# ---------------------------------------------------------------------------


def test_heaps_law_matches_local(spark):
    docs = _docs(spark)
    mn = min(r["doc_id"] for r in docs)
    mx = max(r["doc_id"] for r in docs)
    nb = collections.Counter()
    first = {}
    for r in docs:
        b = (r["doc_id"] - mn) * _HL_B // (mx - mn + 1)
        toks = _tokens(r["text"])
        for a, c in zip(toks, toks[1:]):
            bg = a + " " + c
            nb[b] += 1
            if bg not in first or b < first[bg]:
                first[bg] = b
    vb = collections.Counter(first.values())
    ncum = vcum = 0
    xs, ys = [], []
    for b in range(_HL_B):
        ncum += nb.get(b, 0)
        vcum += vb.get(b, 0)
        xs.append(math.floor(math.log(max(ncum, 1)) * 1e6 + 0.5))
        ys.append(math.floor(math.log(max(vcum, 1)) * 1e6 + 0.5))
    bn = _HL_B
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    dx, dy = bn * sxx - sx * sx, bn * syy - sy * sy
    if dx == 0 or dy == 0:
        beta = lnk = r2 = 0.0
    else:
        slope = (bn * sxy - sx * sy) / dx
        beta = _micro(slope)
        lnk = _micro(sy / bn / 1e6 - slope * (sx / bn / 1e6))
        r2 = _micro((bn * sxy - sx * sy) ** 2 / (dx * dy))
    row = q_heaps_law(spark, SF).collect()[0]
    assert row["n_buckets"] == bn
    assert row["n_tokens"] == ncum
    assert row["n_types"] == vcum == len(first)
    assert row["beta"] == beta
    assert row["lnk"] == lnk
    assert row["r2"] == r2


def test_heaps_law_beta_plausible_and_plan(spark):
    row = q_heaps_law(spark, SF).collect()[0]
    # sub-linear vocabulary growth on natural-ish text
    assert 0.0 < row["beta"] < 1.0
    assert 0.0 <= row["r2"] <= 1.0
    plan = _plan_of(q_heaps_law(spark, SF))
    assert "PythonUDF" not in plan
    assert "BroadcastExchange" in plan  # the 1-row min/max bounds


# ---------------------------------------------------------------------------
# markov_entropy_rate
# ---------------------------------------------------------------------------


def test_markov_entropy_matches_local(spark):
    by_user = collections.defaultdict(list)
    for r in _events(spark):
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    cells = collections.Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cells[(a, b)] += 1
    nt = sum(cells.values())
    q1 = sum(
        math.floor(n * math.log(n) * 1e6 + 0.5) for n in cells.values()
    )
    rows_ = collections.Counter()
    for (a, _), n in cells.items():
        rows_[a] += n
    q2 = sum(
        math.floor(n * math.log(n) * 1e6 + 0.5) for n in rows_.values()
    )
    h = math.floor((q2 - q1) / nt + 0.5) / 1e6
    hn = (
        0.0
        if len(rows_) <= 1
        else math.floor((q2 - q1) / nt / math.log(len(rows_)) + 0.5) / 1e6
    )
    row = q_markov_entropy_rate(spark, SF).collect()[0]
    assert row["n_transitions"] == nt
    assert row["n_states"] == len(rows_)
    assert row["n_cells"] == len(cells)
    assert row["entropy_rate"] == h
    assert row["entropy_norm"] == hn


def test_markov_entropy_bounds_and_plan(spark):
    row = q_markov_entropy_rate(spark, SF).collect()[0]
    assert 0.0 <= row["entropy_norm"] <= 1.0 + 1e-6
    assert row["n_cells"] <= row["n_states"] ** 2
    plan = _plan_of(q_markov_entropy_rate(spark, SF))
    assert "Window" in plan  # the user-partitioned lead()
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# stem_vocab_reduction
# ---------------------------------------------------------------------------


def _stem(tok: str) -> str:
    if tok.endswith("sses"):
        return tok[:-2]
    if tok.endswith("ies"):
        return tok[:-2]
    if tok.endswith("ss"):
        return tok
    if tok.endswith("s") and len(tok) > 3:
        return tok[:-1]
    return tok


def test_stem_vocab_matches_local(spark):
    tf = collections.Counter()
    for r in _docs(spark):
        tf.update(_tokens(r["text"]))
    stems = {_stem(t) for t in tf}
    altered = sum(y for t, y in tf.items() if _stem(t) != t)
    n_tokens, n_types = sum(tf.values()), len(tf)
    row = q_stem_vocab_reduction(spark, SF).collect()[0]
    assert row["n_tokens"] == n_tokens
    assert row["n_types"] == n_types
    assert row["n_stems"] == len(stems)
    assert row["n_tokens_altered"] == altered
    assert row["types_reduction"] == (
        (2_000_000 * (n_types - len(stems)) + n_types) // (2 * n_types)
        / 1e6
    )
    assert row["altered_share"] == (
        (2_000_000 * altered + n_tokens) // (2 * n_tokens) / 1e6
    )


def test_stem_vocab_invariants_and_plan(spark):
    row = q_stem_vocab_reduction(spark, SF).collect()[0]
    assert row["n_stems"] <= row["n_types"]
    assert row["n_tokens_altered"] <= row["n_tokens"]
    plan = _plan_of(q_stem_vocab_reduction(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# runs_test
# ---------------------------------------------------------------------------


def _daily(spark):
    c = collections.Counter(
        r["ts"].date() for r in Q._t(spark, SF, "events").select("ts").collect()
    )
    return c


def test_runs_test_matches_local(spark):
    c = _daily(spark)
    ordered = sorted(c.items(), key=lambda kv: (kv[1], kv[0]))
    nd = len(ordered)
    m = ordered[(nd + 1) // 2 - 1][1]  # lower median by (y, d) rank
    signs = [
        1 if y > m else 0 for _, y in sorted(c.items()) if y != m
    ]
    n_used = len(signs)
    n_above = sum(signs)
    n_below = n_used - n_above
    runs = sum(
        1
        for i, s in enumerate(signs)
        if i == 0 or signs[i - 1] != s
    )
    if n_above == 0 or n_above == n_used or n_used < 3:
        z = 0.0
    else:
        e = 2.0 * n_above * n_below / n_used + 1.0
        var = (
            2.0
            * n_above
            * n_below
            * (2.0 * n_above * n_below - n_used)
            / (float(n_used) * n_used * (n_used - 1))
        )
        z = _micro((runs - e) / math.sqrt(var))
    row = q_runs_test(spark, SF).collect()[0]
    assert row["n_used"] == n_used
    assert row["n_above"] == n_above
    assert row["n_below"] == n_below
    assert row["runs"] == runs
    assert row["z"] == z


def test_runs_test_bounds_and_plan(spark):
    row = q_runs_test(spark, SF).collect()[0]
    assert 1 <= row["runs"] <= row["n_used"]
    plan = _plan_of(q_runs_test(spark, SF))
    assert "Window" in plan  # median rank + lag over the #days frame
    assert "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def test_wave41_registered():
    for name in (
        "mannwhitney_u",
        "heaps_law",
        "markov_entropy_rate",
        "stem_vocab_reduction",
        "runs_test",
    ):
        assert name in Q.QUERIES
        assert name in Q.ORACLES
