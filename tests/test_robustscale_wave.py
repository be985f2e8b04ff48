"""Semantics tests for the wave-64 robust location/scale entries:
Hodges-Lehmann, Qn, Sn, shorth, Gini mean difference.  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op
against brute-force single-node recomputations of the textbook
definitions plus robustness sanity properties."""

from __future__ import annotations

import contextlib
import io
from collections import defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_robustscale import (
    q_gini_mean_diff,
    q_hodges_lehmann,
    q_qn_scale,
    q_shorth_interval,
    q_sn_scale,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _by_lang() -> dict[str, list[tuple[int, int]]]:
    """lang -> [(doc_id, x)] in doc_id order."""
    rows = duckdb.sql(
        f"SELECT lang, doc_id, n_chars FROM '{SF}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    out = defaultdict(list)
    for lang, doc_id, x in rows:
        out[lang].append((doc_id, x))
    return out


def _lowmed(vals: list[int]) -> int:
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


# ---------------------------------------------------------------------------
# hodges_lehmann
# ---------------------------------------------------------------------------


def test_hodges_lehmann_matches_bruteforce(spark):
    got = {r["lang"]: r for r in q_hodges_lehmann(spark, SF).collect()}
    for lang, pairs in _by_lang().items():
        xs = [x for _d, x in pairs]
        walsh = [
            xs[i] + xs[j]
            for i in range(len(xs))
            for j in range(i, len(xs))
        ]
        r = got[lang]
        assert r["n_pairs"] == len(walsh)
        assert r["hl_x2"] == _lowmed(walsh)
        assert r["hl_point"] == _halfup(r["hl_x2"], 2)


def test_hodges_lehmann_between_min_max(spark):
    by = _by_lang()
    for r in q_hodges_lehmann(spark, SF).collect():
        xs = [x for _d, x in by[r["lang"]]]
        assert 2 * min(xs) <= r["hl_x2"] <= 2 * max(xs)


# ---------------------------------------------------------------------------
# qn_scale
# ---------------------------------------------------------------------------


def test_qn_matches_bruteforce(spark):
    got = {r["lang"]: r for r in q_qn_scale(spark, SF).collect()}
    for lang, pairs in _by_lang().items():
        xs = [x for _d, x in pairs]
        n = len(xs)
        gaps = sorted(
            abs(xs[i] - xs[j])
            for i in range(n)
            for j in range(i + 1, n)
        )
        h = n // 2 + 1
        k = h * (h - 1) // 2
        r = got[lang]
        assert r["n_docs"] == n and r["h"] == h and r["k"] == k
        assert r["qn_raw"] == gaps[k - 1]


# ---------------------------------------------------------------------------
# sn_scale
# ---------------------------------------------------------------------------


def test_sn_matches_bruteforce(spark):
    got = {r["lang"]: r for r in q_sn_scale(spark, SF).collect()}
    for lang, pairs in _by_lang().items():
        xs = [x for _d, x in pairs]
        n = len(xs)
        himeds = []
        for i in range(n):
            gaps = sorted(
                abs(xs[i] - xs[j]) for j in range(n) if j != i
            )
            himeds.append(gaps[(n // 2 + 1) - 1])
        r = got[lang]
        assert r["n_docs"] == n
        assert r["sn_raw"] == _lowmed(himeds)


def test_sn_qn_are_scales_not_locations(spark):
    """Shifting every value leaves Qn/Sn invariant — verified on a
    two-lang sample via brute force against the same definitions the
    Spark ops implement (the ops read fixed data, so invariance is
    checked on the local recomputation)."""
    by = _by_lang()
    for lang in list(by)[:2]:
        xs = [x for _d, x in by[lang]]
        n = len(xs)
        for shift in (0, 1000):
            ys = [x + shift for x in xs]
            gaps = sorted(
                abs(ys[i] - ys[j])
                for i in range(n)
                for j in range(i + 1, n)
            )
            h = n // 2 + 1
            same = gaps[h * (h - 1) // 2 - 1]
            if shift == 0:
                base = same
        assert base == same


# ---------------------------------------------------------------------------
# shorth_interval
# ---------------------------------------------------------------------------


def test_shorth_matches_bruteforce(spark):
    got = {r["lang"]: r for r in q_shorth_interval(spark, SF).collect()}
    for lang, pairs in _by_lang().items():
        # sort by (x, doc_id) to mirror the op's tie-break exactly
        xs = [x for x, _d in sorted((x, d) for d, x in pairs)]
        n = len(xs)
        h = n // 2 + 1
        widths = [(xs[i + h - 1] - xs[i], i) for i in range(n - h + 1)]
        w, i = min(widths)
        r = got[lang]
        assert r["n_docs"] == n and r["h"] == h
        assert r["width"] == w
        assert r["lo"] == xs[i] and r["hi"] == xs[i + h - 1]
        assert r["mid_x2"] == xs[i] + xs[i + h - 1]


def test_shorth_contains_at_least_half(spark):
    by = _by_lang()
    for r in q_shorth_interval(spark, SF).collect():
        xs = [x for _d, x in by[r["lang"]]]
        inside = sum(1 for x in xs if r["lo"] <= x <= r["hi"])
        assert inside >= r["h"]


# ---------------------------------------------------------------------------
# gini_mean_diff
# ---------------------------------------------------------------------------


def test_gmd_rank_identity_equals_pairs(spark):
    """The sorted-rank identity must equal the O(n²) definition."""
    got = {r["lang"]: r for r in q_gini_mean_diff(spark, SF).collect()}
    for lang, pairs in _by_lang().items():
        xs = [x for _d, x in pairs]
        n = len(xs)
        s = sum(
            abs(xs[i] - xs[j])
            for i in range(n)
            for j in range(i + 1, n)
        )
        r = got[lang]
        assert r["n_docs"] == n
        assert r["gap_sum"] == s
        assert r["gmd_micro"] == _halfup(2_000_000 * s, n * (n - 1))


def test_gmd_plan_has_no_pair_join(spark):
    plan = _plan_of(q_gini_mean_diff(spark, SF))
    # the rank identity avoids materializing pairs: no join at all
    assert "Join" not in plan
    assert "Window" in plan


def test_registered_in_catalog():
    for name in (
        "hodges_lehmann",
        "qn_scale",
        "sn_scale",
        "shorth_interval",
        "gini_mean_diff",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
