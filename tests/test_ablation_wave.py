"""Semantics tests for the wave-78 leave-one-out ablation entries:
moments, median shift, quality rate, lang-mix L1, block pair load.
The DuckDB value-hash gate is scripts/check_queries.py; these pin each
op against pure-Python recomputations plus the LOO identities (the
per-source results must reconstruct the global statistic) and one
plan assertion (partial agg + bounded window, no corpus-sized
window)."""

from __future__ import annotations

import contextlib
import io
from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_ablation import (
    _BLK_W,
    _QG_HI,
    _QG_LO,
    _QG_XLANG,
    q_loo_block_pair_load,
    q_loo_lang_mix_l1,
    q_loo_median_shift,
    q_loo_quality_rate,
    q_loo_source_moments,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _docs():
    return duckdb.sql(
        f"SELECT source, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_loo_moments_match_local(spark):
    rows = _docs()
    n_all = len(rows)
    s1_all = sum(c for _s, _l, c in rows)
    got = {r["source"]: r for r in q_loo_source_moments(spark, SF).collect()}
    sources = {s for s, _l, _c in rows}
    assert set(got) == sources
    for src in sources:
        rest = [c for s, _l, c in rows if s != src]
        n, s1 = len(rest), sum(rest)
        s2 = sum(c * c for c in rest)
        r = got[src]
        assert r["n_excl"] == n
        assert r["mean_excl_micro"] == _halfup(1_000_000 * s1, n)
        want_var = int(((n * s2 - s1 * s1) / (n * n)) * 1e6 + 0.5)
        assert r["var_excl_micro"] == want_var
        assert r["mean_global_micro"] == _halfup(1_000_000 * s1_all, n_all)
        assert (
            r["mean_shift_micro"]
            == r["mean_excl_micro"] - r["mean_global_micro"]
        )


def test_loo_median_matches_local(spark):
    rows = _docs()
    vals = sorted(c for _s, _l, c in rows)
    gmed = vals[(len(vals) + 1) // 2 - 1]
    got = {r["source"]: r for r in q_loo_median_shift(spark, SF).collect()}
    for src in {s for s, _l, _c in rows}:
        rest = sorted(c for s, _l, c in rows if s != src)
        want = rest[(len(rest) + 1) // 2 - 1]
        r = got[src]
        assert r["n_excl"] == len(rest)
        assert r["loo_median"] == want
        assert r["global_median"] == gmed
        assert r["median_shift"] == want - gmed


def test_loo_quality_rate_matches_local(spark):
    rows = _docs()

    def ok(lang, c):
        return _QG_LO <= c <= _QG_HI and lang != _QG_XLANG

    n_all = len(rows)
    p_all = sum(1 for _s, l, c in rows if ok(l, c))
    got = {r["source"]: r for r in q_loo_quality_rate(spark, SF).collect()}
    for src in {s for s, _l, _c in rows}:
        rest = [(l, c) for s, l, c in rows if s != src]
        p = sum(1 for l, c in rest if ok(l, c))
        r = got[src]
        assert r["n_excl"] == len(rest) and r["pass_excl"] == p
        assert r["rate_excl_micro"] == _halfup(1_000_000 * p, len(rest))
        assert r["rate_global_micro"] == _halfup(1_000_000 * p_all, n_all)
        assert (
            r["rate_delta_micro"]
            == r["rate_excl_micro"] - r["rate_global_micro"]
        )


def test_loo_lang_mix_matches_local(spark):
    rows = _docs()
    n_all = len(rows)
    langs = sorted({l for _s, l, _c in rows})
    lt = Counter(l for _s, l, _c in rows)
    got = {r["source"]: r for r in q_loo_lang_mix_l1(spark, SF).collect()}
    for src in {s for s, _l, _c in rows}:
        rest = [l for s, l, _c in rows if s != src]
        ct = Counter(rest)
        l1 = sum(
            abs(
                _halfup(1_000_000 * ct.get(l, 0), len(rest))
                - _halfup(1_000_000 * lt[l], n_all)
            )
            for l in langs
        )
        r = got[src]
        assert r["n_excl"] == len(rest)
        assert r["n_langs"] == len(langs)
        assert r["l1_micro"] == l1


def test_loo_block_pair_load_matches_local(spark):
    rows = _docs()
    blocks = defaultdict(Counter)
    for s, l, c in rows:
        blocks[(l, c // _BLK_W)][s] += 1

    def pairs(n):
        return n * (n - 1) // 2

    total = sum(pairs(sum(c.values())) for c in blocks.values())
    got = {r["source"]: r for r in q_loo_block_pair_load(spark, SF).collect()}
    for src in {s for s, _l, _c in rows}:
        touched = [b for b, c in blocks.items() if src in c]
        marg = sum(
            pairs(sum(blocks[b].values()))
            - pairs(sum(blocks[b].values()) - blocks[b][src])
            for b in touched
        )
        r = got[src]
        assert r["blocks_touched"] == len(touched)
        assert r["marginal_pairs"] == marg
        assert r["total_pairs"] == total
        assert r["load_share_micro"] == _halfup(1_000_000 * marg, total)
    # marginal loads over-count shared pairs, so they sum to >= total
    assert sum(r["marginal_pairs"] for r in got.values()) >= total


def test_loo_identity_reconstructs_global(spark):
    """n_excl + n_g == N for every source — the LOO frames partition
    the corpus."""
    rows = _docs()
    n_all = len(rows)
    per = Counter(s for s, _l, _c in rows)
    got = {r["source"]: r for r in q_loo_source_moments(spark, SF).collect()}
    for src, r in got.items():
        assert r["n_excl"] + per[src] == n_all


def test_plan_partial_agg_bounded_window(spark):
    """The scan collapses via a partial agg before any window — the
    window runs over the ≤S-row source frame, not the corpus."""
    df = q_loo_quality_rate(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "partial_count" in p or "partial_sum" in p
    assert "Window" in p
    # the window input is the aggregated frame: the exchange feeding it
    # is SinglePartition over the agg output, not the raw scan
    assert p.index("HashAggregate") < p.index("Window") or \
        "SinglePartition" in p


def test_registered_in_catalog():
    for name in (
        "loo_source_moments",
        "loo_median_shift",
        "loo_quality_rate",
        "loo_lang_mix_l1",
        "loo_block_pair_load",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
