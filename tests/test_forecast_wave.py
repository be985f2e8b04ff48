"""Semantics tests for the wave-63 forecast-evaluation entries:
Brier decomposition, ensemble CRPS, pinball loss, interval coverage,
PIT histogram.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against an independent hashlib recomputation plus
statistical sanity properties of the calibrated synthetic forecaster."""

from __future__ import annotations

import contextlib
import hashlib
import io
from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_forecast import (
    _BR_W,
    _IC_LEVELS,
    _M,
    _PB_QS,
    _X_MOD,
    q_brier_decomposition,
    q_crps_ensemble,
    q_interval_coverage,
    q_pinball_loss,
    q_pit_histogram,
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


def _h(salt: str, doc_id: int) -> int:
    return int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8], 16)


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()


def _pairs():
    """(doc_id, lang, p_micro, y) recomputed in pure Python."""
    out = []
    for doc_id, lang, _n in _docs():
        p = _h("p", doc_id) % 1_000_001
        y = 1 if _h("y", doc_id) % 1_000_000 < p else 0
        out.append((doc_id, lang, p, y))
    return out


def _members(doc_id: int) -> list[int]:
    return [_h(f"m:{k}", doc_id) % _X_MOD for k in range(1, _M + 1)]


# ---------------------------------------------------------------------------
# brier_decomposition
# ---------------------------------------------------------------------------


def test_brier_matches_local(spark):
    pairs = _pairs()
    n = len(pairs)
    sy = sum(y for *_xs, y in pairs)
    ybar = _halfup(1_000_000 * sy, n)
    sq = sum((p - 1_000_000 * y) ** 2 for _d, _l, p, y in pairs)
    bins = defaultdict(lambda: [0, 0, 0])
    for _d, _l, p, y in pairs:
        b = bins[p // _BR_W]
        b[0] += 1
        b[1] += p
        b[2] += y
    rel = sum(
        nb * (_halfup(sp, nb) - _halfup(1_000_000 * syb, nb)) ** 2
        for nb, sp, syb in bins.values()
    )
    res = sum(
        nb * (_halfup(1_000_000 * syb, nb) - ybar) ** 2
        for nb, _sp, syb in bins.values()
    )
    [r] = q_brier_decomposition(spark, SF).collect()
    assert r["n"] == n
    assert r["ybar_micro"] == ybar
    assert r["brier_micro2"] == _halfup(sq, n)
    assert r["reliability_micro2"] == _halfup(rel, n)
    assert r["resolution_micro2"] == _halfup(res, n)
    assert r["uncertainty_micro2"] == ybar * (1_000_000 - ybar)


def test_brier_decomposition_identity_holds_approximately(spark):
    """REL - RES + UNC = Brier up to binning error — the calibrated
    forecaster keeps reliability small."""
    [r] = q_brier_decomposition(spark, SF).collect()
    lhs = (
        r["reliability_micro2"]
        - r["resolution_micro2"]
        + r["uncertainty_micro2"]
    )
    # within-bin variance of p is at most (bin width / 2)^2 plus
    # rounding; allow a generous 2x bin-width^2 slack
    assert abs(lhs - r["brier_micro2"]) <= 2 * _BR_W * _BR_W
    # calibrated by construction -> reliability well under uncertainty
    assert r["reliability_micro2"] < r["uncertainty_micro2"] // 4


# ---------------------------------------------------------------------------
# crps_ensemble
# ---------------------------------------------------------------------------


def test_crps_matches_local(spark):
    t1 = Counter()
    t2 = Counter()
    nd = Counter()
    for doc_id, lang, n_chars in _docs():
        x = n_chars % _X_MOD
        ms = _members(doc_id)
        nd[lang] += 1
        t1[lang] += sum(abs(m - x) for m in ms)
        t2[lang] += sum(
            abs(ms[i] - ms[j])
            for i in range(_M)
            for j in range(_M)
            if i != j
        )
    got = {r["lang"]: r for r in q_crps_ensemble(spark, SF).collect()}
    assert set(got) == set(nd)
    for lang in nd:
        r = got[lang]
        assert r["n_docs"] == nd[lang]
        assert r["sum_absdev"] == t1[lang]
        assert r["sum_pairdev"] == t2[lang]
        num = 2 * _M * t1[lang] - t2[lang]
        assert num >= 0  # CRPS is nonnegative
        assert r["mean_crps_micro"] == _halfup(
            1_000_000 * num, 2 * _M * _M * nd[lang]
        )


def test_crps_plan_has_no_explode(spark):
    plan = _plan_of(q_crps_ensemble(spark, SF))
    # constant member count -> scalar expressions, no Generate node
    assert "Generate" not in plan
    assert "HashAggregate" in plan


# ---------------------------------------------------------------------------
# pinball_loss
# ---------------------------------------------------------------------------


def _lang_sorted():
    by_lang = defaultdict(list)
    for doc_id, lang, n_chars in _docs():
        by_lang[lang].append((n_chars, doc_id))
    for v in by_lang.values():
        v.sort()
    return by_lang


def _pinball(vals: list[int], yhat: int, q: int) -> int:
    return sum(
        q * (x - yhat) if x >= yhat else (1_000_000 - q) * (yhat - x)
        for x in vals
    )


def test_pinball_matches_local(spark):
    by_lang = _lang_sorted()
    got = {
        (r["lang"], r["q_micro"]): r
        for r in q_pinball_loss(spark, SF).collect()
    }
    assert len(got) == len(by_lang) * len(_PB_QS)
    for lang, pairs in by_lang.items():
        vals = [x for x, _d in pairs]
        n = len(vals)
        for q in _PB_QS:
            rk = max(1, -(-q * n // 1_000_000))
            yhat = vals[rk - 1]
            r = got[(lang, q)]
            assert r["yhat"] == yhat and r["n_docs"] == n
            loss = _pinball(vals, yhat, q)
            assert r["loss_sum"] == loss
            assert r["mean_loss_micro"] == _halfup(loss, n)


def test_pinball_empirical_quantile_minimizes(spark):
    """The empirical q-quantile is the pinball-loss minimizer: any
    perturbed predictor does no better."""
    by_lang = _lang_sorted()
    for lang, pairs in list(by_lang.items())[:2]:
        vals = [x for x, _d in pairs]
        n = len(vals)
        for q in _PB_QS:
            rk = max(1, -(-q * n // 1_000_000))
            yhat = vals[rk - 1]
            best = _pinball(vals, yhat, q)
            for delta in (-3, -1, 1, 3):
                assert best <= _pinball(vals, yhat + delta, q)


# ---------------------------------------------------------------------------
# interval_coverage
# ---------------------------------------------------------------------------


def test_interval_coverage_matches_local(spark):
    by_lang = _lang_sorted()
    got = {
        (r["lang"], r["level_micro"]): r
        for r in q_interval_coverage(spark, SF).collect()
    }
    assert len(got) == len(by_lang) * len(_IC_LEVELS)
    for lang, pairs in by_lang.items():
        vals = [x for x, _d in pairs]
        n = len(vals)
        for lv in _IC_LEVELS:
            qlo = (1_000_000 - lv) // 2
            qhi = 1_000_000 - qlo
            lo = vals[max(1, -(-qlo * n // 1_000_000)) - 1]
            hi = vals[max(1, -(-qhi * n // 1_000_000)) - 1]
            r = got[(lang, lv)]
            assert r["lo"] == lo and r["hi"] == hi
            assert r["width"] == hi - lo
            cov = sum(1 for x in vals if lo <= x <= hi)
            assert r["covered"] == cov
            assert r["coverage_micro"] == _halfup(1_000_000 * cov, n)
            # achieved coverage at/above nominal (ceil-rank bounds)
            assert r["coverage_micro"] >= lv - 50_000


def test_interval_width_monotone_in_level(spark):
    rows = q_interval_coverage(spark, SF).collect()
    by_lang = defaultdict(dict)
    for r in rows:
        by_lang[r["lang"]][r["level_micro"]] = r["width"]
    for widths in by_lang.values():
        ws = [widths[lv] for lv in sorted(widths)]
        assert all(a <= b for a, b in zip(ws, ws[1:]))


# ---------------------------------------------------------------------------
# pit_histogram
# ---------------------------------------------------------------------------


def test_pit_matches_local(spark):
    ranks = Counter()
    for doc_id, _lang, n_chars in _docs():
        x = n_chars % _X_MOD
        ranks[sum(1 for m in _members(doc_id) if m < x)] += 1
    total = sum(ranks.values())
    k = _M + 1
    s = sum((k * nr - total) ** 2 for r in range(k) for nr in [ranks.get(r, 0)])
    chi2 = _halfup(1_000_000 * s, k * total)
    got = {r["pit_rank"]: r for r in q_pit_histogram(spark, SF).collect()}
    assert {r: v["n"] for r, v in got.items()} == {
        r: n for r, n in ranks.items()
    }
    for r, v in got.items():
        assert v["total"] == total
        assert v["share_micro"] == _halfup(1_000_000 * ranks[r], total)
        assert v["chi2_micro"] == chi2
    assert set(got) <= set(range(k))


def test_registered_in_catalog():
    for name in (
        "brier_decomposition",
        "crps_ensemble",
        "pinball_loss",
        "interval_coverage",
        "pit_histogram",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
