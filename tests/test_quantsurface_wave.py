"""Semantics tests for the wave-70 quantile-surface entries:
interpolated quantiles, QCD, midhinge/trimean, decile ratios, ntile
balance.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against numpy/pure-Python recomputations of the
textbook definitions (Type-7 vs numpy.percentile in particular)."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_quantsurface import (
    _IQ_QS,
    _NT_K,
    q_decile_ratios,
    q_interpolated_quantiles,
    q_midhinge_trimean,
    q_ntile_balance_audit,
    q_qcd_dispersion,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _by_lang() -> dict[str, list[int]]:
    rows = duckdb.sql(
        f"SELECT lang, n_chars FROM '{SF}/documents.parquet'"
        " ORDER BY n_chars, doc_id"
    ).fetchall()
    out = defaultdict(list)
    for lang, x in rows:
        out[lang].append(x)
    return out


def _rank_pick(vals: list[int], q_micro: int) -> int:
    n = len(vals)
    return vals[max(1, -(-q_micro * n // 1_000_000)) - 1]


# ---------------------------------------------------------------------------
# interpolated_quantiles
# ---------------------------------------------------------------------------


def test_interpolated_matches_numpy_type7(spark):
    """The micro fixed-point interpolation must equal
    numpy.percentile (linear / Type-7) up to the 1e-6 grid."""
    by = _by_lang()
    got = {
        (r["lang"], r["q_micro"]): r
        for r in q_interpolated_quantiles(spark, SF).collect()
    }
    assert len(got) == len(by) * len(_IQ_QS)
    for lang, vals in by.items():
        n = len(vals)
        for q in _IQ_QS:
            h = (n - 1) * q
            lo = h // 1_000_000
            frac = h % 1_000_000
            hi = lo if frac == 0 else lo + 1
            want = vals[lo] * (1_000_000 - frac) + vals[hi] * frac
            r = got[(lang, q)]
            assert r["lo_rank"] == lo + 1
            assert r["frac_micro"] == frac
            assert r["x_lo"] == vals[lo] and r["x_hi"] == vals[hi]
            assert r["q_value_x1e6"] == want
            np_val = float(np.percentile(vals, q / 10_000, method="linear"))
            assert abs(want / 1_000_000 - np_val) < 1e-6


# ---------------------------------------------------------------------------
# qcd_dispersion / midhinge_trimean / decile_ratios
# ---------------------------------------------------------------------------


def test_qcd_matches_local(spark):
    by = _by_lang()
    got = {r["lang"]: r for r in q_qcd_dispersion(spark, SF).collect()}
    for lang, vals in by.items():
        q1 = _rank_pick(vals, 250_000)
        q3 = _rank_pick(vals, 750_000)
        r = got[lang]
        assert r["q1"] == q1 and r["q3"] == q3
        assert r["iqr"] == q3 - q1
        assert r["qcd_micro"] == _halfup(1_000_000 * (q3 - q1), q3 + q1)


def test_midhinge_trimean_matches_local(spark):
    by = _by_lang()
    got = {r["lang"]: r for r in q_midhinge_trimean(spark, SF).collect()}
    for lang, vals in by.items():
        q1, q2, q3 = (
            _rank_pick(vals, 250_000),
            _rank_pick(vals, 500_000),
            _rank_pick(vals, 750_000),
        )
        r = got[lang]
        assert r["midhinge_x2"] == q1 + q3
        assert r["trimean_x4"] == q1 + 2 * q2 + q3
        assert r["midhinge"] == _halfup(q1 + q3, 2)
        assert r["trimean"] == _halfup(q1 + 2 * q2 + q3, 4)
        # trimean lies between the quartiles
        assert q1 <= r["trimean"] <= q3


def test_decile_ratios_match_local(spark):
    by = _by_lang()
    got = {r["lang"]: r for r in q_decile_ratios(spark, SF).collect()}
    for lang, vals in by.items():
        d1 = _rank_pick(vals, 100_000)
        d9 = _rank_pick(vals, 900_000)
        r = got[lang]
        assert r["d1"] == d1 and r["d9"] == d9
        assert r["spread"] == d9 - d1
        assert r["ratio_micro"] == _halfup(1_000_000 * d9, d1)
        assert r["ratio_micro"] >= 1_000_000  # D9 >= D1 always


# ---------------------------------------------------------------------------
# ntile_balance_audit
# ---------------------------------------------------------------------------


def test_ntile_sizes_match_contract(spark):
    by = _by_lang()
    rows = q_ntile_balance_audit(spark, SF).collect()
    assert len(rows) == len(by) * _NT_K
    for r in rows:
        n = len(by[r["lang"]])
        want = n // _NT_K + (1 if r["tile"] <= n % _NT_K else 0)
        assert r["expected_rows"] == want
        assert r["n_rows"] == want
        assert r["matches"]


def test_registered_in_catalog():
    for name in (
        "interpolated_quantiles",
        "qcd_dispersion",
        "midhinge_trimean",
        "decile_ratios",
        "ntile_balance_audit",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
