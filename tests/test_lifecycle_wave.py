"""Semantics tests for the wave-95 lifecycle entries: age profile,
retention ledger, TTL forecast, cold candidates, tiering sim.  The
DuckDB value-hash gate is scripts/check_queries.py; these replay the
lifecycle arithmetic in pure Python and pin the structure (ledger
partitions rows, TTL cumulative telescopes, tiers partition the
table)."""

from __future__ import annotations

from collections import Counter

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_lifecycle import (
    _COLD_M,
    _RET_GRID,
    _TIER_GRID,
    _TTL_H,
    _TTL_RET,
    q_cold_data_candidates,
    q_partition_retention_ledger,
    q_table_age_profile,
    q_tiering_policy_sim,
    q_ttl_expiry_forecast,
)

SF = "/root/testdata/sf0.001"


def _halfup(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def _hist():
    rows = duckdb.sql(
        f"""SELECT CAST(date_trunc('month', l_shipdate) AS DATE),
              count(*) FROM '{SF}/lineitem.parquet' GROUP BY 1"""
    ).fetchall()
    hist = {m: int(n) for m, n in rows}
    now = max(hist)
    ages = {
        m: (now.year - m.year) * 12 + (now.month - m.month) for m in hist
    }
    return hist, ages


def test_age_profile_consistency(spark):
    got = {r["table_name"]: r for r in q_table_age_profile(spark, SF).collect()}
    assert set(got) == {"orders", "lineitem", "events"}
    for r in got.values():
        assert 0 < r["rows_last_12m"] <= r["n_rows"]
        assert r["first_month"] <= r["last_month"]
        assert r["fresh_share_micro"] == _halfup(
            1_000_000 * r["rows_last_12m"], r["n_rows"]
        )
    # the events fixture is a single month — fully fresh
    assert got["events"]["fresh_share_micro"] == 1_000_000


def test_retention_ledger_partitions(spark):
    hist, ages = _hist()
    got = q_partition_retention_ledger(spark, SF).collect()
    assert len(got) == len(hist) * len(_RET_GRID)
    for r in got:
        m = r["partition_month"]
        assert r["age_m"] == ages[m]
        assert r["n_rows"] == hist[m]
        exp = ages[m] >= r["retention_months"]
        assert (r["action"] == "expire") == exp
        assert r["expirable_rows"] == (hist[m] if exp else 0)


def test_ttl_forecast_telescopes(spark):
    hist, ages = _hist()
    got = {r["horizon_months"]: r for r in q_ttl_expiry_forecast(spark, SF).collect()}
    assert set(got) == set(range(1, _TTL_H + 1))
    cum_prev = 0
    for k in range(1, _TTL_H + 1):
        newly = sum(
            n for m, n in hist.items() if ages[m] == _TTL_RET - k
        )
        cum = sum(
            n
            for m, n in hist.items()
            if ages[m] < _TTL_RET and ages[m] + k >= _TTL_RET
        )
        r = got[k]
        assert r["newly_expiring"] == newly
        assert r["cumulative_expiring"] == cum
        assert cum == cum_prev + newly
        cum_prev = cum


def test_cold_candidates(spark):
    rows = q_cold_data_candidates(spark, SF).collect()
    summ = [r for r in rows if r["label"] == "_SUMMARY"][0]
    parts = [r for r in rows if r["label"] != "_SUMMARY"]
    per = duckdb.sql(
        f"""WITH p AS (SELECT l_partkey,
              max(CAST(date_trunc('month', l_shipdate) AS DATE)) lm
            FROM '{SF}/lineitem.parquet' GROUP BY 1),
            n AS (SELECT max(lm) nm FROM p)
            SELECT count(*) FROM p CROSS JOIN n
            WHERE datediff('month', lm, nm) >= {_COLD_M}"""
    ).fetchall()[0][0]
    assert summ["n_parts"] == per
    assert len(parts) == min(10, per)
    for r in parts:
        assert r["n_parts"] >= _COLD_M  # idle months in that column


def test_tiering_partitions_rows(spark):
    hist, ages = _hist()
    total = sum(hist.values())
    got = {(r["hot_m"], r["warm_m"]): r for r in q_tiering_policy_sim(spark, SF).collect()}
    assert set(got) == set(_TIER_GRID)
    for (h, w), r in got.items():
        hot = sum(n for m, n in hist.items() if ages[m] <= h)
        warm = sum(n for m, n in hist.items() if h < ages[m] <= w)
        cold = sum(n for m, n in hist.items() if ages[m] > w)
        assert (r["hot_rows"], r["warm_rows"], r["cold_rows"]) == (hot, warm, cold)
        assert hot + warm + cold == total
        assert r["cold_share_micro"] == _halfup(1_000_000 * cold, total)


def test_registered_in_catalog():
    for name in (
        "table_age_profile",
        "partition_retention_ledger",
        "ttl_expiry_forecast",
        "cold_data_candidates",
        "tiering_policy_sim",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
