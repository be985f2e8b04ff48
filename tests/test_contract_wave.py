"""Semantics tests for the wave-67 data-contract entries: FK orphan
audit, fanout profile, key uniqueness, snapshot drift, date
completeness.  The DuckDB value-hash gate is scripts/check_queries.py;
these pin each op against independent duckdb recomputations plus
contract-shaped sanity properties of the clean fixture."""

from __future__ import annotations

import contextlib
import io
from collections import Counter
from datetime import timedelta

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_contract import (
    _FKS,
    _KEYS,
    q_date_completeness_audit,
    q_fk_fanout_profile,
    q_fk_orphan_audit,
    q_key_uniqueness_audit,
    q_snapshot_stats_drift,
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


def _tbl(name: str) -> str:
    return f"'{SF}/{name}.parquet'"


# ---------------------------------------------------------------------------
# fk_orphan_audit
# ---------------------------------------------------------------------------


def test_fk_orphans_match_duckdb(spark):
    got = {r["fk"]: r for r in q_fk_orphan_audit(spark, SF).collect()}
    assert len(got) == len(_FKS)
    for child, fk, parent, pk in _FKS:
        total, orphans = duckdb.sql(
            f"""SELECT (SELECT count(*) FROM {_tbl(child)}),
                  (SELECT count(*) FROM {_tbl(child)} c
                   WHERE NOT EXISTS (
                     SELECT 1 FROM {_tbl(parent)} p
                     WHERE p.{pk} = c.{fk}))"""
        ).fetchone()
        r = got[f"{child}.{fk}"]
        assert r["references_key"] == f"{parent}.{pk}"
        assert r["child_rows"] == total
        assert r["orphan_rows"] == orphans
        assert r["orphan_micro"] == _halfup(1_000_000 * orphans, total)


def test_fixture_is_referentially_clean(spark):
    # the synthetic schema must have zero orphans, or every FK join
    # in the catalog silently drops rows
    for r in q_fk_orphan_audit(spark, SF).collect():
        assert r["orphan_rows"] == 0, r["fk"]


# ---------------------------------------------------------------------------
# fk_fanout_profile
# ---------------------------------------------------------------------------


def test_fanout_matches_duckdb(spark):
    got = {r["fk"]: r for r in q_fk_fanout_profile(spark, SF).collect()}
    for child, fk, parent, pk in _FKS:
        rows = duckdb.sql(
            f"""SELECT coalesce(c.fan, 0) FROM {_tbl(parent)} p
                LEFT JOIN (SELECT {fk} AS k, count(*) AS fan
                           FROM {_tbl(child)} GROUP BY {fk}) c
                  ON c.k = p.{pk}"""
        ).fetchall()
        fans = [int(v) for (v,) in rows]
        r = got[f"{child}.{fk}"]
        assert r["n_parents"] == len(fans)
        assert r["matched_children"] == sum(fans)
        assert r["max_fanout"] == max(fans)
        assert r["zero_child_parents"] == sum(1 for f in fans if f == 0)
        assert r["avg_fanout_micro"] == _halfup(
            1_000_000 * sum(fans), len(fans)
        )
        assert r["relationship"] == ("1:1" if max(fans) <= 1 else "1:N")


def test_fanout_consistent_with_orphans(spark):
    """With zero orphans, matched_children equals child_rows."""
    orphans = {
        r["fk"]: r for r in q_fk_orphan_audit(spark, SF).collect()
    }
    for r in q_fk_fanout_profile(spark, SF).collect():
        o = orphans[r["fk"]]
        assert r["matched_children"] == o["child_rows"] - o["orphan_rows"]


def test_fanout_plan_preaggregates_child(spark):
    plan = _plan_of(q_fk_fanout_profile(spark, SF))
    # child side reduces to counts before the parent join
    assert "HashAggregate" in plan


# ---------------------------------------------------------------------------
# key_uniqueness_audit
# ---------------------------------------------------------------------------


def test_key_uniqueness_matches_duckdb(spark):
    got = {r["tbl"]: r for r in q_key_uniqueness_audit(spark, SF).collect()}
    assert len(got) == len(_KEYS)
    for tbl, _sexpr, oexpr in _KEYS:
        n, ndv = duckdb.sql(
            f"SELECT count(*), count(DISTINCT {oexpr}) FROM {_tbl(tbl)}"
        ).fetchone()
        r = got[tbl]
        assert r["n_rows"] == n and r["ndv"] == ndv
        assert r["dup_rows"] == n - ndv
        assert r["is_unique"] == (n == ndv)


def test_declared_keys_are_unique_on_fixture(spark):
    """Single-column surrogate keys are unique; the lineitem
    composite (l_orderkey, l_linenumber) is NOT in the synthetic
    fixture — the audit must catch that, which is its whole point."""
    rows = {r["tbl"]: r for r in q_key_uniqueness_audit(spark, SF).collect()}
    for tbl, r in rows.items():
        if tbl == "lineitem":
            assert not r["is_unique"] and r["dup_rows"] > 0
        else:
            assert r["is_unique"], tbl


# ---------------------------------------------------------------------------
# snapshot_stats_drift
# ---------------------------------------------------------------------------


def test_snapshot_drift_matches_local(spark):
    rows = duckdb.sql(
        f"""SELECT event_id, event_type, epoch_us(ts)
            FROM {_tbl('events')} ORDER BY 3, 1"""
    ).fetchall()
    n = len(rows)
    cut_id, _ct, cut_us = (
        rows[(n + 1) // 2 - 1][0],
        None,
        rows[(n + 1) // 2 - 1][2],
    )
    early = Counter()
    late = Counter()
    for eid, et, us in rows:
        if us < cut_us or (us == cut_us and eid <= cut_id):
            early[et] += 1
        else:
            late[et] += 1
    te, tl = sum(early.values()), sum(late.values())
    assert te == (n + 1) // 2  # the median row closes the early half
    got = {
        r["event_type"]: r
        for r in q_snapshot_stats_drift(spark, SF).collect()
    }
    assert set(got) == set(early) | set(late)
    for et, r in got.items():
        assert r["n_early"] == early[et]
        assert r["n_late"] == late[et]
        se = _halfup(1_000_000 * early[et], te)
        sl = _halfup(1_000_000 * late[et], tl)
        assert r["share_early_micro"] == se
        assert r["share_late_micro"] == sl
        assert r["drift_micro"] == abs(se - sl)


# ---------------------------------------------------------------------------
# date_completeness_audit
# ---------------------------------------------------------------------------


def test_date_completeness_matches_local(spark):
    days = sorted(
        d
        for (d,) in duckdb.sql(
            f"SELECT DISTINCT CAST(ts AS DATE) FROM {_tbl('events')}"
        ).fetchall()
    )
    span = (days[-1] - days[0]).days + 1
    max_gap = max(
        [(b - a).days - 1 for a, b in zip(days, days[1:])], default=0
    )
    [r] = q_date_completeness_audit(spark, SF).collect()
    assert r["n_days"] == len(days)
    assert r["first_day"] == str(days[0])
    assert r["last_day"] == str(days[-1])
    assert r["span_days"] == span
    assert r["missing_days"] == span - len(days)
    assert r["max_gap_days"] == max_gap
    assert r["completeness_micro"] == _halfup(1_000_000 * len(days), span)
    # internal consistency: missing days fit inside the gaps
    assert r["max_gap_days"] <= r["missing_days"]


def test_registered_in_catalog():
    for name in (
        "fk_orphan_audit",
        "fk_fanout_profile",
        "key_uniqueness_audit",
        "snapshot_stats_drift",
        "date_completeness_audit",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
