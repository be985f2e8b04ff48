"""Semantics tests for the wave-65 shuffle-engineering entries: salt
planner, AQE skew-split audit, groupBy key planner, bucket co-location
balance, spill estimator.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against independent
single-node recomputations plus plan/semantics properties."""

from __future__ import annotations

import contextlib
import hashlib
import io
from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_shuffle import (
    _AQE_FACTOR,
    _AQE_MIN,
    _AQE_PARTS,
    _BK_BUCKETS,
    _GB_PARTS,
    _SALT_TARGET,
    _SP_BUDGET,
    _SP_PARTS,
    q_aqe_skew_split_audit,
    q_bucket_colocate_audit,
    q_groupby_key_planner,
    q_shuffle_spill_estimator,
    q_skew_salt_planner,
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


def _pmod(v, p: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:4], 16) % p


def _events():
    return duckdb.sql(
        f"SELECT event_id, user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()


# ---------------------------------------------------------------------------
# skew_salt_planner
# ---------------------------------------------------------------------------


def test_salt_planner_matches_local(spark):
    counts = Counter(u for _e, u, _t in _events())
    got = {r["user_id"]: r for r in q_skew_salt_planner(spark, SF).collect()}
    assert set(got) == set(counts)
    for uid, n in counts.items():
        r = got[uid]
        salt = -(-n // _SALT_TARGET)
        assert r["n_rows"] == n
        assert r["salt_factor"] == salt
        assert r["max_task_rows"] == -(-n // salt)
        # the planner's whole point: post-salt tasks fit the target
        assert r["max_task_rows"] <= _SALT_TARGET


def test_salt_planner_has_real_skew(spark):
    rows = q_skew_salt_planner(spark, SF).collect()
    assert any(r["salt_factor"] >= 2 for r in rows)


# ---------------------------------------------------------------------------
# aqe_skew_split_audit
# ---------------------------------------------------------------------------


def test_aqe_audit_matches_local(spark):
    sizes = Counter(_pmod(u, _AQE_PARTS) for _e, u, _t in _events())
    ordered = sorted(sizes.items(), key=lambda kv: (kv[1], kv[0]))
    median = ordered[(len(ordered) + 1) // 2 - 1][1]
    thr = max(_AQE_FACTOR * median, _AQE_MIN)
    got = {
        r["part_id"]: r for r in q_aqe_skew_split_audit(spark, SF).collect()
    }
    assert set(got) == set(sizes)
    for pid, n in sizes.items():
        r = got[pid]
        assert r["n_rows"] == n and r["median_rows"] == median
        assert r["threshold"] == thr
        assert r["is_skewed"] == (n > thr)
        want_splits = -(-n // max(median, 1)) if n > thr else 1
        assert r["n_splits"] == want_splits


# ---------------------------------------------------------------------------
# groupby_key_planner
# ---------------------------------------------------------------------------


def test_groupby_planner_matches_local(spark):
    evs = _events()
    n_rows = len(evs)
    keys = {
        "user_id": lambda e: str(e[1]),
        "event_type": lambda e: e[2],
        "user_id,event_type": lambda e: f"{e[1]}|{e[2]}",
    }
    got = {
        r["key_choice"]: r
        for r in q_groupby_key_planner(spark, SF).collect()
    }
    assert set(got) == set(keys)
    for name, kf in keys.items():
        ndv = len({kf(e) for e in evs})
        per_part = defaultdict(set)
        for e in evs:
            per_part[_pmod(e[0], _GB_PARTS)].add(kf(e))
        combine = sum(len(s) for s in per_part.values())
        r = got[name]
        assert r["n_rows"] == n_rows and r["ndv"] == ndv
        assert r["combine_out_rows"] == combine
        assert r["reduction_micro"] == _halfup(1_000_000 * combine, n_rows)
        # combine can never emit more than input or fewer than NDV
        assert ndv <= combine <= n_rows


def test_groupby_planner_ranks_keys_sanely(spark):
    got = {
        r["key_choice"]: r["reduction_micro"]
        for r in q_groupby_key_planner(spark, SF).collect()
    }
    # 5-value event_type combines far harder than the composite key
    assert got["event_type"] < got["user_id,event_type"]


# ---------------------------------------------------------------------------
# bucket_colocate_audit
# ---------------------------------------------------------------------------


def test_bucket_audit_matches_local(spark):
    evs = _events()
    n_keys = len({u for _e, u, _t in evs})
    got = {
        r["n_buckets"]: r
        for r in q_bucket_colocate_audit(spark, SF).collect()
    }
    assert set(got) == set(_BK_BUCKETS)
    for b in _BK_BUCKETS:
        sizes = Counter(_pmod(u, b) for _e, u, _t in evs)
        total = sum(sizes.values())
        mx = max(sizes.values())
        r = got[b]
        assert r["total_rows"] == total
        assert r["max_bucket_rows"] == mx
        assert r["balance_micro"] == _halfup(1_000_000 * b * mx, total)
        assert r["shuffle_bytes_avoided"] == 16 * (total + n_keys)
        # perfect balance is 1.0; real data is above it
        assert r["balance_micro"] >= 1_000_000


# ---------------------------------------------------------------------------
# shuffle_spill_estimator
# ---------------------------------------------------------------------------


def test_spill_estimator_matches_local(spark):
    evs = _events()
    got = {
        r["n_partitions"]: r
        for r in q_shuffle_spill_estimator(spark, SF).collect()
    }
    assert set(got) == set(_SP_PARTS)
    for p in _SP_PARTS:
        sizes = Counter(_pmod(u, p) for _e, u, _t in evs)
        byts = {k: 16 * v for k, v in sizes.items()}
        total = sum(byts.values())
        spilled = sum(1 for v in byts.values() if v > _SP_BUDGET)
        spill = sum(max(0, v - _SP_BUDGET) for v in byts.values())
        r = got[p]
        assert r["total_bytes"] == total
        assert r["spilled_partitions"] == spilled
        assert r["spill_bytes"] == spill
        assert r["spill_ratio_micro"] == _halfup(1_000_000 * spill, total)


def test_more_partitions_spill_less(spark):
    got = {
        r["n_partitions"]: r["spill_bytes"]
        for r in q_shuffle_spill_estimator(spark, SF).collect()
    }
    # the shuffle.partitions sizing rule: more partitions -> less
    # over-budget mass (weakly, since totals are equal)
    assert got[max(_SP_PARTS)] <= got[min(_SP_PARTS)]


def test_plans_are_partial_agg_shaped(spark):
    for df in (
        q_skew_salt_planner(spark, SF),
        q_shuffle_spill_estimator(spark, SF),
    ):
        plan = _plan_of(df)
        assert "HashAggregate" in plan
        assert "SortMergeJoin" not in plan


def test_registered_in_catalog():
    for name in (
        "skew_salt_planner",
        "aqe_skew_split_audit",
        "groupby_key_planner",
        "bucket_colocate_audit",
        "shuffle_spill_estimator",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
