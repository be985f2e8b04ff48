"""Semantics tests for the wave-61 physical-planning calculators:
table stats/bytes, join-strategy planner, map-side combine audit,
partition-size planner, bucketing breakeven.  The DuckDB value-hash
gate is scripts/check_queries.py; these pin each op against an
independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import contextlib
import io

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_planner import (
    _BC_THRESH,
    _BK_BUILD_FACTOR,
    _BK_K,
    _JOINS,
    _MC_PARTS,
    _PT_TARGET,
    _SH_FACTOR,
    _TBL_MODEL,
    q_bucketing_breakeven,
    q_join_strategy_planner,
    q_mapside_combine_audit,
    q_partition_size_planner,
    q_table_stats_bytes,
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


def _local_stats() -> dict[str, tuple[int, int]]:
    """(n_rows, est_bytes) per table via duckdb, independent of Spark."""
    out = {}
    for tbl, (fixed, varchars) in _TBL_MODEL.items():
        w = " + ".join(
            [str(fixed)]
            + [f"coalesce(length({c}), 0) + 4" for c in varchars]
        )
        n, b = duckdb.sql(
            f"SELECT count(*), sum({w}) FROM '{SF}/{tbl}.parquet'"
        ).fetchone()
        out[tbl] = (int(n), int(b))
    return out


# ---------------------------------------------------------------------------
# table_stats_bytes
# ---------------------------------------------------------------------------


def test_table_stats_matches_local(spark):
    want = _local_stats()
    got = {
        r["tbl"]: r for r in q_table_stats_bytes(spark, SF).collect()
    }
    assert set(got) == set(want)
    for tbl, (n, b) in want.items():
        assert got[tbl]["n_rows"] == n
        assert got[tbl]["est_bytes"] == b
        assert got[tbl]["avg_row_bytes"] == _halfup(b, n)


def test_table_stats_plan_is_partial_agg(spark):
    plan = _plan_of(q_table_stats_bytes(spark, SF))
    # per-table scans collapse via partial aggregation (map-side
    # combine) before the single-row exchange — no raw-row shuffle.
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "Union" in plan


# ---------------------------------------------------------------------------
# join_strategy_planner
# ---------------------------------------------------------------------------


def test_join_strategy_decisions(spark):
    stats = _local_stats()
    rows = {
        (r["left_tbl"], r["right_tbl"]): r
        for r in q_join_strategy_planner(spark, SF).collect()
    }
    assert len(rows) == len(_JOINS)
    for left, right in _JOINS:
        lb, rb = stats[left][1], stats[right][1]
        r = rows[(left, right)]
        assert r["left_bytes"] == lb and r["right_bytes"] == rb
        if rb <= _BC_THRESH:
            assert r["strategy"] == "broadcast_right"
            assert r["shuffle_bytes"] == 0
        elif rb * _SH_FACTOR <= lb:
            assert r["strategy"] == "shuffled_hash"
            assert r["shuffle_bytes"] == lb + rb
        else:
            assert r["strategy"] == "sort_merge"
            assert r["shuffle_bytes"] == lb + rb


def test_join_strategy_covers_all_strategies(spark):
    # the fixture corpus must exercise every branch of the CASE, or
    # the decision table is vacuous.
    strategies = {
        r["strategy"]
        for r in q_join_strategy_planner(spark, SF).collect()
    }
    assert "broadcast_right" in strategies
    assert "sort_merge" in strategies or "shuffled_hash" in strategies


def test_join_strategy_plan_broadcasts_stats(spark):
    plan = _plan_of(q_join_strategy_planner(spark, SF))
    # the 8-row stats frame joins the 6-row pair table via broadcast —
    # never a shuffle of the decision table.
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# mapside_combine_audit
# ---------------------------------------------------------------------------


def test_mapside_combine_matches_local(spark):
    want = {
        int(pid): (int(ri), int(ro))
        for pid, ri, ro in duckdb.sql(
            f"""
            SELECT CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                        1, 4) AS INT) AS BIGINT) % {_MC_PARTS} AS p,
                   count(*), count(DISTINCT user_id)
            FROM '{SF}/events.parquet' GROUP BY p
            """
        ).fetchall()
    }
    got = {
        r["part_id"]: r
        for r in q_mapside_combine_audit(spark, SF).collect()
    }
    assert set(got) == set(want)
    for pid, (ri, ro) in want.items():
        r = got[pid]
        assert r["rows_in"] == ri and r["rows_out"] == ro
        assert r["bytes_no_combine"] == ri * 16
        assert r["bytes_combined"] == ro * 16
        assert r["reduction_micro"] == _halfup(1_000_000 * ro, ri)


def test_mapside_combine_reduces(spark):
    # the audit's own point: combiner output strictly smaller in
    # aggregate than its input on the fixture corpus.
    rows = q_mapside_combine_audit(spark, SF).collect()
    assert sum(r["rows_out"] for r in rows) < sum(
        r["rows_in"] for r in rows
    )


# ---------------------------------------------------------------------------
# partition_size_planner
# ---------------------------------------------------------------------------


def test_partition_size_matches_local(spark):
    stats = _local_stats()
    got = {
        r["tbl"]: r for r in q_partition_size_planner(spark, SF).collect()
    }
    for tbl, (n, b) in stats.items():
        r = got[tbl]
        parts = -(-b // _PT_TARGET)
        assert r["n_partitions"] == parts >= 1
        assert r["rows_per_partition"] == -(-n // parts)
        last = b - (parts - 1) * _PT_TARGET
        assert r["last_fill_micro"] == _halfup(
            1_000_000 * last, _PT_TARGET
        )
        assert 0 < last <= _PT_TARGET


# ---------------------------------------------------------------------------
# bucketing_breakeven
# ---------------------------------------------------------------------------


def test_bucketing_breakeven_ledger(spark):
    stats = _local_stats()
    per_join = stats["lineitem"][1] + stats["orders"][1]
    rows = sorted(
        q_bucketing_breakeven(spark, SF).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == list(range(1, _BK_K + 1))
    for r in rows:
        k = r["k"]
        assert r["shuffle_per_join"] == per_join
        assert r["build_cost"] == _BK_BUILD_FACTOR * per_join
        assert r["unbucketed_cum"] == k * per_join
        assert r["bucketed_cum"] == _BK_BUILD_FACTOR * per_join
        assert r["savings"] == (k - _BK_BUILD_FACTOR) * per_join
        assert r["amortized"] == (k >= _BK_BUILD_FACTOR)
    # the ledger must cross breakeven inside the k range
    assert rows[0]["savings"] < 0 or _BK_BUILD_FACTOR == 1
    assert rows[-1]["savings"] > 0


def test_registered_in_catalog():
    for name in (
        "table_stats_bytes",
        "join_strategy_planner",
        "mapside_combine_audit",
        "partition_size_planner",
        "bucketing_breakeven",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
