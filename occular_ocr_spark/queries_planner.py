"""Physical-planning calculator catalog, round 4 (wave 61): five
operators that replay the COST-BASED decisions a 100 TB Spark job
stands on — measured from the data itself (an ANALYZE TABLE pass),
not guessed.  The byte model is documented and identical on both
engines: 16 B row overhead, 8 B per BIGINT/DOUBLE/TIMESTAMP, 4 B per
INTEGER, length+4 B per VARCHAR (NULL → 0+4):

* ``table_stats_bytes`` — per-table row counts, exact modeled bytes,
  and half-up mean row width for all {_N_TABLES} fixture tables: the
  stats foundation every CBO decision below consumes.
* ``join_strategy_planner`` — for the six canonical FK joins of the
  schema, pick broadcast-right (right ≤ {_BC_THRESH} B) /
  shuffled-hash (right·{_SH_FACTOR} ≤ left) / sort-merge, and report
  the exact shuffle bytes each choice moves — the Spark
  autoBroadcastJoinThreshold / preferSortMergeJoin logic as an
  auditable table.
* ``mapside_combine_audit`` — the partial-aggregation payoff: events
  rows land in {_MC_PARTS} synthetic map partitions by portable hash
  of event_id; per partition the groupBy(user_id) combiner emits one
  row per distinct key, so the audit reports rows/bytes into the
  shuffle with vs without map-side combine and the exact reduction
  ratio — why partial_sum in a plan matters.
* ``partition_size_planner`` — ⌈bytes / {_PT_TARGET} B⌉ target
  partition counts and rows-per-partition for every table (the
  maxPartitionBytes / shuffle.partitions sizing rule; the target is a
  module constant scaled to the fixture corpus).
* ``bucketing_breakeven`` — amortization of bucketing
  lineitem⋈orders: one-time build cost = re-sorting both sides
  ({_BK_BUILD_FACTOR}× their bytes) vs per-join shuffle savings;
  emits the cumulative ledger for k = 1..{_BK_K} joins with the
  breakeven flag — the bucket-the-fact-table business case.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_planner_wave.py.

Cross-engine float policy: exact integers end-to-end — byte sums,
thresholds, partition counts, ledgers; ratios are single half-up
micro divisions.

Scale notes: each per-table stat is ONE scan collapsing to one row
(at 100 TB these come from table metadata / ANALYZE, not a scan — the
entry certifies the arithmetic); the combine audit's per-partition
distinct is the partial-agg shape itself; every decision table is
≤#tables or ≤k rows.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_N_TABLES = 8
_BC_THRESH = 16_384  # broadcast-right threshold (fixture-scaled)
_SH_FACTOR = 3  # shuffled-hash if right*3 <= left
_MC_PARTS = 32
_PT_TARGET = 16_384  # target partition bytes (fixture-scaled)
_BK_BUILD_FACTOR = 2
_BK_K = 5

# byte model per table: (row_overhead + fixed numeric widths,
#                        [varchar columns])
_TBL_MODEL = {
    "region": (16 + 4, ["r_name"]),
    "nation": (16 + 4 + 4, ["n_name"]),
    "customer": (16 + 8 + 4 + 8, ["c_name", "c_mktsegment"]),
    "supplier": (16 + 8 + 4 + 8, ["s_name"]),
    "part": (16 + 8 + 4 + 8, ["p_name", "p_brand", "p_type"]),
    "orders": (16 + 8 + 8 + 8 + 8, ["o_orderstatus", "o_orderpriority"]),
    "lineitem": (
        16 + 8 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + 8,
        ["l_returnflag", "l_linestatus"],
    ),
    "events": (16 + 8 + 8 + 8 + 8, ["event_type", "props"]),
}


def _stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tbl, n_rows, est_bytes) for every fixture table — one scan
    each, released after the session via the tracked persist."""
    parts = []
    for tbl, (fixed, varchars) in _TBL_MODEL.items():
        row_bytes = F.lit(fixed)
        for c in varchars:
            row_bytes = row_bytes + F.coalesce(
                F.length(F.col(c)), F.lit(0)
            ) + F.lit(4)
        parts.append(
            _t(spark, sf_dir, tbl).agg(
                F.lit(tbl).alias("tbl"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(row_bytes).cast("long").alias("est_bytes"),
            )
        )
    return _q._persist_tracked(reduce(DataFrame.unionAll, parts))


def _stats_sql() -> str:
    sel = []
    for tbl, (fixed, varchars) in _TBL_MODEL.items():
        w = " + ".join(
            [str(fixed)]
            + [f"coalesce(length({c}), 0) + 4" for c in varchars]
        )
        sel.append(
            f"SELECT '{tbl}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(sum({w}) AS BIGINT) AS est_bytes FROM {tbl}"
        )
    return "stats AS (" + " UNION ALL ".join(sel) + ")"


# ---------------------------------------------------------------------------
# table_stats_bytes
# ---------------------------------------------------------------------------


def q_table_stats_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style stats: rows, exact modeled bytes, mean row width
    (half-up) per table.

    Scale: one partial-agg scan per table collapsing to 1 row; at
    100 TB these numbers come from table metadata — the entry
    certifies the byte arithmetic the planner entries consume.
    """
    return _stats(spark, sf_dir).selectExpr(
        "tbl",
        "n_rows",
        "est_bytes",
        "CAST((2 * est_bytes + n_rows) DIV (2 * n_rows) AS BIGINT)"
        " AS avg_row_bytes",
    )


ORACLE_TABLE_STATS_BYTES = f"""
WITH {_stats_sql()}
SELECT tbl, n_rows, est_bytes,
       CAST(CAST(2 * est_bytes + n_rows AS HUGEINT)
            // CAST(2 * n_rows AS HUGEINT) AS BIGINT) AS avg_row_bytes
FROM stats
"""


# ---------------------------------------------------------------------------
# join_strategy_planner
# ---------------------------------------------------------------------------

_JOINS = [
    ("lineitem", "orders"),
    ("lineitem", "part"),
    ("orders", "customer"),
    ("customer", "nation"),
    ("supplier", "nation"),
    ("nation", "region"),
]


def q_join_strategy_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO join-strategy table for the six canonical FK joins:
    broadcast_right when the dim fits under {_BC_THRESH} B (shuffle
    moves 0 B — the build side ships via the broadcast, off the
    shuffle ledger), else shuffled_hash when right·{_SH_FACTOR} ≤
    left (both sides shuffle but no sort), else sort_merge.

    Scale: a 6-row decision table joined twice against the 8-row
    broadcast stats frame.
    """
    stats = _stats(spark, sf_dir)
    pairs = spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(_JOINS, start=1)],
        "join_id int, left_tbl string, right_tbl string",
    )
    ls = stats.selectExpr(
        "tbl AS left_tbl", "est_bytes AS left_bytes"
    )
    rs = stats.selectExpr(
        "tbl AS right_tbl", "est_bytes AS right_bytes"
    )
    return (
        pairs.join(F.broadcast(ls), "left_tbl")
        .join(F.broadcast(rs), "right_tbl")
        .selectExpr(
            "join_id",
            "left_tbl",
            "right_tbl",
            "left_bytes",
            "right_bytes",
            f"CASE WHEN right_bytes <= {_BC_THRESH} THEN 'broadcast_right'"
            f" WHEN right_bytes * {_SH_FACTOR} <= left_bytes"
            " THEN 'shuffled_hash' ELSE 'sort_merge' END AS strategy",
            f"CASE WHEN right_bytes <= {_BC_THRESH} THEN 0"
            " ELSE left_bytes + right_bytes END AS shuffle_bytes",
        )
    )


ORACLE_JOIN_STRATEGY_PLANNER = f"""
WITH {_stats_sql()},
pairs AS (
  SELECT * FROM (VALUES
    {", ".join(f"({i}, '{l}', '{r}')" for i, (l, r) in enumerate(_JOINS, start=1))}
  ) AS t(join_id, left_tbl, right_tbl))
SELECT CAST(p.join_id AS INT) AS join_id, p.left_tbl, p.right_tbl,
       l.est_bytes AS left_bytes, r.est_bytes AS right_bytes,
       CASE WHEN r.est_bytes <= {_BC_THRESH} THEN 'broadcast_right'
            WHEN r.est_bytes * {_SH_FACTOR} <= l.est_bytes
            THEN 'shuffled_hash' ELSE 'sort_merge' END AS strategy,
       CASE WHEN r.est_bytes <= {_BC_THRESH} THEN 0
            ELSE l.est_bytes + r.est_bytes END AS shuffle_bytes
FROM pairs p
JOIN stats l ON l.tbl = p.left_tbl
JOIN stats r ON r.tbl = p.right_tbl
"""


# ---------------------------------------------------------------------------
# mapside_combine_audit
# ---------------------------------------------------------------------------


def q_mapside_combine_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-agg payoff per synthetic map partition: events rows
    assigned to {_MC_PARTS} partitions by md5(event_id) (the portable
    hash), per partition rows in vs combiner rows out (distinct
    user_id), and the half-up micro reduction ratio.  Shuffle record
    width is 16 B (8 B key + 8 B sum payload) either way — the ratio
    IS the byte ratio.

    Scale: the audit is the partial-agg shape itself — one
    (partition, key) distinct count; nothing row-scaled leaves the
    map side in the real plan.
    """
    ev = _t(spark, sf_dir, "events").selectExpr(
        f"CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 4), 16, 10)"
        f" AS BIGINT) % {_MC_PARTS} AS part_id",
        "user_id",
    )
    return (
        ev.groupBy("part_id")
        .agg(
            F.count("*").cast("long").alias("rows_in"),
            F.countDistinct("user_id").cast("long").alias("rows_out"),
        )
        .selectExpr(
            "part_id",
            "rows_in",
            "rows_out",
            "rows_in * 16 AS bytes_no_combine",
            "rows_out * 16 AS bytes_combined",
            "CAST((2000000 * rows_out + rows_in) DIV (2 * rows_in)"
            " AS BIGINT) AS reduction_micro",
        )
    )


ORACLE_MAPSIDE_COMBINE_AUDIT = f"""
WITH ev AS (
  SELECT CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4)
              AS INT) AS BIGINT) % {_MC_PARTS} AS part_id,
         user_id
  FROM events)
SELECT part_id,
       CAST(count(*) AS BIGINT) AS rows_in,
       CAST(count(DISTINCT user_id) AS BIGINT) AS rows_out,
       CAST(count(*) * 16 AS BIGINT) AS bytes_no_combine,
       CAST(count(DISTINCT user_id) * 16 AS BIGINT) AS bytes_combined,
       CAST(CAST(2000000 * count(DISTINCT user_id) + count(*) AS HUGEINT)
            // CAST(2 * count(*) AS HUGEINT) AS BIGINT)
         AS reduction_micro
FROM ev GROUP BY part_id
"""


# ---------------------------------------------------------------------------
# partition_size_planner
# ---------------------------------------------------------------------------


def q_partition_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-size partitioning plan: ⌈bytes/{_PT_TARGET}⌉ partitions
    per table (never 0), rows per partition (ceil), and the residual
    last-partition fill ratio in micro.

    Scale: pure arithmetic over the 8-row stats frame.
    """
    return _stats(spark, sf_dir).selectExpr(
        "tbl",
        "n_rows",
        "est_bytes",
        f"CAST((est_bytes + {_PT_TARGET} - 1) DIV {_PT_TARGET} AS BIGINT)"
        " AS n_partitions",
    ).selectExpr(
        "tbl",
        "n_rows",
        "est_bytes",
        "n_partitions",
        "CAST((n_rows + n_partitions - 1) DIV n_partitions AS BIGINT)"
        " AS rows_per_partition",
        f"CAST((2000000 * (est_bytes - (n_partitions - 1) * {_PT_TARGET})"
        f" + {_PT_TARGET}) DIV (2 * {_PT_TARGET}) AS BIGINT)"
        " AS last_fill_micro",
    )


ORACLE_PARTITION_SIZE_PLANNER = f"""
WITH {_stats_sql()},
plan AS (
  SELECT tbl, n_rows, est_bytes,
         CAST((est_bytes + {_PT_TARGET} - 1) // {_PT_TARGET} AS BIGINT)
           AS n_partitions
  FROM stats)
SELECT tbl, n_rows, est_bytes, n_partitions,
       CAST((n_rows + n_partitions - 1) // n_partitions AS BIGINT)
         AS rows_per_partition,
       CAST(CAST(2000000 * (est_bytes - (n_partitions - 1) * {_PT_TARGET})
                 + {_PT_TARGET} AS HUGEINT)
            // CAST(2 * {_PT_TARGET} AS HUGEINT) AS BIGINT)
         AS last_fill_micro
FROM plan
"""


# ---------------------------------------------------------------------------
# bucketing_breakeven
# ---------------------------------------------------------------------------


def q_bucketing_breakeven(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketing amortization ledger for lineitem⋈orders: build cost =
    {_BK_BUILD_FACTOR}×(both sides' bytes) once; each bucketed join
    then shuffles 0 B where the unbucketed plan shuffles both sides.
    Rows k = 1..{_BK_K}: cumulative unbucketed vs bucketed cost,
    savings, and the breakeven flag.

    Scale: constant-size arithmetic over the broadcast stats frame.
    """
    stats = _stats(spark, sf_dir)
    li = stats.where("tbl = 'lineitem'").selectExpr(
        "est_bytes AS li_bytes"
    )
    od = stats.where("tbl = 'orders'").selectExpr(
        "est_bytes AS od_bytes"
    )
    ks = spark.range(1, _BK_K + 1).select(
        F.col("id").cast("int").alias("k")
    )
    return (
        ks.crossJoin(F.broadcast(li))
        .crossJoin(F.broadcast(od))
        .selectExpr(
            "k",
            "li_bytes + od_bytes AS shuffle_per_join",
            f"{_BK_BUILD_FACTOR} * (li_bytes + od_bytes) AS build_cost",
            "k * (li_bytes + od_bytes) AS unbucketed_cum",
            f"{_BK_BUILD_FACTOR} * (li_bytes + od_bytes) AS bucketed_cum",
            f"k * (li_bytes + od_bytes)"
            f" - {_BK_BUILD_FACTOR} * (li_bytes + od_bytes) AS savings",
            f"k >= {_BK_BUILD_FACTOR} AS amortized",
        )
    )


ORACLE_BUCKETING_BREAKEVEN = f"""
WITH {_stats_sql()},
li AS (SELECT est_bytes AS li_bytes FROM stats WHERE tbl = 'lineitem'),
od AS (SELECT est_bytes AS od_bytes FROM stats WHERE tbl = 'orders'),
ks AS (SELECT unnest(generate_series(1, {_BK_K})) AS k)
SELECT CAST(k AS INT) AS k,
       li_bytes + od_bytes AS shuffle_per_join,
       {_BK_BUILD_FACTOR} * (li_bytes + od_bytes) AS build_cost,
       k * (li_bytes + od_bytes) AS unbucketed_cum,
       {_BK_BUILD_FACTOR} * (li_bytes + od_bytes) AS bucketed_cum,
       k * (li_bytes + od_bytes)
         - {_BK_BUILD_FACTOR} * (li_bytes + od_bytes) AS savings,
       k >= {_BK_BUILD_FACTOR} AS amortized
FROM ks, li, od
"""


PLANNER_QUERIES = {
    "table_stats_bytes": q_table_stats_bytes,
    "join_strategy_planner": q_join_strategy_planner,
    "mapside_combine_audit": q_mapside_combine_audit,
    "partition_size_planner": q_partition_size_planner,
    "bucketing_breakeven": q_bucketing_breakeven,
}

PLANNER_ORACLES = {
    "table_stats_bytes": ORACLE_TABLE_STATS_BYTES,
    "join_strategy_planner": ORACLE_JOIN_STRATEGY_PLANNER,
    "mapside_combine_audit": ORACLE_MAPSIDE_COMBINE_AUDIT,
    "partition_size_planner": ORACLE_PARTITION_SIZE_PLANNER,
    "bucketing_breakeven": ORACLE_BUCKETING_BREAKEVEN,
}

_q.QUERIES.update(PLANNER_QUERIES)
_q.ORACLES.update(PLANNER_ORACLES)
