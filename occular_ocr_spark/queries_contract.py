"""Data-contract audit catalog, round 4 (wave 67): five operators
that profile the INTEGRITY SURFACE of the warehouse schema — the
audits a platform runs nightly over a 100 TB lake before anyone
trusts a join.  Complements the pass/fail gate
``data_quality_checks`` (queries_scale.py): these emit the full
audit TABLES a data contract is negotiated from, not a boolean.

* ``fk_orphan_audit`` — all {_N_FK} declared FKs of the schema:
  child rows, orphan rows (left-anti), half-up micro orphan rate.
* ``fk_fanout_profile`` — per FK the join-planner's cardinality
  facts: parent count, matched children, max fanout, avg fanout in
  micro, parents with zero children, and the 1:1 / 1:N class.
* ``key_uniqueness_audit`` — candidate primary keys incl. the
  composite (l_orderkey, l_linenumber): rows, NDV, duplicate rows,
  uniqueness flag.
* ``snapshot_stats_drift`` — events split at the exact median
  ((ts, event_id) total order) into early/late snapshots: per
  event_type counts, micro shares, and the absolute share drift —
  the per-cell table behind a PSI alarm.
* ``date_completeness_audit`` — partition-date coverage of events:
  distinct days vs the min→max span, missing days, max interior gap,
  half-up micro completeness — the audit behind partition-pruning
  trust.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_contract_wave.py.

Cross-engine float policy: exact integers end-to-end (timestamp comparisons never leave
the engines, dates via integer day arithmetic); rates are single
half-up micro divisions.

Scale notes: every FK audit is one shuffle anti-join or one
child-side partial agg joined to the parent key set (at 100 TB
neither side broadcasts — the join is the product, documented);
uniqueness is per-table NDV partial aggs; drift/completeness reduce
to ≤#event_types / ≤#days frames before any window.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_FKS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]
_N_FK = len(_FKS)

_KEYS = [
    ("region", "CAST(r_regionkey AS STRING)", "CAST(r_regionkey AS VARCHAR)"),
    ("nation", "CAST(n_nationkey AS STRING)", "CAST(n_nationkey AS VARCHAR)"),
    ("customer", "CAST(c_custkey AS STRING)", "CAST(c_custkey AS VARCHAR)"),
    ("supplier", "CAST(s_suppkey AS STRING)", "CAST(s_suppkey AS VARCHAR)"),
    ("part", "CAST(p_partkey AS STRING)", "CAST(p_partkey AS VARCHAR)"),
    ("orders", "CAST(o_orderkey AS STRING)", "CAST(o_orderkey AS VARCHAR)"),
    ("events", "CAST(event_id AS STRING)", "CAST(event_id AS VARCHAR)"),
    ("documents", "CAST(doc_id AS STRING)", "CAST(doc_id AS VARCHAR)"),
    (
        "lineitem",
        "concat(CAST(l_orderkey AS STRING), '|',"
        " CAST(l_linenumber AS STRING))",
        "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)",
    ),
]


# ---------------------------------------------------------------------------
# fk_orphan_audit
# ---------------------------------------------------------------------------


def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity map over all {_N_FK} FKs: child rows,
    left-anti orphan rows, half-up micro orphan rate.

    Scale: one anti-join per FK (shuffle on the key at 100 TB), each
    collapsing to a 1-row count — branches share nothing and
    schedule concurrently.
    """
    parts = []
    for child, fk, parent, pk in _FKS:
        ch = _t(spark, sf_dir, child)
        pa = _t(spark, sf_dir, parent).select(pk)
        total = ch.agg(F.count("*").cast("long").alias("child_rows"))
        orphans = (
            ch.join(pa, ch[fk] == pa[pk], "left_anti")
            .agg(F.count("*").cast("long").alias("orphan_rows"))
        )
        parts.append(
            total.crossJoin(orphans).selectExpr(
                f"'{child}.{fk}' AS fk",
                f"'{parent}.{pk}' AS references_key",
                "child_rows",
                "orphan_rows",
                "CAST((2000000 * orphan_rows + child_rows)"
                " DIV (2 * child_rows) AS BIGINT) AS orphan_micro",
            )
        )
    return reduce(DataFrame.unionAll, parts)


def _orphan_oracle() -> str:
    sels = []
    for child, fk, parent, pk in _FKS:
        sels.append(
            f"""
SELECT '{child}.{fk}' AS fk, '{parent}.{pk}' AS references_key,
       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS child_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pk} = c.{fk})) AS orphan_rows,
       CAST((2000000 * (SELECT count(*) FROM {child} c
                        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                          WHERE p.{pk} = c.{fk}))
             + (SELECT count(*) FROM {child}))
            // (2 * (SELECT count(*) FROM {child})) AS BIGINT)
         AS orphan_micro
"""
        )
    return " UNION ALL ".join(sels)


ORACLE_FK_ORPHAN_AUDIT = _orphan_oracle()


# ---------------------------------------------------------------------------
# fk_fanout_profile
# ---------------------------------------------------------------------------


def q_fk_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality facts per FK: parents, matched children, max
    fanout, avg fanout (micro, over ALL parents incl. childless),
    zero-child parents, and the 1:1 / 1:N class.

    Scale: child side pre-aggregates to NDV(fk) rows BEFORE joining
    the parent key set — the join input is counts, never raw
    children.
    """
    parts = []
    for child, fk, parent, pk in _FKS:
        counts = (
            _t(spark, sf_dir, child)
            .groupBy(fk)
            .agg(F.count("*").cast("long").alias("fan"))
        )
        pa = _t(spark, sf_dir, parent).select(pk)
        per_parent = pa.join(
            counts, pa[pk] == counts[fk], "left"
        ).selectExpr("coalesce(fan, 0L) AS fan")
        parts.append(
            per_parent.agg(
                F.count("*").cast("long").alias("n_parents"),
                F.sum("fan").cast("long").alias("matched_children"),
                F.max("fan").cast("long").alias("max_fanout"),
                F.sum(F.expr("CASE WHEN fan = 0 THEN 1 ELSE 0 END"))
                .cast("long")
                .alias("zero_child_parents"),
            ).selectExpr(
                f"'{child}.{fk}' AS fk",
                "n_parents",
                "matched_children",
                "max_fanout",
                "zero_child_parents",
                "CAST((2000000 * matched_children + n_parents)"
                " DIV (2 * n_parents) AS BIGINT) AS avg_fanout_micro",
                "CASE WHEN max_fanout <= 1 THEN '1:1' ELSE '1:N' END"
                " AS relationship",
            )
        )
    return reduce(DataFrame.unionAll, parts)


def _fanout_oracle() -> str:
    sels = []
    for child, fk, parent, pk in _FKS:
        sels.append(
            f"""
SELECT '{child}.{fk}' AS fk,
       CAST(count(*) AS BIGINT) AS n_parents,
       CAST(sum(fan) AS BIGINT) AS matched_children,
       CAST(max(fan) AS BIGINT) AS max_fanout,
       CAST(sum(CASE WHEN fan = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS zero_child_parents,
       CAST((2000000 * sum(fan) + count(*)) // (2 * count(*)) AS BIGINT)
         AS avg_fanout_micro,
       CASE WHEN max(fan) <= 1 THEN '1:1' ELSE '1:N' END AS relationship
FROM (
  SELECT coalesce(c.fan, 0) AS fan
  FROM {parent} p LEFT JOIN (
    SELECT {fk} AS k, CAST(count(*) AS BIGINT) AS fan
    FROM {child} GROUP BY {fk}) c ON c.k = p.{pk})
"""
        )
    return " UNION ALL ".join(sels)


ORACLE_FK_FANOUT_PROFILE = _fanout_oracle()


# ---------------------------------------------------------------------------
# key_uniqueness_audit
# ---------------------------------------------------------------------------


def q_key_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key audit: rows vs NDV vs duplicate rows per
    declared key (incl. the lineitem composite).

    Scale: one partial-agg NDV pass per table.
    """
    parts = []
    for tbl, sexpr, _oexpr in _KEYS:
        parts.append(
            _t(spark, sf_dir, tbl)
            .selectExpr(f"{sexpr} AS k")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.countDistinct("k").cast("long").alias("ndv"),
            )
            .selectExpr(
                f"'{tbl}' AS tbl",
                "n_rows",
                "ndv",
                "n_rows - ndv AS dup_rows",
                "n_rows = ndv AS is_unique",
            )
        )
    return reduce(DataFrame.unionAll, parts)


def _unique_oracle() -> str:
    sels = []
    for tbl, _sexpr, oexpr in _KEYS:
        sels.append(
            f"""
SELECT '{tbl}' AS tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {oexpr}) AS BIGINT) AS ndv,
       CAST(count(*) - count(DISTINCT {oexpr}) AS BIGINT) AS dup_rows,
       count(*) = count(DISTINCT {oexpr}) AS is_unique
FROM {tbl}
"""
        )
    return " UNION ALL ".join(sels)


ORACLE_KEY_UNIQUENESS_AUDIT = _unique_oracle()


# ---------------------------------------------------------------------------
# snapshot_stats_drift
# ---------------------------------------------------------------------------


def q_snapshot_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early/late split at the exact median event ((ts, event_id)
    total order): per event_type counts, micro shares of each half, and
    the absolute share drift.

    Scale: the median is a rank pick (two-level idiom at 10^12 rows);
    the drift table is one partial agg to #event_types rows.
    """
    ev = _q._persist_tracked(
        _t(spark, sf_dir, "events").selectExpr(
            "event_id", "event_type", "ts"
        )
    )
    cut = (
        ev.selectExpr(
            "ts",
            "event_id",
            "row_number() OVER (ORDER BY ts, event_id) AS rk",
            "count(*) OVER () AS n",
        )
        .where("rk = (n + 1) DIV 2")
        .selectExpr("ts AS cut_ts", "event_id AS cut_id")
    )
    flagged = ev.crossJoin(F.broadcast(cut)).selectExpr(
        "event_type",
        "CASE WHEN ts < cut_ts OR (ts = cut_ts AND event_id <= cut_id)"
        " THEN 1 ELSE 0 END AS early",
    )
    per = flagged.groupBy("event_type").agg(
        F.sum("early").cast("long").alias("n_early"),
        F.sum(F.expr("1 - early")).cast("long").alias("n_late"),
    )
    tot = flagged.agg(
        F.sum("early").cast("long").alias("te"),
        F.sum(F.expr("1 - early")).cast("long").alias("tl"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type",
            "n_early",
            "n_late",
            "CAST((2000000 * n_early + te) DIV (2 * te) AS BIGINT)"
            " AS share_early_micro",
            "CAST((2000000 * n_late + tl) DIV (2 * tl) AS BIGINT)"
            " AS share_late_micro",
        )
        .selectExpr(
            "event_type",
            "n_early",
            "n_late",
            "share_early_micro",
            "share_late_micro",
            "abs(share_early_micro - share_late_micro) AS drift_micro",
        )
    )


ORACLE_SNAPSHOT_STATS_DRIFT = """
WITH ev AS (
  SELECT event_id, event_type, ts FROM events),
cut AS (
  SELECT ts AS cut_ts, event_id AS cut_id FROM (
    SELECT ts, event_id,
           row_number() OVER (ORDER BY ts, event_id) AS rk,
           count(*) OVER () AS n
    FROM ev) WHERE rk = (n + 1) // 2),
flagged AS (
  SELECT e.event_type,
         CASE WHEN e.ts < c.cut_ts
                   OR (e.ts = c.cut_ts AND e.event_id <= c.cut_id)
              THEN 1 ELSE 0 END AS early
  FROM ev e CROSS JOIN cut c),
per AS (
  SELECT event_type,
         CAST(sum(early) AS BIGINT) AS n_early,
         CAST(sum(1 - early) AS BIGINT) AS n_late
  FROM flagged GROUP BY event_type),
tot AS (
  SELECT CAST(sum(early) AS BIGINT) AS te,
         CAST(sum(1 - early) AS BIGINT) AS tl
  FROM flagged),
shares AS (
  SELECT p.event_type, p.n_early, p.n_late,
         CAST((2000000 * p.n_early + t.te) // (2 * t.te) AS BIGINT)
           AS share_early_micro,
         CAST((2000000 * p.n_late + t.tl) // (2 * t.tl) AS BIGINT)
           AS share_late_micro
  FROM per p CROSS JOIN tot t)
SELECT event_type, n_early, n_late, share_early_micro, share_late_micro,
       abs(share_early_micro - share_late_micro) AS drift_micro
FROM shares
"""


# ---------------------------------------------------------------------------
# date_completeness_audit
# ---------------------------------------------------------------------------


def q_date_completeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-date coverage of events: distinct days, min→max span
    (inclusive), missing days, max interior gap, half-up micro
    completeness.

    Scale: one distinct-day partial agg (≤ span rows), one lag window
    over that bounded day frame.
    """
    days = _q._persist_tracked(
        _t(spark, sf_dir, "events")
        .selectExpr("CAST(ts AS DATE) AS d")
        .distinct()
    )
    gaps = days.selectExpr(
        "d", "lag(d) OVER (ORDER BY d) AS prev_d"
    ).selectExpr(
        "CASE WHEN prev_d IS NULL THEN 0"
        " ELSE datediff(d, prev_d) - 1 END AS gap"
    )
    agg = days.agg(
        F.count("*").cast("long").alias("n_days"),
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
    )
    mg = gaps.agg(F.max("gap").cast("long").alias("max_gap_days"))
    return (
        agg.crossJoin(mg)
        .selectExpr(
            "n_days",
            "CAST(first_day AS STRING) AS first_day",
            "CAST(last_day AS STRING) AS last_day",
            "CAST(datediff(last_day, first_day) + 1 AS BIGINT)"
            " AS span_days",
            "max_gap_days",
        )
        .selectExpr(
            "n_days",
            "first_day",
            "last_day",
            "span_days",
            "span_days - n_days AS missing_days",
            "max_gap_days",
            "CAST((2000000 * n_days + span_days) DIV (2 * span_days)"
            " AS BIGINT) AS completeness_micro",
        )
    )


ORACLE_DATE_COMPLETENESS_AUDIT = """
WITH days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
gaps AS (
  SELECT CASE WHEN lag(d) OVER (ORDER BY d) IS NULL THEN 0
              ELSE (d - lag(d) OVER (ORDER BY d)) - 1 END AS gap
  FROM days),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         min(d) AS first_day, max(d) AS last_day
  FROM days),
mg AS (SELECT CAST(max(gap) AS BIGINT) AS max_gap_days FROM gaps)
SELECT a.n_days,
       CAST(a.first_day AS VARCHAR) AS first_day,
       CAST(a.last_day AS VARCHAR) AS last_day,
       CAST((a.last_day - a.first_day) + 1 AS BIGINT) AS span_days,
       CAST((a.last_day - a.first_day) + 1 AS BIGINT) - a.n_days
         AS missing_days,
       m.max_gap_days,
       CAST((2000000 * a.n_days + ((a.last_day - a.first_day) + 1))
            // (2 * ((a.last_day - a.first_day) + 1)) AS BIGINT)
         AS completeness_micro
FROM agg a CROSS JOIN mg m
"""


CONTRACT_QUERIES = {
    "fk_orphan_audit": q_fk_orphan_audit,
    "fk_fanout_profile": q_fk_fanout_profile,
    "key_uniqueness_audit": q_key_uniqueness_audit,
    "snapshot_stats_drift": q_snapshot_stats_drift,
    "date_completeness_audit": q_date_completeness_audit,
}

CONTRACT_ORACLES = {
    "fk_orphan_audit": ORACLE_FK_ORPHAN_AUDIT,
    "fk_fanout_profile": ORACLE_FK_FANOUT_PROFILE,
    "key_uniqueness_audit": ORACLE_KEY_UNIQUENESS_AUDIT,
    "snapshot_stats_drift": ORACLE_SNAPSHOT_STATS_DRIFT,
    "date_completeness_audit": ORACLE_DATE_COMPLETENESS_AUDIT,
}

_q.QUERIES.update(CONTRACT_QUERIES)
_q.ORACLES.update(CONTRACT_ORACLES)
