"""Shuffle-engineering catalog, round 4 (wave 65): five operators
that compute, from the data itself, the skew/salting/bucketing
decisions a 100 TB Spark job makes before its biggest exchanges —
the quantitative companions to the wave-61 CBO planners.  The
portable partitioner everywhere is ``conv(md5(key)[0:4], 16, 10) %
P`` so both engines (and any executor) agree bit-for-bit.

* ``skew_salt_planner`` — per hot key (events.user_id): row count,
  the salt factor ⌈rows / {_SALT_TARGET}⌉ an explicit salted
  repartition would use, and the post-salt max task rows — the
  decision table behind ``skew_join_salted``.
* ``aqe_skew_split_audit`` — replay of AQE's skewed-partition rule
  over {_AQE_PARTS} hash partitions: per-partition rows, the lower
  median, threshold = max({_AQE_FACTOR}×median, {_AQE_MIN}), the
  skew flag, and how many splits AQE would cut.
* ``groupby_key_planner`` — for the three candidate groupBy keys
  (user_id / event_type / both): global NDV, map-side combine output
  rows (Σ per-partition NDV over {_GB_PARTS} synthetic map
  partitions), and the half-up micro shuffle-reduction ratio — which
  key choices actually benefit from partial aggregation.
* ``bucket_colocate_audit`` — bucket balance for B ∈ {_BK_BUCKETS}:
  max bucket rows vs the B×max/total balance ratio, plus the exact
  shuffle bytes (16 B/record both sides) a co-located bucketed join
  avoids.
* ``shuffle_spill_estimator`` — reducer-side memory audit for P ∈
  {_SP_PARTS}: per-partition modeled bytes vs an {_SP_BUDGET} B
  executor budget → spilled partitions, spill bytes, spill ratio —
  the shuffle.partitions sizing rule as arithmetic.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_shuffle_wave.py.

Cross-engine float policy: exact integers end-to-end; ratios are
single half-up micro divisions.

Scale notes: every entry is one partial-agg scan collapsing to
#keys/#partitions/#buckets rows — these audits are strictly cheaper
than the shuffles they plan; the byte model (16 B/record) is the
same documented constant as ``mapside_combine_audit``.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_SALT_TARGET = 64
_AQE_PARTS = 8
_AQE_FACTOR = 5
_AQE_MIN = 128
_GB_PARTS = 32
_BK_BUCKETS = [8, 16, 32]
_SP_PARTS = [8, 32]
_SP_BUDGET = 1024


def _pmod_spark(col: str, p: int) -> str:
    return (
        f"CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 4), 16, 10)"
        f" AS BIGINT) % {p}"
    )


def _pmod_sql(col: str, p: int) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4)"
        f" AS INT) AS BIGINT) % {p}"
    )


# ---------------------------------------------------------------------------
# skew_salt_planner
# ---------------------------------------------------------------------------


def q_skew_salt_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key salt decision: salt = ⌈rows/{_SALT_TARGET}⌉, post-salt
    max task rows = ⌈rows/salt⌉.

    Scale: one partial-agg groupBy to #keys rows.
    """
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .selectExpr(
            "user_id",
            "n_rows",
            f"CAST((n_rows + {_SALT_TARGET} - 1) DIV {_SALT_TARGET}"
            " AS BIGINT) AS salt_factor",
        )
        .selectExpr(
            "user_id",
            "n_rows",
            "salt_factor",
            "CAST((n_rows + salt_factor - 1) DIV salt_factor AS BIGINT)"
            " AS max_task_rows",
        )
    )


ORACLE_SKEW_SALT_PLANNER = f"""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY user_id),
plan AS (
  SELECT user_id, n_rows,
         CAST((n_rows + {_SALT_TARGET} - 1) // {_SALT_TARGET} AS BIGINT)
           AS salt_factor
  FROM counts)
SELECT user_id, n_rows, salt_factor,
       CAST((n_rows + salt_factor - 1) // salt_factor AS BIGINT)
         AS max_task_rows
FROM plan
"""


# ---------------------------------------------------------------------------
# aqe_skew_split_audit
# ---------------------------------------------------------------------------


def q_aqe_skew_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew rule over {_AQE_PARTS} portable-hash partitions:
    skewed iff rows > max({_AQE_FACTOR}×median, {_AQE_MIN}); a skewed
    partition splits into ⌈rows/max(median, 1)⌉ tasks.

    Scale: partition sizes are one partial agg; the median is a rank
    pick over the {_AQE_PARTS}-row frame.
    """
    sizes = _q._persist_tracked(
        _t(spark, sf_dir, "events")
        .selectExpr(f"{_pmod_spark('user_id', _AQE_PARTS)} AS part_id")
        .groupBy("part_id")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    med = (
        sizes.selectExpr(
            "n_rows",
            "row_number() OVER (ORDER BY n_rows, part_id) AS rk",
            "count(*) OVER () AS np",
        )
        .where("rk = (np + 1) DIV 2")
        .selectExpr("n_rows AS median_rows")
    )
    return (
        sizes.crossJoin(F.broadcast(med))
        .selectExpr(
            "part_id",
            "n_rows",
            "median_rows",
            f"greatest({_AQE_FACTOR} * median_rows, {_AQE_MIN}L)"
            " AS threshold",
        )
        .selectExpr(
            "part_id",
            "n_rows",
            "median_rows",
            "threshold",
            "n_rows > threshold AS is_skewed",
            "CASE WHEN n_rows > threshold THEN"
            " CAST((n_rows + greatest(median_rows, 1L) - 1)"
            " DIV greatest(median_rows, 1L) AS BIGINT)"
            " ELSE 1 END AS n_splits",
        )
    )


ORACLE_AQE_SKEW_SPLIT_AUDIT = f"""
WITH sizes AS (
  SELECT {_pmod_sql('user_id', _AQE_PARTS)} AS part_id,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1),
med AS (
  SELECT n_rows AS median_rows FROM (
    SELECT n_rows,
           row_number() OVER (ORDER BY n_rows, part_id) AS rk,
           count(*) OVER () AS np
    FROM sizes) WHERE rk = (np + 1) // 2),
flagged AS (
  SELECT s.part_id, s.n_rows, m.median_rows,
         greatest({_AQE_FACTOR} * m.median_rows,
                  CAST({_AQE_MIN} AS BIGINT)) AS threshold
  FROM sizes s CROSS JOIN med m)
SELECT part_id, n_rows, median_rows, threshold,
       n_rows > threshold AS is_skewed,
       CASE WHEN n_rows > threshold THEN
         CAST((n_rows + greatest(median_rows, 1) - 1)
              // greatest(median_rows, 1) AS BIGINT)
       ELSE 1 END AS n_splits
FROM flagged
"""


# ---------------------------------------------------------------------------
# groupby_key_planner
# ---------------------------------------------------------------------------

_GB_KEYS = [
    ("user_id", "CAST(user_id AS STRING)", "CAST(user_id AS VARCHAR)"),
    ("event_type", "event_type", "event_type"),
    (
        "user_id,event_type",
        "concat(CAST(user_id AS STRING), '|', event_type)",
        "CAST(user_id AS VARCHAR) || '|' || event_type",
    ),
]


def q_groupby_key_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-agg payoff per candidate groupBy key: global NDV,
    map-side combine output rows (Σ per-partition NDV over
    {_GB_PARTS} synthetic partitions of md5(event_id)), half-up micro
    shuffle reduction.

    Scale: per key choice one (partition, key)-distinct partial agg —
    the audit IS the combine it measures.
    """
    ev = _t(spark, sf_dir, "events")
    parts = []
    for name, sexpr, _oexpr in _GB_KEYS:
        base = ev.selectExpr(
            f"{_pmod_spark('event_id', _GB_PARTS)} AS part_id",
            f"{sexpr} AS k",
        )
        per_part = (
            base.groupBy("part_id")
            .agg(F.countDistinct("k").cast("long").alias("ndv_p"))
            .agg(
                F.sum("ndv_p").cast("long").alias("combine_out_rows"),
            )
        )
        glob = base.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("k").cast("long").alias("ndv"),
        )
        parts.append(
            glob.crossJoin(per_part).selectExpr(
                f"'{name}' AS key_choice",
                "n_rows",
                "ndv",
                "combine_out_rows",
                "CAST((2000000 * combine_out_rows + n_rows)"
                " DIV (2 * n_rows) AS BIGINT) AS reduction_micro",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _gb_oracle() -> str:
    sels = []
    for name, _sexpr, oexpr in _GB_KEYS:
        sels.append(
            f"""
SELECT '{name}' AS key_choice,
       (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,
       (SELECT CAST(count(DISTINCT {oexpr}) AS BIGINT) FROM events) AS ndv,
       (SELECT CAST(sum(ndv_p) AS BIGINT) FROM (
          SELECT CAST(count(DISTINCT {oexpr}) AS BIGINT) AS ndv_p
          FROM events
          GROUP BY {_pmod_sql('event_id', _GB_PARTS)})) AS combine_out_rows,
       (SELECT CAST((2000000 * sum(ndv_p) +
                     (SELECT count(*) FROM events))
                    // (2 * (SELECT count(*) FROM events)) AS BIGINT)
        FROM (
          SELECT CAST(count(DISTINCT {oexpr}) AS BIGINT) AS ndv_p
          FROM events
          GROUP BY {_pmod_sql('event_id', _GB_PARTS)})) AS reduction_micro
"""
        )
    return " UNION ALL ".join(sels)


ORACLE_GROUPBY_KEY_PLANNER = _gb_oracle()


# ---------------------------------------------------------------------------
# bucket_colocate_audit
# ---------------------------------------------------------------------------


def q_bucket_colocate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-count balance for B ∈ {_BK_BUCKETS}: max bucket rows,
    B·max/total balance (1.0 = perfect) in half-up micro, and the
    exact shuffle bytes a co-located bucketed join avoids (16 B ×
    (fact rows + distinct dim keys)).

    Scale: per B one partial agg to B rows; the distinct-key side is
    one NDV agg.
    """
    ev = _t(spark, sf_dir, "events")
    parts = []
    for b in _BK_BUCKETS:
        sizes = (
            ev.selectExpr(f"{_pmod_spark('user_id', b)} AS bucket")
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_rows"))
        )
        agg = sizes.agg(
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.max("n_rows").cast("long").alias("max_bucket_rows"),
        )
        dims = ev.agg(
            F.countDistinct("user_id").cast("long").alias("n_keys")
        )
        parts.append(
            agg.crossJoin(dims).selectExpr(
                f"{b} AS n_buckets",
                "total_rows",
                "max_bucket_rows",
                f"CAST((2000000 * {b} * max_bucket_rows + total_rows)"
                " DIV (2 * total_rows) AS BIGINT) AS balance_micro",
                "16 * (total_rows + n_keys) AS shuffle_bytes_avoided",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _bk_oracle() -> str:
    sels = []
    for b in _BK_BUCKETS:
        sels.append(
            f"""
SELECT {b} AS n_buckets,
       CAST(sum(n_rows) AS BIGINT) AS total_rows,
       CAST(max(n_rows) AS BIGINT) AS max_bucket_rows,
       CAST((2000000 * {b} * max(n_rows) + sum(n_rows))
            // (2 * sum(n_rows)) AS BIGINT) AS balance_micro,
       16 * (CAST(sum(n_rows) AS BIGINT) +
             (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events))
         AS shuffle_bytes_avoided
FROM (
  SELECT {_pmod_sql('user_id', b)} AS bucket,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1)
"""
        )
    return " UNION ALL ".join(sels)


ORACLE_BUCKET_COLOCATE_AUDIT = _bk_oracle()


# ---------------------------------------------------------------------------
# shuffle_spill_estimator
# ---------------------------------------------------------------------------


def q_shuffle_spill_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reducer memory audit per shuffle.partitions choice P ∈
    {_SP_PARTS}: modeled partition bytes (16 B/record) vs the
    {_SP_BUDGET} B budget → spilled partitions, spill bytes, half-up
    micro spill ratio.

    Scale: one partial agg to P rows per choice; the budget is the
    fixture-scaled stand-in for executor shuffle memory.
    """
    ev = _t(spark, sf_dir, "events")
    parts = []
    for p in _SP_PARTS:
        sizes = (
            ev.selectExpr(f"{_pmod_spark('user_id', p)} AS part_id")
            .groupBy("part_id")
            .agg(F.expr("16 * count(*)").cast("long").alias("bytes"))
        )
        parts.append(
            sizes.agg(
                F.lit(p).cast("int").alias("n_partitions"),
                F.sum("bytes").cast("long").alias("total_bytes"),
                F.sum(
                    F.expr(
                        f"CASE WHEN bytes > {_SP_BUDGET} THEN 1 ELSE 0 END"
                    )
                ).cast("long").alias("spilled_partitions"),
                F.sum(
                    F.expr(f"greatest(bytes - {_SP_BUDGET}, 0L)")
                ).cast("long").alias("spill_bytes"),
            ).selectExpr(
                "n_partitions",
                "total_bytes",
                "spilled_partitions",
                "spill_bytes",
                "CAST((2000000 * spill_bytes + total_bytes)"
                " DIV (2 * total_bytes) AS BIGINT) AS spill_ratio_micro",
            )
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionAll(q)
    return out


def _sp_oracle() -> str:
    sels = []
    for p in _SP_PARTS:
        sels.append(
            f"""
SELECT CAST({p} AS INT) AS n_partitions,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(sum(CASE WHEN bytes > {_SP_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS spilled_partitions,
       CAST(sum(greatest(bytes - {_SP_BUDGET}, 0)) AS BIGINT)
         AS spill_bytes,
       CAST((2000000 * sum(greatest(bytes - {_SP_BUDGET}, 0))
             + sum(bytes)) // (2 * sum(bytes)) AS BIGINT)
         AS spill_ratio_micro
FROM (
  SELECT {_pmod_sql('user_id', p)} AS part_id,
         16 * CAST(count(*) AS BIGINT) AS bytes
  FROM events GROUP BY 1)
"""
        )
    return " UNION ALL ".join(sels)


ORACLE_SHUFFLE_SPILL_ESTIMATOR = _sp_oracle()


SHUFFLE_QUERIES = {
    "skew_salt_planner": q_skew_salt_planner,
    "aqe_skew_split_audit": q_aqe_skew_split_audit,
    "groupby_key_planner": q_groupby_key_planner,
    "bucket_colocate_audit": q_bucket_colocate_audit,
    "shuffle_spill_estimator": q_shuffle_spill_estimator,
}

SHUFFLE_ORACLES = {
    "skew_salt_planner": ORACLE_SKEW_SALT_PLANNER,
    "aqe_skew_split_audit": ORACLE_AQE_SKEW_SPLIT_AUDIT,
    "groupby_key_planner": ORACLE_GROUPBY_KEY_PLANNER,
    "bucket_colocate_audit": ORACLE_BUCKET_COLOCATE_AUDIT,
    "shuffle_spill_estimator": ORACLE_SHUFFLE_SPILL_ESTIMATOR,
}

_q.QUERIES.update(SHUFFLE_QUERIES)
_q.ORACLES.update(SHUFFLE_ORACLES)
