"""Algebraic-identity catalog, round 4 (wave 73): five certification
operators that verify, ON THE DATA, the rewrite identities a
cost-based optimizer silently relies on at 100 TB — semi-join
rewrites, outer-join decomposition, aggregate pushdown, filter/union
algebra, and partial-aggregation associativity.  Each entry computes
every side of its identity independently and emits the components
plus a ``matches`` flag: a regression in any rewrite path shows up as
a FALSE in a 1-row table (and a value-hash mismatch against the
oracle).

* ``semijoin_rewrite_equiv`` — σ-IN ≡ σ-EXISTS ≡ distinct-inner-join
  for orders restricted to customers with c_acctbal > {_ACCTBAL}.
* ``outer_join_decomposition`` — FULL OUTER(customer, orders) row
  count ≡ inner + left-anti + right-anti, all four measured
  separately.
* ``agg_pushdown_equiv`` — Σ quantity by customer: join-then-agg vs
  agg-below-join (partial agg pushed under the join), totals and
  per-group-difference count.
* ``filter_union_equiv`` — |σ_A ∪ σ_B| ≡ |A| + |B| - |A∧B|
  (inclusion-exclusion) for overlapping order predicates.
* ``rollup_consistency`` — Σ at three rollup granularities
  (grand / per-status / per-(status, priority)) must agree — the
  map-side-combine associativity property as a certified fact.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_identities_wave.py.

Cross-engine float policy: counts and BIGINT-cast integer quantity
sums only — no float reaches any output.

Scale notes: every side of every identity is itself a scale-correct
plan (anti-joins shuffle on the key, the pushdown side pre-aggregates
to NDV rows before joining); the certification overhead is the cost
of running both sides, which is exactly what a plan-regression canary
pays.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_ACCTBAL = 5000


# ---------------------------------------------------------------------------
# semijoin_rewrite_equiv
# ---------------------------------------------------------------------------


def q_semijoin_rewrite_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three semi-join spellings of the same restriction must count
    identically: LEFT SEMI join, EXISTS-style semi via join, and
    inner join against the DISTINCT key set."""
    o = _t(spark, sf_dir, "orders")
    rich = _t(spark, sf_dir, "customer").where(
        f"c_acctbal > {_ACCTBAL}"
    ).select("c_custkey")
    semi = o.join(rich, o.o_custkey == rich.c_custkey, "left_semi").agg(
        F.count("*").cast("long").alias("n_semi")
    )
    # distinct-inner spelling (the rewrite an optimizer may choose)
    inner = (
        o.join(rich.distinct(), o.o_custkey == F.col("c_custkey"))
        .agg(F.count("*").cast("long").alias("n_inner_distinct"))
    )
    # anti complement: semi + anti must partition the table
    anti = o.join(rich, o.o_custkey == rich.c_custkey, "left_anti").agg(
        F.count("*").cast("long").alias("n_anti")
    )
    total = o.agg(F.count("*").cast("long").alias("n_orders"))
    return (
        semi.crossJoin(inner)
        .crossJoin(anti)
        .crossJoin(total)
        .selectExpr(
            "n_orders",
            "n_semi",
            "n_inner_distinct",
            "n_anti",
            "n_semi = n_inner_distinct"
            " AND n_semi + n_anti = n_orders AS matches",
        )
    )


ORACLE_SEMIJOIN_REWRITE_EQUIV = f"""
WITH rich AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {_ACCTBAL}),
semi_cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_semi FROM orders o
  WHERE o.o_custkey IN (SELECT c_custkey FROM rich)),
inn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_inner_distinct
  FROM orders o JOIN (SELECT DISTINCT c_custkey FROM rich) r
    ON r.c_custkey = o.o_custkey),
anti_cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_anti FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM rich r
                    WHERE r.c_custkey = o.o_custkey)),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders)
SELECT t.n_orders, s.n_semi, i.n_inner_distinct, a.n_anti,
       s.n_semi = i.n_inner_distinct
         AND s.n_semi + a.n_anti = t.n_orders AS matches
FROM semi_cnt s CROSS JOIN inn i CROSS JOIN anti_cnt a CROSS JOIN total t
"""


# ---------------------------------------------------------------------------
# outer_join_decomposition
# ---------------------------------------------------------------------------


def q_outer_join_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL OUTER row count = inner + left-anti + right-anti, each
    side measured by its own plan."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    full = c.join(o, c.c_custkey == o.o_custkey, "full_outer").agg(
        F.count("*").cast("long").alias("n_full")
    )
    inner = c.join(o, c.c_custkey == o.o_custkey).agg(
        F.count("*").cast("long").alias("n_inner")
    )
    lanti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count("*").cast("long").alias("n_left_only")
    )
    ranti = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count("*").cast("long").alias("n_right_only")
    )
    return (
        full.crossJoin(inner)
        .crossJoin(lanti)
        .crossJoin(ranti)
        .selectExpr(
            "n_full",
            "n_inner",
            "n_left_only",
            "n_right_only",
            "n_full = n_inner + n_left_only + n_right_only AS matches",
        )
    )


ORACLE_OUTER_JOIN_DECOMPOSITION = """
WITH full_j AS (
  SELECT CAST(count(*) AS BIGINT) AS n_full
  FROM customer c FULL OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey),
inner_j AS (
  SELECT CAST(count(*) AS BIGINT) AS n_inner
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
lo AS (
  SELECT CAST(count(*) AS BIGINT) AS n_left_only FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey)),
ro AS (
  SELECT CAST(count(*) AS BIGINT) AS n_right_only FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey))
SELECT f.n_full, i.n_inner, l.n_left_only, r.n_right_only,
       f.n_full = i.n_inner + l.n_left_only + r.n_right_only AS matches
FROM full_j f CROSS JOIN inner_j i CROSS JOIN lo l CROSS JOIN ro r
"""


# ---------------------------------------------------------------------------
# agg_pushdown_equiv
# ---------------------------------------------------------------------------


def q_agg_pushdown_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Σ l_quantity per customer two ways: join orders⋈lineitem then
    aggregate, vs aggregate lineitem to per-order sums first and join
    the small side (the pushdown an optimizer wants).  Totals must be
    identical and zero per-customer rows may differ."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "CAST(l_quantity AS BIGINT) AS qty"
    )
    plan_a = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("qty").cast("long").alias("qa"))
    )
    pushed = li.groupBy("l_orderkey").agg(
        F.sum("qty").cast("long").alias("oq")
    )
    plan_b = (
        o.join(pushed, o.o_orderkey == pushed.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("oq").cast("long").alias("qb"))
    )
    joined = plan_a.join(plan_b, "o_custkey", "full_outer").selectExpr(
        "coalesce(qa, -1) AS qa", "coalesce(qb, -1) AS qb"
    )
    return joined.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.expr("CASE WHEN qa <> qb THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_diff"),
        F.sum(F.expr("CASE WHEN qa >= 0 THEN qa ELSE 0 END"))
        .cast("long")
        .alias("total_a"),
        F.sum(F.expr("CASE WHEN qb >= 0 THEN qb ELSE 0 END"))
        .cast("long")
        .alias("total_b"),
    ).selectExpr(
        "n_customers",
        "n_diff",
        "total_a",
        "total_b",
        "n_diff = 0 AND total_a = total_b AS matches",
    )


ORACLE_AGG_PUSHDOWN_EQUIV = """
WITH a AS (
  SELECT o.o_custkey, CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
    AS qa
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey),
pushed AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
    AS oq
  FROM lineitem GROUP BY l_orderkey),
b AS (
  SELECT o.o_custkey, CAST(sum(p.oq) AS BIGINT) AS qb
  FROM orders o JOIN pushed p ON p.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey),
j AS (
  SELECT coalesce(a.qa, -1) AS qa, coalesce(b.qb, -1) AS qb
  FROM a FULL OUTER JOIN b ON b.o_custkey = a.o_custkey)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN qa <> qb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_diff,
       CAST(sum(CASE WHEN qa >= 0 THEN qa ELSE 0 END) AS BIGINT)
         AS total_a,
       CAST(sum(CASE WHEN qb >= 0 THEN qb ELSE 0 END) AS BIGINT)
         AS total_b,
       sum(CASE WHEN qa <> qb THEN 1 ELSE 0 END) = 0
         AND sum(CASE WHEN qa >= 0 THEN qa ELSE 0 END)
           = sum(CASE WHEN qb >= 0 THEN qb ELSE 0 END) AS matches
FROM j
"""


# ---------------------------------------------------------------------------
# filter_union_equiv
# ---------------------------------------------------------------------------

_PRED_A = "o_orderstatus = 'F'"
_PRED_B = "o_orderpriority = '1-URGENT'"


def q_filter_union_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ(A∨B) vs inclusion-exclusion: |A∨B| = |A| + |B| - |A∧B|,
    each side its own scan-level filter."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.agg(
            F.sum(F.expr(f"CASE WHEN {_PRED_A} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_a"),
            F.sum(F.expr(f"CASE WHEN {_PRED_B} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_b"),
            F.sum(
                F.expr(
                    f"CASE WHEN ({_PRED_A}) AND ({_PRED_B})"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_ab"),
            F.sum(
                F.expr(
                    f"CASE WHEN ({_PRED_A}) OR ({_PRED_B})"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_or"),
        )
        .selectExpr(
            "n_a",
            "n_b",
            "n_ab",
            "n_or",
            "n_or = n_a + n_b - n_ab AS matches",
        )
    )


ORACLE_FILTER_UNION_EQUIV = f"""
SELECT CAST(sum(CASE WHEN {_PRED_A} THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(sum(CASE WHEN {_PRED_B} THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       CAST(sum(CASE WHEN ({_PRED_A}) AND ({_PRED_B}) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ab,
       CAST(sum(CASE WHEN ({_PRED_A}) OR ({_PRED_B}) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_or,
       sum(CASE WHEN ({_PRED_A}) OR ({_PRED_B}) THEN 1 ELSE 0 END)
         = sum(CASE WHEN {_PRED_A} THEN 1 ELSE 0 END)
           + sum(CASE WHEN {_PRED_B} THEN 1 ELSE 0 END)
           - sum(CASE WHEN ({_PRED_A}) AND ({_PRED_B}) THEN 1 ELSE 0 END)
         AS matches
FROM orders
"""


# ---------------------------------------------------------------------------
# rollup_consistency
# ---------------------------------------------------------------------------


def q_rollup_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-agg associativity: the grand total, the sum of
    per-status totals, and the sum of per-(status, priority) totals
    must be one number."""
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus", "o_orderpriority", "1 AS one"
    )
    grand = o.agg(F.sum("one").cast("long").alias("grand"))
    l1 = (
        o.groupBy("o_orderstatus")
        .agg(F.sum("one").alias("c"))
        .agg(F.sum("c").cast("long").alias("sum_level1"))
    )
    l2 = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.sum("one").alias("c"))
        .agg(
            F.sum("c").cast("long").alias("sum_level2"),
            F.count("*").cast("long").alias("n_groups_level2"),
        )
    )
    return grand.crossJoin(l1).crossJoin(l2).selectExpr(
        "grand",
        "sum_level1",
        "sum_level2",
        "n_groups_level2",
        "grand = sum_level1 AND grand = sum_level2 AS matches",
    )


ORACLE_ROLLUP_CONSISTENCY = """
WITH grand AS (
  SELECT CAST(count(*) AS BIGINT) AS grand FROM orders),
l1 AS (
  SELECT CAST(sum(c) AS BIGINT) AS sum_level1 FROM (
    SELECT count(*) AS c FROM orders GROUP BY o_orderstatus)),
l2 AS (
  SELECT CAST(sum(c) AS BIGINT) AS sum_level2,
         CAST(count(*) AS BIGINT) AS n_groups_level2
  FROM (
    SELECT count(*) AS c FROM orders
    GROUP BY o_orderstatus, o_orderpriority))
SELECT g.grand, a.sum_level1, b.sum_level2, b.n_groups_level2,
       g.grand = a.sum_level1 AND g.grand = b.sum_level2 AS matches
FROM grand g CROSS JOIN l1 a CROSS JOIN l2 b
"""


IDENTITIES_QUERIES = {
    "semijoin_rewrite_equiv": q_semijoin_rewrite_equiv,
    "outer_join_decomposition": q_outer_join_decomposition,
    "agg_pushdown_equiv": q_agg_pushdown_equiv,
    "filter_union_equiv": q_filter_union_equiv,
    "rollup_consistency": q_rollup_consistency,
}

IDENTITIES_ORACLES = {
    "semijoin_rewrite_equiv": ORACLE_SEMIJOIN_REWRITE_EQUIV,
    "outer_join_decomposition": ORACLE_OUTER_JOIN_DECOMPOSITION,
    "agg_pushdown_equiv": ORACLE_AGG_PUSHDOWN_EQUIV,
    "filter_union_equiv": ORACLE_FILTER_UNION_EQUIV,
    "rollup_consistency": ORACLE_ROLLUP_CONSISTENCY,
}

_q.QUERIES.update(IDENTITIES_QUERIES)
_q.ORACLES.update(IDENTITIES_ORACLES)
