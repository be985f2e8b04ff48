"""Period-over-period decomposition catalog, round 4 (wave 86): five
operators that explain WHERE a revenue change came from — the
decomposition reports every BI warehouse ships, each with an exact
integer reconciliation (the components sum back to the total by
algebra, not by rounding luck).  Periods: the ship-date horizon split
at its exact midpoint day (derived from the data, no constant), P1 =
[min, mid], P2 = (mid, max]; revenue r = Σ⌊l_extendedprice⌋, volume
q = Σ⌊l_quantity⌋.

* ``price_volume_mix_decomp`` — per part present in both periods:
  Laspeyres volume effect p₁·(q₂−q₁) = r₁(q₂−q₁)/q₁ and price
  effect (p₂−p₁)·q₂ = r₂ − r₁q₂/q₁, each a sign-split half-up
  micro; the two effects sum to Δr EXACTLY as rationals, so the
  reported rounding residual is bounded by 1 micro (and emitted).
* ``revenue_bridge`` — the SaaS-style bridge as a 5-component
  ledger: new + churned + expansion + contraction = Δtotal, all
  exact BIGINTs — the reconciliation is an identity, checked by the
  oracle hash and pinned by the tests.
* ``shift_share_analysis`` — per customer nation: expected growth at
  the national rate r₁·(R₂−R₁)/R₁ (sign-split half-up micro) vs the
  actual Δr; the regional shift residual.
* ``abc_migration_matrix`` — the wave-77 ABC classification computed
  per period, plus NEW/GONE pseudo-classes: the class-transition
  matrix with part counts and P2 revenue.
* ``pareto_shift_audit`` — revenue concentration drift: the top-10%
  part share of revenue per period (two-level rank per period) and
  its signed delta.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_decomp_wave.py.

Cross-engine float policy: exact BIGINT half-up micro everywhere;
signed quantities are sign-split CASEs over the non-negative half-up
kernel — no floating point in this wave.

Scale notes: one lineitem partial-agg shuffle to the (part, period)
frame (≤ 2·#parts rows); every window orders the bounded per-period
part frames; the bridge/shift totals are 1-row aggregates broadcast
back; nation joins in as a broadcast dim.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_ABC_A = 800_000
_ABC_B = 950_000


def _per_part_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, period 1|2, r, q) — the midpoint split derived
    from the data inside the same job."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "CAST(l_shipdate AS DATE) AS d",
        "CAST(floor(l_extendedprice) AS BIGINT) AS r",
        "CAST(floor(l_quantity) AS BIGINT) AS q",
    )
    mid = li.agg(
        F.expr(
            "date_add(min(d), CAST(datediff(max(d), min(d)) DIV 2"
            " AS INT))"
        ).alias("mid")
    )
    return (
        li.crossJoin(F.broadcast(mid))
        .selectExpr(
            "l_partkey",
            "CASE WHEN d <= mid THEN 1L ELSE 2L END AS period",
            "r",
            "q",
        )
        .groupBy("l_partkey", "period")
        .agg(
            F.sum("r").cast("long").alias("r"),
            F.sum("q").cast("long").alias("q"),
        )
    )


_PPP_SQL = """
li AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(floor(l_extendedprice) AS BIGINT) AS r,
         CAST(floor(l_quantity) AS BIGINT) AS q
  FROM lineitem),
mid AS (
  SELECT min(d) + CAST(CAST(max(d) - min(d) AS BIGINT) // 2
         AS INTEGER) AS mid FROM li),
ppp AS (
  SELECT l_partkey,
         CASE WHEN li.d <= m.mid THEN 1 ELSE 2 END AS period,
         CAST(sum(r) AS BIGINT) AS r,
         CAST(sum(q) AS BIGINT) AS q
  FROM li CROSS JOIN mid m
  GROUP BY l_partkey, CASE WHEN li.d <= m.mid THEN 1 ELSE 2 END)
"""

# sign-split half-up of a rational num/den (den > 0), in micro —
# the 2e6-scaled product is widened (DECIMAL(38,0) / HUGEINT) so
# nation- and part-level revenue products survive any SF
_SGN = (
    "CASE WHEN {num} >= 0 THEN"
    " CAST((2000000 * CAST({num} AS {wide}) + {den})"
    " {div} (2 * ({den})) AS BIGINT)"
    " ELSE -CAST((2000000 * CAST(-({num}) AS {wide}) + {den})"
    " {div} (2 * ({den})) AS BIGINT) END"
)


def _sgn(num: str, den: str, dialect: str) -> str:
    return _SGN.format(
        num=num,
        den=den,
        div="DIV" if dialect == "spark" else "//",
        wide="DECIMAL(38,0)" if dialect == "spark" else "HUGEINT",
    )


# ---------------------------------------------------------------------------
# price_volume_mix_decomp
# ---------------------------------------------------------------------------


def q_price_volume_mix_decomp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Laspeyres price/volume split per matched part; the rounding
    residual of the exact rational identity is emitted (|resid| ≤ 1)."""
    ppp = _q._persist_tracked(_per_part_period(spark, sf_dir))
    p1 = ppp.where("period = 1").selectExpr(
        "l_partkey", "r AS r1", "q AS q1"
    )
    p2 = ppp.where("period = 2").selectExpr(
        "l_partkey", "r AS r2", "q AS q2"
    )
    m = p1.join(p2, "l_partkey").where("q1 > 0 AND q2 > 0")
    vol = _sgn("r1 * (q2 - q1)", "q1", "spark")
    prc = _sgn("r2 * q1 - r1 * q2", "q1", "spark")
    return m.selectExpr(
        "l_partkey",
        "r1",
        "r2",
        "q1",
        "q2",
        f"{vol} AS volume_effect_micro",
        f"{prc} AS price_effect_micro",
        "1000000 * (r2 - r1) AS delta_micro",
        f"1000000 * (r2 - r1) - ({vol}) - ({prc}) AS resid_micro",
    )


ORACLE_PRICE_VOLUME_MIX_DECOMP = f"""
WITH {_PPP_SQL},
m AS (
  SELECT a.l_partkey, a.r AS r1, a.q AS q1, b.r AS r2, b.q AS q2
  FROM ppp a JOIN ppp b
    ON b.l_partkey = a.l_partkey AND a.period = 1 AND b.period = 2
  WHERE a.q > 0 AND b.q > 0)
SELECT l_partkey, r1, r2, q1, q2,
       {_sgn("r1 * (q2 - q1)", "q1", "duck")} AS volume_effect_micro,
       {_sgn("r2 * q1 - r1 * q2", "q1", "duck")} AS price_effect_micro,
       1000000 * (r2 - r1) AS delta_micro,
       1000000 * (r2 - r1) - ({_sgn("r1 * (q2 - q1)", "q1", "duck")})
         - ({_sgn("r2 * q1 - r1 * q2", "q1", "duck")}) AS resid_micro
FROM m
"""


# ---------------------------------------------------------------------------
# revenue_bridge
# ---------------------------------------------------------------------------


def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New + churned + expansion + contraction = Δtotal, exact
    BIGINTs — the 5-component reconciling bridge."""
    ppp = _q._persist_tracked(_per_part_period(spark, sf_dir))
    p1 = ppp.where("period = 1").selectExpr("l_partkey", "r AS r1")
    p2 = ppp.where("period = 2").selectExpr("l_partkey", "r AS r2")
    fo = p1.join(p2, "l_partkey", "full").selectExpr(
        "coalesce(r1, 0L) AS r1",
        "coalesce(r2, 0L) AS r2",
        "r1 IS NULL AS is_new",
        "r2 IS NULL AS is_gone",
    )
    agg = fo.agg(
        F.sum(F.expr("CASE WHEN is_new THEN r2 ELSE 0L END"))
        .cast("long")
        .alias("new_revenue"),
        F.sum(F.expr("CASE WHEN is_gone THEN -r1 ELSE 0L END"))
        .cast("long")
        .alias("churned_revenue"),
        F.sum(
            F.expr(
                "CASE WHEN NOT is_new AND NOT is_gone AND r2 > r1"
                " THEN r2 - r1 ELSE 0L END"
            )
        )
        .cast("long")
        .alias("expansion"),
        F.sum(
            F.expr(
                "CASE WHEN NOT is_new AND NOT is_gone AND r2 < r1"
                " THEN r2 - r1 ELSE 0L END"
            )
        )
        .cast("long")
        .alias("contraction"),
        F.sum(F.expr("r2 - r1")).cast("long").alias("delta_total"),
    )
    return agg.selectExpr(
        "new_revenue",
        "churned_revenue",
        "expansion",
        "contraction",
        "delta_total",
        "new_revenue + churned_revenue + expansion + contraction"
        " = delta_total AS reconciles",
    )


ORACLE_REVENUE_BRIDGE = f"""
WITH {_PPP_SQL},
p1 AS (SELECT l_partkey, r AS r1 FROM ppp WHERE period = 1),
p2 AS (SELECT l_partkey, r AS r2 FROM ppp WHERE period = 2),
fo AS (
  SELECT coalesce(a.r1, 0) AS r1, coalesce(b.r2, 0) AS r2,
         a.r1 IS NULL AS is_new, b.r2 IS NULL AS is_gone
  FROM p1 a FULL OUTER JOIN p2 b ON b.l_partkey = a.l_partkey),
agg AS (
  SELECT CAST(sum(CASE WHEN is_new THEN r2 ELSE 0 END) AS BIGINT)
           AS new_revenue,
         CAST(sum(CASE WHEN is_gone THEN -r1 ELSE 0 END) AS BIGINT)
           AS churned_revenue,
         CAST(sum(CASE WHEN NOT is_new AND NOT is_gone AND r2 > r1
              THEN r2 - r1 ELSE 0 END) AS BIGINT) AS expansion,
         CAST(sum(CASE WHEN NOT is_new AND NOT is_gone AND r2 < r1
              THEN r2 - r1 ELSE 0 END) AS BIGINT) AS contraction,
         CAST(sum(r2 - r1) AS BIGINT) AS delta_total
  FROM fo)
SELECT new_revenue, churned_revenue, expansion, contraction,
       delta_total,
       new_revenue + churned_revenue + expansion + contraction
         = delta_total AS reconciles
FROM agg
"""


# ---------------------------------------------------------------------------
# shift_share_analysis
# ---------------------------------------------------------------------------


def q_shift_share_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer nation: expected growth at the national rate vs
    actual; the regional-shift residual (all sign-split micro)."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "CAST(l_shipdate AS DATE) AS d",
        "CAST(floor(l_extendedprice) AS BIGINT) AS r",
    )
    o = _t(spark, sf_dir, "orders").selectExpr("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_nationkey"
    )
    mid = li.agg(
        F.expr(
            "date_add(min(d), CAST(datediff(max(d), min(d)) DIV 2"
            " AS INT))"
        ).alias("mid")
    )
    base = (
        li.crossJoin(F.broadcast(mid))
        # orders/customer join by key — fact-sized sides, never hinted
        # broadcast; AQE picks the strategy at real scale
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .selectExpr(
            "CAST(c_nationkey AS BIGINT) AS nation",
            "CASE WHEN d <= mid THEN 1L ELSE 2L END AS period",
            "r",
        )
        .groupBy("nation", "period")
        .agg(F.sum("r").cast("long").alias("r"))
    )
    piv = (
        base.groupBy("nation")
        .agg(
            F.sum(F.expr("CASE WHEN period = 1 THEN r ELSE 0L END"))
            .cast("long")
            .alias("r1"),
            F.sum(F.expr("CASE WHEN period = 2 THEN r ELSE 0L END"))
            .cast("long")
            .alias("r2"),
        )
        .where("r1 > 0")
    )
    tot = piv.agg(
        F.sum("r1").cast("long").alias("rt1"),
        F.sum("r2").cast("long").alias("rt2"),
    )
    exp_ = _sgn("r1 * (rt2 - rt1)", "rt1", "spark")
    return piv.crossJoin(F.broadcast(tot)).selectExpr(
        "nation",
        "r1",
        "r2",
        "1000000 * (r2 - r1) AS actual_delta_micro",
        f"{exp_} AS expected_delta_micro",
        f"1000000 * (r2 - r1) - ({exp_}) AS regional_shift_micro",
    )


ORACLE_SHIFT_SHARE_ANALYSIS = f"""
WITH li AS (
  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS d,
         CAST(floor(l_extendedprice) AS BIGINT) AS r
  FROM lineitem),
mid AS (
  SELECT min(d) + CAST(CAST(max(d) - min(d) AS BIGINT) // 2
         AS INTEGER) AS mid FROM li),
base AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
         CASE WHEN li.d <= m.mid THEN 1 ELSE 2 END AS period,
         CAST(sum(li.r) AS BIGINT) AS r
  FROM li CROSS JOIN mid m
  JOIN orders o ON o.o_orderkey = li.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2),
piv AS (
  SELECT nation,
         CAST(sum(CASE WHEN period = 1 THEN r ELSE 0 END) AS BIGINT)
           AS r1,
         CAST(sum(CASE WHEN period = 2 THEN r ELSE 0 END) AS BIGINT)
           AS r2
  FROM base GROUP BY nation HAVING
    sum(CASE WHEN period = 1 THEN r ELSE 0 END) > 0),
tot AS (SELECT CAST(sum(r1) AS BIGINT) AS rt1,
               CAST(sum(r2) AS BIGINT) AS rt2 FROM piv)
SELECT p.nation, p.r1, p.r2,
       1000000 * (p.r2 - p.r1) AS actual_delta_micro,
       {_sgn("p.r1 * (t.rt2 - t.rt1)", "t.rt1", "duck")}
         AS expected_delta_micro,
       1000000 * (p.r2 - p.r1)
         - ({_sgn("p.r1 * (t.rt2 - t.rt1)", "t.rt1", "duck")})
         AS regional_shift_micro
FROM piv p CROSS JOIN tot t
"""


# ---------------------------------------------------------------------------
# abc_migration_matrix
# ---------------------------------------------------------------------------

_ABC_CLASS_SQL = f"""
  CASE WHEN cum_micro <= {_ABC_A} THEN 'A'
       WHEN cum_micro <= {_ABC_B} THEN 'B'
       ELSE 'C' END
"""


def q_abc_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC class per period (wave-77 cut points) + NEW/GONE: the
    transition matrix with part counts and P2 revenue."""
    ppp = _q._persist_tracked(_per_part_period(spark, sf_dir))
    classed = ppp.selectExpr(
        "l_partkey",
        "period",
        "r",
        "CAST((2000000 * sum(r) OVER (PARTITION BY period ORDER BY"
        " r DESC, l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " CURRENT ROW) + sum(r) OVER (PARTITION BY period))"
        " DIV (2 * sum(r) OVER (PARTITION BY period)) AS BIGINT)"
        " AS cum_micro",
    ).selectExpr(
        "l_partkey", "period", "r", f"{_ABC_CLASS_SQL} AS cls"
    )
    c1 = classed.where("period = 1").selectExpr(
        "l_partkey", "cls AS cls1"
    )
    c2 = classed.where("period = 2").selectExpr(
        "l_partkey", "cls AS cls2", "r AS r2"
    )
    return (
        c1.join(c2, "l_partkey", "full")
        .selectExpr(
            "coalesce(cls1, 'NEW') AS from_class",
            "coalesce(cls2, 'GONE') AS to_class",
            "coalesce(r2, 0L) AS r2",
        )
        .groupBy("from_class", "to_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("r2").cast("long").alias("p2_revenue"),
        )
    )


ORACLE_ABC_MIGRATION_MATRIX = f"""
WITH {_PPP_SQL},
classed AS (
  SELECT l_partkey, period, r,
         {_ABC_CLASS_SQL.replace("cum_micro", '''CAST((2000000
           * sum(r) OVER (PARTITION BY period ORDER BY r DESC,
             l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
             ROW) + sum(r) OVER (PARTITION BY period))
           // (2 * sum(r) OVER (PARTITION BY period)) AS BIGINT)''')}
           AS cls
  FROM ppp),
c1 AS (SELECT l_partkey, cls AS cls1 FROM classed WHERE period = 1),
c2 AS (SELECT l_partkey, cls AS cls2, r AS r2 FROM classed
       WHERE period = 2)
SELECT coalesce(a.cls1, 'NEW') AS from_class,
       coalesce(b.cls2, 'GONE') AS to_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(coalesce(b.r2, 0)) AS BIGINT) AS p2_revenue
FROM c1 a FULL OUTER JOIN c2 b ON b.l_partkey = a.l_partkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# pareto_shift_audit
# ---------------------------------------------------------------------------


def q_pareto_shift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10%-of-parts revenue share per period and its signed
    delta — concentration drift."""
    ppp = _q._persist_tracked(_per_part_period(spark, sf_dir))
    ranked = ppp.selectExpr(
        "period",
        "r",
        "row_number() OVER (PARTITION BY period ORDER BY r DESC,"
        " l_partkey) AS rn",
        "count(*) OVER (PARTITION BY period) AS n",
        "sum(r) OVER (PARTITION BY period) AS tot",
    )
    per = ranked.groupBy("period").agg(
        F.max("n").cast("long").alias("n_parts"),
        F.max("tot").cast("long").alias("total_revenue"),
        F.sum(F.expr("CASE WHEN rn <= (n + 9) DIV 10 THEN r ELSE 0L"
                     " END")).cast("long").alias("top_decile_revenue"),
    )
    piv = per.groupBy().agg(
        F.max(F.expr("CASE WHEN period = 1 THEN n_parts END"))
        .cast("long")
        .alias("n1"),
        F.max(F.expr("CASE WHEN period = 2 THEN n_parts END"))
        .cast("long")
        .alias("n2"),
        F.max(
            F.expr(
                "CASE WHEN period = 1 THEN CAST((2000000"
                " * top_decile_revenue + total_revenue)"
                " DIV (2 * total_revenue) AS BIGINT) END"
            )
        )
        .cast("long")
        .alias("share1_micro"),
        F.max(
            F.expr(
                "CASE WHEN period = 2 THEN CAST((2000000"
                " * top_decile_revenue + total_revenue)"
                " DIV (2 * total_revenue) AS BIGINT) END"
            )
        )
        .cast("long")
        .alias("share2_micro"),
    )
    return piv.selectExpr(
        "n1",
        "n2",
        "share1_micro",
        "share2_micro",
        "share2_micro - share1_micro AS shift_micro",
    )


ORACLE_PARETO_SHIFT_AUDIT = f"""
WITH {_PPP_SQL},
ranked AS (
  SELECT period, r,
         row_number() OVER (PARTITION BY period ORDER BY r DESC,
           l_partkey) AS rn,
         count(*) OVER (PARTITION BY period) AS n,
         sum(r) OVER (PARTITION BY period) AS tot
  FROM ppp),
per AS (
  SELECT period,
         CAST(max(n) AS BIGINT) AS n_parts,
         CAST(max(tot) AS BIGINT) AS total_revenue,
         CAST(sum(CASE WHEN rn <= (n + 9) // 10 THEN r ELSE 0 END)
              AS BIGINT) AS top_decile_revenue
  FROM ranked GROUP BY period),
piv AS (
  SELECT CAST(max(CASE WHEN period = 1 THEN n_parts END) AS BIGINT)
           AS n1,
         CAST(max(CASE WHEN period = 2 THEN n_parts END) AS BIGINT)
           AS n2,
         CAST(max(CASE WHEN period = 1 THEN (2000000
           * top_decile_revenue + total_revenue)
           // (2 * total_revenue) END) AS BIGINT) AS share1_micro,
         CAST(max(CASE WHEN period = 2 THEN (2000000
           * top_decile_revenue + total_revenue)
           // (2 * total_revenue) END) AS BIGINT) AS share2_micro
  FROM per)
SELECT n1, n2, share1_micro, share2_micro,
       share2_micro - share1_micro AS shift_micro
FROM piv
"""


DECOMP_QUERIES = {
    "price_volume_mix_decomp": q_price_volume_mix_decomp,
    "revenue_bridge": q_revenue_bridge,
    "shift_share_analysis": q_shift_share_analysis,
    "abc_migration_matrix": q_abc_migration_matrix,
    "pareto_shift_audit": q_pareto_shift_audit,
}

DECOMP_ORACLES = {
    "price_volume_mix_decomp": ORACLE_PRICE_VOLUME_MIX_DECOMP,
    "revenue_bridge": ORACLE_REVENUE_BRIDGE,
    "shift_share_analysis": ORACLE_SHIFT_SHARE_ANALYSIS,
    "abc_migration_matrix": ORACLE_ABC_MIGRATION_MATRIX,
    "pareto_shift_audit": ORACLE_PARETO_SHIFT_AUDIT,
}

_q.QUERIES.update(DECOMP_QUERIES)
_q.ORACLES.update(DECOMP_ORACLES)
