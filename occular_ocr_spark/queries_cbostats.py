"""Optimizer-statistics catalog, round 4 (wave 80): five operators
that build and AUDIT the statistics a cost-based optimizer (Catalyst
CBO / Postgres ANALYZE) keeps — equi-depth histograms, MCV lists,
sampled-NDV extrapolation — by comparing each estimator against the
exact answer on live data.  The audit framing matters at 100 TB:
mis-estimated selectivities pick the wrong join order there, and
these queries measure exactly that estimation error.

* ``cbo_stats_table`` — the persisted stats artifact: a {_NBUCKETS}-
  bucket equi-depth histogram of floor(o_totalprice) (boundaries =
  ceil-rank quantiles from the value histogram), per bucket: bounds,
  exact row count, and NDV.
* ``equidepth_selectivity_audit`` — range-predicate selectivity the
  way a CBO estimates it (full buckets + linear interpolation inside
  partial buckets, uniform-within-bucket assumption) vs the exact
  count, for a {_RANGES}-style grid of domain-percent ranges; signed
  estimation error in row-micro.
* ``conjunction_independence_audit`` — the independence assumption
  P(A∧B) ≈ P(A)·P(B) audited on the o_orderstatus ×
  o_orderpriority grid: estimated vs actual conjunctive rows, signed
  error — the classic cross-column correlation failure mode.
* ``mcv_equality_audit`` — the Postgres MCV model: top-{_MCV_K}
  most-common o_custkey values kept exactly (deterministic
  (count DESC, key) order via TakeOrderedAndProject — never a global
  rank window), every other key estimated as
  (n − Σmcv)/(ndv − K) uniform-rest; audited on the K MCVs plus the
  {_MCV_K} smallest non-MCV keys.
* ``ndv_sample_extrapolation`` — ANALYZE-style sampled NDV: a
  deterministic {_NDV_PCT}% row sample (portable md5-hex hash16 of
  o_orderkey — the ``sample_stratified`` idiom, identical integers on
  both engines), then two estimators from the sample's (d, f1)
  profile: GEE (√(1/q)·f1 + (d−f1), Charikar et al. 2000) and the
  first-order jackknife d + f1·(1−q)/q (exact integer at q=1/10),
  each vs the exact NDV.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus a TakeOrdered plan pin in tests/test_cbostats_wave.py.

Cross-engine float policy: counts, bounds, overlaps, and all
selectivity rationals are exact BIGINT/DECIMAL(38,0)-vs-HUGEINT
half-up micro; the one irrational (√10 in GEE) is a row-local IEEE
expression on exact integers, micro-quantized.

Scale notes: every estimator consumes a bounded artifact — the value
histogram (≤ #distinct prices), the {_NBUCKETS}-row bounds table
(broadcast), the status×priority grid, the K-row MCV list (TakeOrdered,
no global window), per-key sample counts (one partial-agg shuffle).
No corpus-sized window, no driver loop; the probe/range grids join in
as broadcasts.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_NBUCKETS = 10
_RANGES = [(0, 25), (25, 50), (50, 75), (10, 90), (40, 60)]
_MCV_K = 10
_NDV_PCT = 10  # portable-hash row sample: hash16 % 10 == 0


def _h16(col: str, dialect: str) -> str:
    """First 4 md5 hex chars as an integer — portable across Spark
    SQL and DuckDB (the ``_sample_sql`` idiom)."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    hx = (
        lambda j: f"(instr('0123456789abcdef', substr(md5(CAST({col} AS {strtype})), {j}, 1)) - 1)"
    )
    return f"((({hx(1)} * 16 + {hx(2)}) * 16 + {hx(3)}) * 16 + {hx(4)})"


# ---------------------------------------------------------------------------
# shared equi-depth machinery
# ---------------------------------------------------------------------------

_HIST_SQL = """
hist AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS m
  FROM orders GROUP BY CAST(floor(o_totalprice) AS BIGINT)),
ranked AS (
  SELECT v, m,
         sum(m) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(m) OVER () AS n
  FROM hist)
"""

_BOUNDS_SQL = f"""
ks AS (SELECT unnest(generate_series(1, {_NBUCKETS})) AS k),
bounds AS (
  SELECT k, min(v) AS ub FROM ranked CROSS JOIN ks
  WHERE cum >= (k * n + {_NBUCKETS} - 1) // {_NBUCKETS}
  GROUP BY k),
buckets AS (
  SELECT k, coalesce(lag(ub) OVER (ORDER BY k),
           (SELECT min(v) - 1 FROM hist)) AS lb, ub
  FROM bounds)
"""


def _hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .selectExpr("CAST(floor(o_totalprice) AS BIGINT) AS v")
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("m"))
    )


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hist(spark, sf_dir).selectExpr(
        "v",
        "m",
        "sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS cum",
        "sum(m) OVER () AS n",
    )


def _buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The B-row (k, lb, ub] bounds table; lb of bucket 1 is min−1 so
    half-open bucket algebra covers the whole domain."""
    ranked = _q._persist_tracked(_ranked(spark, sf_dir))
    ks = spark.range(1, _NBUCKETS + 1).selectExpr("CAST(id AS BIGINT) AS k")
    bounds = (
        ranked.crossJoin(F.broadcast(ks))
        .where(f"cum >= (k * n + {_NBUCKETS} - 1) DIV {_NBUCKETS}")
        .groupBy("k")
        .agg(F.min("v").cast("long").alias("ub"))
    )
    vmin = ranked.agg(F.expr("min(v) - 1").alias("lb0"))
    return bounds.crossJoin(F.broadcast(vmin)).selectExpr(
        "k",
        "coalesce(lag(ub) OVER (ORDER BY k), lb0) AS lb",
        "ub",
    )


# ---------------------------------------------------------------------------
# cbo_stats_table
# ---------------------------------------------------------------------------


def q_cbo_stats_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi-depth stats artifact: per bucket bounds, exact rows,
    NDV — the table ANALYZE would persist."""
    hist = _hist(spark, sf_dir)
    b = _buckets(spark, sf_dir)
    return (
        hist.join(F.broadcast(b), F.expr("v > lb AND v <= ub"))
        .groupBy("k")
        .agg(
            F.min("lb").cast("long").alias("lb"),
            F.max("ub").cast("long").alias("ub"),
            F.sum("m").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("ndv"),
        )
    )


ORACLE_CBO_STATS_TABLE = f"""
WITH {_HIST_SQL},
{_BOUNDS_SQL}
SELECT CAST(b.k AS BIGINT) AS k,
       CAST(min(b.lb) AS BIGINT) AS lb,
       CAST(max(b.ub) AS BIGINT) AS ub,
       CAST(sum(h.m) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS ndv
FROM hist h JOIN buckets b ON h.v > b.lb AND h.v <= b.ub
GROUP BY b.k
"""


# ---------------------------------------------------------------------------
# equidepth_selectivity_audit
# ---------------------------------------------------------------------------


def q_equidepth_selectivity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram range-selectivity estimate (uniform within bucket)
    vs the exact count for domain-percent ranges."""
    stats = _q._persist_tracked(q_cbo_stats_table(spark, sf_dir))
    dom = _hist(spark, sf_dir).agg(
        F.min("v").cast("long").alias("vmin"),
        F.max("v").cast("long").alias("vmax"),
    )
    rng = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(_RANGES)],
        "range_id long, a_pct long, b_pct long",
    )
    cuts = rng.crossJoin(F.broadcast(dom)).selectExpr(
        "range_id",
        "vmin + (vmax - vmin) * a_pct DIV 100 AS a_cut",
        "vmin + (vmax - vmin) * b_pct DIV 100 AS b_cut",
    )
    est = (
        stats.crossJoin(F.broadcast(cuts))
        .selectExpr(
            "range_id",
            "a_cut",
            "b_cut",
            "greatest(0L, least(b_cut, ub) - greatest(a_cut, lb)) AS ov",
            "ub - lb AS w",
            "n_rows",
        )
        .groupBy("range_id", "a_cut", "b_cut")
        .agg(
            F.expr(
                "CAST(sum((2000000 * CAST(n_rows AS DECIMAL(38,0)) * ov + w)"
                " DIV (2 * w)) AS BIGINT)"
            ).alias("est_rows_micro")
        )
    )
    actual = (
        _hist(spark, sf_dir)
        .crossJoin(F.broadcast(cuts))
        .where("v > a_cut AND v <= b_cut")
        .groupBy("range_id")
        .agg(F.sum("m").cast("long").alias("actual_rows"))
    )
    return est.join(actual, "range_id", "left").selectExpr(
        "range_id",
        "a_cut",
        "b_cut",
        "est_rows_micro",
        "coalesce(actual_rows, 0L) AS actual_rows",
        "est_rows_micro - 1000000 * coalesce(actual_rows, 0L)"
        " AS err_rows_micro",
    )


ORACLE_EQUIDEPTH_SELECTIVITY_AUDIT = f"""
WITH {_HIST_SQL},
{_BOUNDS_SQL},
stats AS (
  SELECT b.k, min(b.lb) AS lb, max(b.ub) AS ub,
         CAST(sum(h.m) AS BIGINT) AS n_rows
  FROM hist h JOIN buckets b ON h.v > b.lb AND h.v <= b.ub
  GROUP BY b.k),
dom AS (SELECT CAST(min(v) AS BIGINT) AS vmin,
               CAST(max(v) AS BIGINT) AS vmax FROM hist),
rng AS (
  SELECT * FROM (VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_RANGES))})
    AS t(range_id, a_pct, b_pct)),
cuts AS (
  SELECT range_id,
         vmin + (vmax - vmin) * a_pct // 100 AS a_cut,
         vmin + (vmax - vmin) * b_pct // 100 AS b_cut
  FROM rng CROSS JOIN dom),
est AS (
  SELECT c.range_id, c.a_cut, c.b_cut,
         CAST(sum((2000000 * CAST(s.n_rows AS HUGEINT)
              * greatest(0, least(c.b_cut, s.ub) - greatest(c.a_cut, s.lb))
              + (s.ub - s.lb)) // (2 * (s.ub - s.lb))) AS BIGINT)
           AS est_rows_micro
  FROM stats s CROSS JOIN cuts c
  GROUP BY c.range_id, c.a_cut, c.b_cut),
act AS (
  SELECT c.range_id, CAST(sum(h.m) AS BIGINT) AS actual_rows
  FROM hist h CROSS JOIN cuts c
  WHERE h.v > c.a_cut AND h.v <= c.b_cut
  GROUP BY c.range_id)
SELECT CAST(e.range_id AS BIGINT) AS range_id,
       CAST(e.a_cut AS BIGINT) AS a_cut,
       CAST(e.b_cut AS BIGINT) AS b_cut,
       e.est_rows_micro,
       coalesce(a.actual_rows, 0) AS actual_rows,
       e.est_rows_micro - 1000000 * coalesce(a.actual_rows, 0)
         AS err_rows_micro
FROM est e LEFT JOIN act a ON a.range_id = e.range_id
"""


# ---------------------------------------------------------------------------
# conjunction_independence_audit
# ---------------------------------------------------------------------------


def q_conjunction_independence_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """P(A∧B) vs P(A)·P(B) on the status×priority grid — the CBO
    independence assumption's signed row error."""
    joint = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").cast("long").alias("actual_rows"))
    )
    return joint.selectExpr(
        "o_orderstatus",
        "o_orderpriority",
        "actual_rows",
        "sum(actual_rows) OVER (PARTITION BY o_orderstatus) AS cnt_s",
        "sum(actual_rows) OVER (PARTITION BY o_orderpriority) AS cnt_p",
        "sum(actual_rows) OVER () AS n",
    ).selectExpr(
        "o_orderstatus",
        "o_orderpriority",
        "actual_rows",
        "cnt_s",
        "cnt_p",
        "CAST((2000000 * CAST(cnt_s AS DECIMAL(38,0)) * cnt_p + n)"
        " DIV (2 * n) AS BIGINT) AS est_rows_micro",
        "CAST((2000000 * CAST(cnt_s AS DECIMAL(38,0)) * cnt_p + n)"
        " DIV (2 * n) AS BIGINT) - 1000000 * actual_rows"
        " AS err_rows_micro",
    )


ORACLE_CONJUNCTION_INDEPENDENCE_AUDIT = """
WITH joint AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(count(*) AS BIGINT) AS actual_rows
  FROM orders GROUP BY o_orderstatus, o_orderpriority),
marg AS (
  SELECT o_orderstatus, o_orderpriority, actual_rows,
         sum(actual_rows) OVER (PARTITION BY o_orderstatus) AS cnt_s,
         sum(actual_rows) OVER (PARTITION BY o_orderpriority) AS cnt_p,
         sum(actual_rows) OVER () AS n
  FROM joint)
SELECT o_orderstatus, o_orderpriority, actual_rows,
       CAST(cnt_s AS BIGINT) AS cnt_s,
       CAST(cnt_p AS BIGINT) AS cnt_p,
       CAST((2000000 * CAST(cnt_s AS HUGEINT) * cnt_p + n) // (2 * n)
            AS BIGINT) AS est_rows_micro,
       CAST(CAST((2000000 * CAST(cnt_s AS HUGEINT) * cnt_p + n)
            // (2 * n) AS BIGINT) - 1000000 * actual_rows AS BIGINT)
         AS err_rows_micro
FROM marg
"""


# ---------------------------------------------------------------------------
# mcv_equality_audit
# ---------------------------------------------------------------------------


def q_mcv_equality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCV + uniform-rest equality-selectivity audit on the K most
    common and K smallest non-MCV customer keys."""
    freq = _q._persist_tracked(
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tots = freq.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("ndv"),
    )
    mcv = (
        freq.orderBy(F.desc("cnt"), F.asc("o_custkey"))
        .limit(_MCV_K)
        .selectExpr("o_custkey", "cnt", "1L AS in_mcv")
    )
    mcv_sum = mcv.agg(F.sum("cnt").cast("long").alias("mcv_sum"))
    nonmcv = (
        freq.join(mcv.select("o_custkey"), "o_custkey", "left_anti")
        .orderBy(F.asc("o_custkey"))
        .limit(_MCV_K)
        .selectExpr("o_custkey", "cnt", "0L AS in_mcv")
    )
    probes = mcv.unionAll(nonmcv)
    return (
        probes.crossJoin(F.broadcast(tots))
        .crossJoin(F.broadcast(mcv_sum))
        .selectExpr(
            "o_custkey",
            "in_mcv",
            "cnt AS actual_rows",
            "CASE WHEN in_mcv = 1 THEN 1000000 * cnt"
            f" ELSE CAST((2000000 * (n - mcv_sum) + (ndv - {_MCV_K}))"
            f" DIV (2 * (ndv - {_MCV_K})) AS BIGINT) END"
            " AS est_rows_micro",
        )
        .selectExpr(
            "o_custkey",
            "in_mcv",
            "actual_rows",
            "est_rows_micro",
            "est_rows_micro - 1000000 * actual_rows AS err_rows_micro",
        )
    )


ORACLE_MCV_EQUALITY_AUDIT = f"""
WITH freq AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey),
tots AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS ndv FROM freq),
mcv AS (
  SELECT o_custkey, cnt, CAST(1 AS BIGINT) AS in_mcv
  FROM freq ORDER BY cnt DESC, o_custkey LIMIT {_MCV_K}),
mcv_sum AS (SELECT CAST(sum(cnt) AS BIGINT) AS mcv_sum FROM mcv),
nonmcv AS (
  SELECT f.o_custkey, f.cnt, CAST(0 AS BIGINT) AS in_mcv
  FROM freq f WHERE NOT EXISTS (
    SELECT 1 FROM mcv m WHERE m.o_custkey = f.o_custkey)
  ORDER BY f.o_custkey LIMIT {_MCV_K}),
probes AS (
  SELECT * FROM mcv UNION ALL SELECT * FROM nonmcv)
SELECT p.o_custkey, p.in_mcv, p.cnt AS actual_rows,
       CASE WHEN p.in_mcv = 1 THEN 1000000 * p.cnt
            ELSE CAST((2000000 * (t.n - s.mcv_sum) + (t.ndv - {_MCV_K}))
                 // (2 * (t.ndv - {_MCV_K})) AS BIGINT) END
         AS est_rows_micro,
       CASE WHEN p.in_mcv = 1 THEN 1000000 * p.cnt
            ELSE CAST((2000000 * (t.n - s.mcv_sum) + (t.ndv - {_MCV_K}))
                 // (2 * (t.ndv - {_MCV_K})) AS BIGINT) END
         - 1000000 * p.cnt AS err_rows_micro
FROM probes p CROSS JOIN tots t CROSS JOIN mcv_sum s
"""


# ---------------------------------------------------------------------------
# ndv_sample_extrapolation
# ---------------------------------------------------------------------------


def _ndv_sql(dialect: str = "duck") -> str:
    h = _h16("o_orderkey", dialect)
    return f"""
WITH samp AS (
  SELECT o_custkey FROM orders WHERE {h} % {_NDV_PCT} = 0),
per_key AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS c
  FROM samp GROUP BY o_custkey),
prof AS (
  SELECT CAST(count(*) AS BIGINT) AS d_sample,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         CAST(sum(c) AS BIGINT) AS sample_rows
  FROM per_key),
exact AS (
  SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_ndv
  FROM orders)
SELECT p.sample_rows, p.d_sample, p.f1, p.f2,
       CAST(floor(sqrt(CAST({_NDV_PCT} AS DOUBLE))
            * CAST(p.f1 AS DOUBLE)
            + CAST(p.d_sample - p.f1 AS DOUBLE)) AS BIGINT)
         AS gee_ndv,
       p.d_sample + ({_NDV_PCT} - 1) * p.f1 AS jk1_ndv,
       e.exact_ndv,
       CAST(floor(sqrt(CAST({_NDV_PCT} AS DOUBLE))
            * CAST(p.f1 AS DOUBLE)
            + CAST(p.d_sample - p.f1 AS DOUBLE)) AS BIGINT)
         - e.exact_ndv AS gee_err,
       p.d_sample + ({_NDV_PCT} - 1) * p.f1 - e.exact_ndv AS jk1_err
FROM prof p CROSS JOIN exact e
"""


def q_ndv_sample_extrapolation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GEE and first-order-jackknife NDV estimates from a portable
    deterministic 10%-row sample, vs the exact NDV."""
    _q._register_views(spark, sf_dir, ["orders"])
    return spark.sql(_ndv_sql("spark"))


ORACLE_NDV_SAMPLE_EXTRAPOLATION = _ndv_sql()


CBOSTATS_QUERIES = {
    "cbo_stats_table": q_cbo_stats_table,
    "equidepth_selectivity_audit": q_equidepth_selectivity_audit,
    "conjunction_independence_audit": q_conjunction_independence_audit,
    "mcv_equality_audit": q_mcv_equality_audit,
    "ndv_sample_extrapolation": q_ndv_sample_extrapolation,
}

CBOSTATS_ORACLES = {
    "cbo_stats_table": ORACLE_CBO_STATS_TABLE,
    "equidepth_selectivity_audit": ORACLE_EQUIDEPTH_SELECTIVITY_AUDIT,
    "conjunction_independence_audit": ORACLE_CONJUNCTION_INDEPENDENCE_AUDIT,
    "mcv_equality_audit": ORACLE_MCV_EQUALITY_AUDIT,
    "ndv_sample_extrapolation": ORACLE_NDV_SAMPLE_EXTRAPOLATION,
}

_q.QUERIES.update(CBOSTATS_QUERIES)
_q.ORACLES.update(CBOSTATS_ORACLES)
