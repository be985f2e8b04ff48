"""Chain-ladder reserving catalog, round 4 (wave 92): the classical
actuarial loss-development suite read onto the order→ship pipeline —
cohort = order month ("accident period"), development lag k =
months from order to line shipment (sign-safely clamped at 0, the
fixture ships both ways), "paid losses" = Σ⌊l_extendedprice⌋.  The
same triangle algebra every reserving team runs, each step exact.

* ``claims_dev_triangle`` — the cumulative development triangle:
  per (cohort, k) over the zero-filled observable spine (cohort c
  observes k iff c+k ≤ the data's last month): incremental and
  cumulative revenue — the artifact everything below consumes.
* ``chain_ladder_factors`` — per lag k: the volume-weighted
  development factor f_k = Σ_c C_{{c,k+1}} / Σ_c C_{{c,k}} over
  cohorts observing k+1 (exact rational micro; 10⁶ when the
  denominator is 0 — nothing to develop).
* ``ultimate_loss_projection`` — per cohort: latest cumulative ×
  Π remaining f_k, the product folded over the bounded factor array
  with half-up micro quantization at each step (Spark
  ``aggregate`` / DuckDB ``list_reduce`` — the Erlang-fold
  precedent).
* ``ibnr_reserve_report`` — per cohort: IBNR = ultimate − latest
  (never negative up to the per-step rounding, pinned in tests) plus
  the grand-total reserve row via a ROLLUP-style union.
* ``bf_method_compare`` — Bornhuetter-Ferguson vs chain ladder per
  cohort: BF ultimate = latest + expected·(1 − 1/CDF) with expected
  = cohort order revenue × the corpus shipped/ordered ratio — the
  two reserving methods' signed disagreement micro.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_chainladder_wave.py.

Cross-engine float policy: triangles, factors, CDFs, and reserves
are exact BIGINT / DECIMAL(38,0)-vs-HUGEINT half-up micro; the
factor-product fold quantizes each multiply to micro identically on
both engines — no floating point in this wave.

Scale notes: one orders⋈lineitem shuffle on the order key to
(cohort, k) cells; the triangle spine is (#months)² / 2 — calendar-
bounded; factors are a ≤#months-row frame; the per-cohort product
folds over a ≤#months-long broadcast factor array.  No corpus-sized
window, no driver loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t


# Spark has no LATERAL unnest with correlated bounds in the same way;
# build the spine via sequence() per cohort row instead.
def _tri_sql_spark() -> str:
    return """
cells AS (
  SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS cohort,
         greatest(CAST(0 AS BIGINT),
           CAST(months_between(date_trunc('month', l.l_shipdate),
                date_trunc('month', o.o_orderdate)) AS BIGINT)) AS k,
         CAST(sum(CAST(floor(l.l_extendedprice) AS BIGINT))
              AS BIGINT) AS inc
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
lastm AS (
  SELECT max(CAST(date_trunc('month', l_shipdate) AS DATE)) AS last_m
  FROM lineitem),
spine AS (
  SELECT cohort, k,
         CAST(months_between(last_m, cohort) AS BIGINT) AS kmax_c
  FROM (
    SELECT c.cohort, t.last_m,
           explode(sequence(0,
             CAST(months_between(t.last_m, c.cohort) AS INT))) AS k
    FROM (SELECT DISTINCT cohort FROM cells) c CROSS JOIN lastm t)),
tri AS (
  SELECT s.cohort, s.k, s.kmax_c,
         coalesce(x.inc, 0L) AS inc,
         CAST(sum(coalesce(x.inc, 0L)) OVER (PARTITION BY s.cohort
           ORDER BY s.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
           ROW) AS BIGINT) AS cum
  FROM spine s LEFT JOIN cells x
    ON x.cohort = s.cohort AND x.k = s.k)
"""


def _tri_sql_duck() -> str:
    return """
cells AS (
  SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS cohort,
         greatest(CAST(0 AS BIGINT),
           CAST(datediff('month', date_trunc('month', o.o_orderdate),
                date_trunc('month', l.l_shipdate)) AS BIGINT)) AS k,
         CAST(sum(CAST(floor(l.l_extendedprice) AS BIGINT))
              AS BIGINT) AS inc
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
lastm AS (
  SELECT max(CAST(date_trunc('month', l_shipdate) AS DATE)) AS last_m
  FROM lineitem),
spine AS (
  SELECT c.cohort,
         CAST(ks.k AS BIGINT) AS k,
         CAST(datediff('month', c.cohort, t.last_m) AS BIGINT)
           AS kmax_c
  FROM (SELECT DISTINCT cohort FROM cells) c
  CROSS JOIN lastm t,
       LATERAL (SELECT unnest(generate_series(0,
         datediff('month', c.cohort, t.last_m))) AS k) ks),
tri AS (
  SELECT s.cohort, s.k, s.kmax_c,
         coalesce(x.inc, 0) AS inc,
         CAST(sum(coalesce(x.inc, 0)) OVER (PARTITION BY s.cohort
           ORDER BY s.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
           ROW) AS BIGINT) AS cum
  FROM spine s LEFT JOIN cells x
    ON x.cohort = s.cohort AND x.k = s.k)
"""


def _tri(dialect: str) -> str:
    return _tri_sql_spark() if dialect == "spark" else _tri_sql_duck()


_FACTORS_SQL = """
pairs AS (
  SELECT a.k,
         CAST(sum(b.cum) AS {wide}) AS num,
         CAST(sum(a.cum) AS {wide}) AS den
  FROM tri a JOIN tri b
    ON b.cohort = a.cohort AND b.k = a.k + 1
  GROUP BY a.k),
factors AS (
  SELECT k,
         CASE WHEN den > 0 THEN
           CAST((2000000 * num + den) {intdiv} (2 * den) AS BIGINT)
         ELSE CAST(1000000 AS BIGINT) END AS f_micro
  FROM pairs)
"""


def _factors(dialect: str) -> str:
    return _FACTORS_SQL.format(
        wide="DECIMAL(38,0)" if dialect == "spark" else "HUGEINT",
        intdiv="DIV" if dialect == "spark" else "//",
    )


# ---------------------------------------------------------------------------
# claims_dev_triangle
# ---------------------------------------------------------------------------


def _triangle_query(dialect: str) -> str:
    return f"""
WITH {_tri(dialect)}
SELECT cohort, k, kmax_c, inc, cum FROM tri
"""


def q_claims_dev_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-filled cumulative development triangle."""
    _q._register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_triangle_query("spark"))


ORACLE_CLAIMS_DEV_TRIANGLE = _triangle_query("duck")


# ---------------------------------------------------------------------------
# chain_ladder_factors
# ---------------------------------------------------------------------------


def _factors_query(dialect: str) -> str:
    return f"""
WITH {_tri(dialect)},
{_factors(dialect)}
SELECT p.k, CAST(p.num AS BIGINT) AS num, CAST(p.den AS BIGINT)
         AS den, f.f_micro
FROM pairs p JOIN factors f ON f.k = p.k
"""


def q_chain_ladder_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted development factors per lag."""
    _q._register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_factors_query("spark"))


ORACLE_CHAIN_LADDER_FACTORS = _factors_query("duck")


# ---------------------------------------------------------------------------
# ultimate_loss_projection (+ shared latest/CDF CTEs)
# ---------------------------------------------------------------------------


def _ultimate_ctes(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        arr = (
            "aggregate(farr, CAST(1000000 AS BIGINT),"
            " (acc, f) -> CAST((2 * acc * f + 1000000)"
            " DIV (2 * 1000000) AS BIGINT))"
        )
        collect = (
            "latest AS (\n"
            "  SELECT cohort, kmax_c, cum AS latest_cum FROM tri\n"
            "  WHERE k = kmax_c),\n"
            "rem AS (\n"
            "  SELECT l.cohort, l.kmax_c, l.latest_cum,\n"
            "         sort_array(collect_list(struct(f.k, f.f_micro)))"
            " AS fs\n"
            "  FROM latest l LEFT JOIN factors f ON f.k >= l.kmax_c\n"
            "  GROUP BY l.cohort, l.kmax_c, l.latest_cum),\n"
            "cdf AS (\n"
            "  SELECT cohort, kmax_c, latest_cum,\n"
            "         filter(transform(fs, x -> x.f_micro),"
            " x -> x IS NOT NULL) AS farr\n"
            "  FROM rem)"
        )
    else:
        arr = (
            "list_reduce(list_prepend(CAST(1000000 AS BIGINT), farr),"
            " (acc, f) -> CAST((2 * acc * f + 1000000)"
            " // (2 * 1000000) AS BIGINT))"
        )
        collect = (
            "latest AS (\n"
            "  SELECT cohort, kmax_c, cum AS latest_cum FROM tri\n"
            "  WHERE k = kmax_c),\n"
            "rem AS (\n"
            "  SELECT l.cohort, l.kmax_c, l.latest_cum,\n"
            "         list_sort(list(struct_pack(k := f.k,"
            " f_micro := f.f_micro))) AS fs\n"
            "  FROM latest l LEFT JOIN factors f ON f.k >= l.kmax_c\n"
            "  GROUP BY l.cohort, l.kmax_c, l.latest_cum),\n"
            "cdf AS (\n"
            "  SELECT cohort, kmax_c, latest_cum,\n"
            "         [x.f_micro FOR x IN fs IF x.f_micro IS NOT NULL]"
            " AS farr\n"
            "  FROM rem)"
        )
    return f"""
{collect},
ult AS (
  SELECT cohort, kmax_c, latest_cum,
         CAST({arr} AS BIGINT) AS cdf_micro
  FROM cdf)
"""


def _ultimate_query(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_tri(dialect)},
{_factors(dialect)},
{_ultimate_ctes(dialect)}
SELECT cohort, kmax_c, latest_cum, cdf_micro,
       CAST((2 * CAST(latest_cum AS {wide}) * cdf_micro + 1000000)
            {intdiv} (2 * 1000000) AS BIGINT) AS ultimate
FROM ult
"""


def q_ultimate_loss_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per cohort: latest cumulative × folded product of remaining
    factors."""
    _q._register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_ultimate_query("spark"))


ORACLE_ULTIMATE_LOSS_PROJECTION = _ultimate_query("duck")


# ---------------------------------------------------------------------------
# ibnr_reserve_report
# ---------------------------------------------------------------------------


def _ibnr_query(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
WITH {_tri(dialect)},
{_factors(dialect)},
{_ultimate_ctes(dialect)},
res AS (
  SELECT cohort, latest_cum,
         CAST((2 * CAST(latest_cum AS {wide}) * cdf_micro + 1000000)
              {intdiv} (2 * 1000000) AS BIGINT) AS ultimate
  FROM ult)
SELECT CAST(cohort AS {strtype}) AS cohort_label, latest_cum, ultimate,
       ultimate - latest_cum AS ibnr
FROM res
UNION ALL
SELECT 'TOTAL' AS cohort_label,
       CAST(sum(latest_cum) AS BIGINT) AS latest_cum,
       CAST(sum(ultimate) AS BIGINT) AS ultimate,
       CAST(sum(ultimate - latest_cum) AS BIGINT) AS ibnr
FROM res
"""


def q_ibnr_reserve_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IBNR per cohort + the TOTAL reserve row."""
    _q._register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_ibnr_query("spark"))


ORACLE_IBNR_RESERVE_REPORT = _ibnr_query("duck")


# ---------------------------------------------------------------------------
# bf_method_compare
# ---------------------------------------------------------------------------


def _bf_query(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_tri(dialect)},
{_factors(dialect)},
{_ultimate_ctes(dialect)},
prem AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS cohort,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
           AS premium
  FROM orders GROUP BY date_trunc('month', o_orderdate)),
elr AS (
  SELECT CAST((2000000 * CAST((SELECT sum(cum) FROM tri WHERE
           k = kmax_c) AS {wide}) + (SELECT sum(premium) FROM prem))
           {intdiv} (2 * (SELECT sum(premium) FROM prem)) AS BIGINT)
           AS elr_micro),
base AS (
  SELECT u.cohort, u.latest_cum, u.cdf_micro,
         CAST((2 * CAST(u.latest_cum AS {wide}) * u.cdf_micro
              + 1000000) {intdiv} (2 * 1000000) AS BIGINT)
           AS cl_ultimate,
         p.premium, e.elr_micro
  FROM ult u JOIN prem p ON p.cohort = u.cohort
  CROSS JOIN elr e)
SELECT cohort, latest_cum, cl_ultimate, premium, elr_micro,
       -- BF = latest + premium*ELR*(1 - 1e6/cdf)
       latest_cum
       + CAST((2 * CAST(premium AS {wide}) * elr_micro
              * (cdf_micro - 1000000) + CAST(cdf_micro AS {wide})
              * 1000000) {intdiv} (2 * CAST(cdf_micro AS {wide})
              * 1000000) AS BIGINT) AS bf_ultimate,
       cl_ultimate - (latest_cum
       + CAST((2 * CAST(premium AS {wide}) * elr_micro
              * (cdf_micro - 1000000) + CAST(cdf_micro AS {wide})
              * 1000000) {intdiv} (2 * CAST(cdf_micro AS {wide})
              * 1000000) AS BIGINT)) AS cl_minus_bf
FROM base
"""


def q_bf_method_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bornhuetter-Ferguson vs chain-ladder ultimates per cohort."""
    _q._register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_bf_query("spark"))


ORACLE_BF_METHOD_COMPARE = _bf_query("duck")


CHAINLADDER_QUERIES = {
    "claims_dev_triangle": q_claims_dev_triangle,
    "chain_ladder_factors": q_chain_ladder_factors,
    "ultimate_loss_projection": q_ultimate_loss_projection,
    "ibnr_reserve_report": q_ibnr_reserve_report,
    "bf_method_compare": q_bf_method_compare,
}

CHAINLADDER_ORACLES = {
    "claims_dev_triangle": ORACLE_CLAIMS_DEV_TRIANGLE,
    "chain_ladder_factors": ORACLE_CHAIN_LADDER_FACTORS,
    "ultimate_loss_projection": ORACLE_ULTIMATE_LOSS_PROJECTION,
    "ibnr_reserve_report": ORACLE_IBNR_RESERVE_REPORT,
    "bf_method_compare": ORACLE_BF_METHOD_COMPARE,
}

_q.QUERIES.update(CHAINLADDER_QUERIES)
_q.ORACLES.update(CHAINLADDER_ORACLES)
