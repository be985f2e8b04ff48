"""Length-distribution inequality catalog, round 4 (wave 60): five
order-statistic / concentration operators over the document length
(``n_chars``) distribution — the skew a curation pipeline must know
before sizing packing, sharding, and mixture weights (a corpus where
1% of docs carry 50% of the tokens packs, shuffles, and trains very
differently from a flat one):

* ``lorenz_curve`` — exact Lorenz points at the {_LZ_POINTS}
  ventiles: for k·N/{_LZ_POINTS} lowest docs (ties split exactly via
  the partial value bucket), the cumulative share of total mass.
  The curve behind ``gini_concentration`` (which reports only the
  scalar).
* ``atkinson_index`` — Atkinson inequality at ε = 1:
  A = 1 − geomean/mean, the welfare-weighted counterpart of Gini.
  Per distinct value one ln micro-quantized then count-weighted
  (exact integers after the quantization point), one exp at the end
  on an identical rational double both engines.
* ``bowley_skewness`` — quartile skewness (Q₃+Q₁−2·Q₂)/(Q₃−Q₁) from
  exact histogram-selected quartiles — the robust skew that ignores
  tails entirely.
* ``moors_kurtosis`` — octile kurtosis ((E₇−E₅)+(E₃−E₁))/(E₆−E₂)
  from exact octiles (Moors 1988), robust tail-weight without fourth
  moments.
* ``palma_ratio`` — top-10% mass share over bottom-40% mass share
  (Palma 2011), the inequality scalar most sensitive to exactly the
  mega-document tail that breaks partition sizing.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_inequality_wave.py.

Cross-engine float policy: counts, masses, boundary values, and
quantiles are exact BIGINT from the distinct-value histogram; shares
and ratios are half-up micro divisions; ``atkinson_index`` carries
the module's only libm pair (per-value ln micro-quantized before the
weighted sum, one exp on the resulting exact rational).

Scale notes: every entry collapses the scan to the distinct-value
histogram in one partial agg (bounded by the value range, not the
corpus), runs its ordered windows over that ≤#distinct frame, and
joins constant-size spines (20 ventiles / 3 quartiles / 7 octiles)
by broadcast.  No global row-level window anywhere.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

_LZ_POINTS = 20


def _hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-value histogram of n_chars with ascending cumulative
    count and mass (release-tracked persist: each entry reads it 2-3
    times and the frame is ≤#distinct rows)."""
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    return _q._persist_tracked(
        _t(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("c"))
        .select(
            "v",
            "c",
            F.sum("c").over(wc).alias("cum_c"),
            F.sum(F.col("v") * F.col("c")).over(wc).alias("cum_m"),
        )
    )


_HIST_SQL = """
hist AS (
  SELECT v, c,
         sum(c) OVER w AS cum_c,
         sum(v * c) OVER w AS cum_m
  FROM (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1)
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
tot AS (SELECT max(cum_c) AS n, max(cum_m) AS m FROM hist)
"""


def _tot(hist: DataFrame) -> DataFrame:
    return hist.agg(
        F.max("cum_c").alias("n"), F.max("cum_m").alias("m")
    )


# ---------------------------------------------------------------------------
# lorenz_curve
# ---------------------------------------------------------------------------


def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Lorenz points: at ventile k the r_k = ⌊k·N/{_LZ_POINTS}⌋
    lowest docs hold mass cum_m(b) − (cum_c(b) − r_k)·b where b is the
    lowest value with cum_c ≥ r_k (the partial-bucket tie split);
    share_micro = halfup(1e6·mass, M).

    Scale: the 20-row spine broadcasts against the histogram; boundary
    selection is a min per k.
    """
    hist = _hist(spark, sf_dir)
    tot = _tot(hist)
    ks = spark.range(1, _LZ_POINTS + 1).select(
        F.col("id").cast("int").alias("k")
    )
    bounds = (
        hist.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .where(F.expr(f"cum_c * {_LZ_POINTS} >= k * n"))
        .groupBy("k")
        .agg(F.min("v").alias("b"))
    )
    return (
        bounds.join(
            hist.select(
                F.col("v").alias("b"), "cum_c", "cum_m"
            ),
            "b",
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "k",
            f"(k * n) DIV {_LZ_POINTS} AS r_k",
            "b AS boundary_value",
            f"cum_m - (cum_c - (k * n) DIV {_LZ_POINTS}) * b AS mass",
            f"CAST((2000000 * (cum_m - (cum_c - (k * n)"
            f" DIV {_LZ_POINTS}) * b) + m) DIV (2 * m) AS BIGINT)"
            " AS share_micro",
        )
    )


ORACLE_LORENZ_CURVE = f"""
WITH {_HIST_SQL},
ks AS (SELECT unnest(generate_series(1, {_LZ_POINTS})) AS k),
bounds AS (
  SELECT k, min(v) AS b
  FROM hist, tot, ks
  WHERE cum_c * {_LZ_POINTS} >= k * n
  GROUP BY k)
SELECT CAST(bo.k AS INT) AS k,
       CAST((bo.k * t.n) // {_LZ_POINTS} AS BIGINT) AS r_k,
       CAST(bo.b AS BIGINT) AS boundary_value,
       CAST(h.cum_m - (h.cum_c - (bo.k * t.n) // {_LZ_POINTS}) * bo.b
            AS BIGINT) AS mass,
       CAST(CAST(2000000 * (h.cum_m
                 - (h.cum_c - (bo.k * t.n) // {_LZ_POINTS}) * bo.b)
                 + t.m AS HUGEINT)
            // CAST(2 * t.m AS HUGEINT) AS BIGINT) AS share_micro
FROM bounds bo JOIN hist h ON h.v = bo.b, tot t
"""


# ---------------------------------------------------------------------------
# atkinson_index
# ---------------------------------------------------------------------------


def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson index at ε = 1: A = 1 − exp(Σ c_v·lnµ(v)/1e6/N)·N/M
    with lnµ(v) = halfup-micro(ln v) per DISTINCT value (so the
    weighted sum is exact integers) and one exp on the identical
    rational double both engines; A half-up micro-quantized.

    Scale: one histogram partial agg + a 1-row reduce.
    """
    hist = _hist(spark, sf_dir)
    sums = hist.agg(
        F.max("cum_c").alias("n"),
        F.max("cum_m").alias("m"),
        F.sum(
            F.col("c")
            * F.expr("CAST(floor(ln(CAST(v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("sum_ln_micro"),
    )
    return sums.selectExpr(
        "n",
        "m",
        "sum_ln_micro",
        "CAST(floor((1.0 - exp((CAST(sum_ln_micro AS DOUBLE) / 1e6) / n)"
        " * n / m) * 1e6 + 0.5) AS BIGINT) AS atkinson_micro",
    )


ORACLE_ATKINSON_INDEX = f"""
WITH {_HIST_SQL},
sums AS (
  SELECT max(cum_c) AS n, max(cum_m) AS m,
         CAST(sum(c * CAST(floor(ln(CAST(v AS DOUBLE)) * 1e6 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sum_ln_micro
  FROM hist)
SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m, sum_ln_micro,
       CAST(floor((1.0 - exp((CAST(sum_ln_micro AS DOUBLE) / 1e6) / n)
            * n / m) * 1e6 + 0.5) AS BIGINT) AS atkinson_micro
FROM sums
"""


# ---------------------------------------------------------------------------
# bowley_skewness / moors_kurtosis (shared octile machinery)
# ---------------------------------------------------------------------------


def _octiles(hist: DataFrame, tot: DataFrame, spark: SparkSession):
    """Exact octile values E1..E7: lowest v with 8·cum_c ≥ k·N."""
    ks = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .where(F.expr("cum_c * 8 >= k * n"))
        .groupBy("k")
        .agg(F.min("v").alias("e"))
    )


_OCTILES_SQL = """
octs AS (
  SELECT k, min(v) AS e
  FROM hist, tot, (SELECT unnest(generate_series(1, 7)) AS k)
  WHERE cum_c * 8 >= k * n
  GROUP BY k)
"""


def q_bowley_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley quartile skewness (E6+E2−2·E4)/(E6−E2) — octile indices
    2/4/6 are the quartiles — one half-up micro division on exact
    boundary values (NULL when the IQR is zero).

    Scale: histogram collapse + a 7-row pivot.
    """
    hist = _hist(spark, sf_dir)
    octs = _octiles(hist, _tot(hist), spark)
    piv = octs.groupBy().pivot("k", list(range(1, 8))).agg(
        F.min("e")
    )
    # Bowley ∈ [−1, 1] but Spark's DIV truncates toward zero while
    # DuckDB's // floors, so the half-up division is kept on positive
    # ground by shifting the ratio by +1 (numerator + denominator),
    # which commutes exactly with half-up rounding, then subtracting
    # the 1e6 back.
    return piv.selectExpr(
        "`2` AS q1",
        "`4` AS q2",
        "`6` AS q3",
        "CAST((2000000 * (`6` + `2` - 2 * `4` + (`6` - `2`))"
        " + nullif(`6` - `2`, 0))"
        " DIV nullif(2 * (`6` - `2`), 0) - 1000000 AS BIGINT)"
        " AS bowley_micro",
    )


ORACLE_BOWLEY_SKEWNESS = f"""
WITH {_HIST_SQL},
{_OCTILES_SQL},
piv AS (
  SELECT max(CASE WHEN k = 2 THEN e END) AS q1,
         max(CASE WHEN k = 4 THEN e END) AS q2,
         max(CASE WHEN k = 6 THEN e END) AS q3
  FROM octs)
SELECT CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
       CAST(q3 AS BIGINT) AS q3,
       CAST(CAST(2000000 * (q3 + q1 - 2 * q2 + (q3 - q1))
                 + nullif(q3 - q1, 0) AS HUGEINT)
            // nullif(CAST(2 * (q3 - q1) AS HUGEINT), 0)
            - 1000000 AS BIGINT) AS bowley_micro
FROM piv
"""


def q_moors_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moors octile kurtosis ((E7−E5)+(E3−E1))/(E6−E2), half-up micro
    on exact octiles (≈1.23 for a normal; larger = heavier tails).

    Scale: identical to bowley_skewness — histogram + 7-row pivot.
    """
    hist = _hist(spark, sf_dir)
    octs = _octiles(hist, _tot(hist), spark)
    piv = octs.groupBy().pivot("k", list(range(1, 8))).agg(
        F.min("e")
    )
    return piv.selectExpr(
        "`1` AS e1",
        "`3` AS e3",
        "`5` AS e5",
        "`7` AS e7",
        "CAST((2000000 * ((`7` - `5`) + (`3` - `1`))"
        " + nullif(`6` - `2`, 0))"
        " DIV nullif(2 * (`6` - `2`), 0) AS BIGINT)"
        " AS moors_micro",
    )


ORACLE_MOORS_KURTOSIS = f"""
WITH {_HIST_SQL},
{_OCTILES_SQL},
piv AS (
  SELECT max(CASE WHEN k = 1 THEN e END) AS e1,
         max(CASE WHEN k = 2 THEN e END) AS e2,
         max(CASE WHEN k = 3 THEN e END) AS e3,
         max(CASE WHEN k = 5 THEN e END) AS e5,
         max(CASE WHEN k = 6 THEN e END) AS e6,
         max(CASE WHEN k = 7 THEN e END) AS e7
  FROM octs)
SELECT CAST(e1 AS BIGINT) AS e1, CAST(e3 AS BIGINT) AS e3,
       CAST(e5 AS BIGINT) AS e5, CAST(e7 AS BIGINT) AS e7,
       CAST(CAST(2000000 * ((e7 - e5) + (e3 - e1))
                 + nullif(e6 - e2, 0) AS HUGEINT)
            // nullif(CAST(2 * (e6 - e2) AS HUGEINT), 0) AS BIGINT)
         AS moors_micro
FROM piv
"""


# ---------------------------------------------------------------------------
# palma_ratio
# ---------------------------------------------------------------------------


def q_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio: mass share of the ⌊N/10⌋ LARGEST docs over the
    mass share of the ⌊4N/10⌋ smallest — exact partial-bucket tie
    splits on both tails (top mass = M − lorenz-mass at r = N−⌊N/10⌋).

    Scale: two boundary selections over the histogram + a 1-row
    combine.
    """
    hist = _hist(spark, sf_dir)
    tot = _tot(hist)

    def mass_at(rank_expr: str):
        # lorenz mass of the `rank_expr` lowest docs
        return (
            hist.crossJoin(F.broadcast(tot))
            .where(F.expr(f"cum_c >= {rank_expr}"))
            .orderBy("v")
            .limit(1)
            .selectExpr(
                f"cum_m - (cum_c - ({rank_expr})) * v AS mass"
            )
        )

    bottom = mass_at("(4 * n) DIV 10").selectExpr(
        "mass AS bottom40_mass"
    )
    upto90 = mass_at("n - n DIV 10").selectExpr(
        "mass AS upto90_mass"
    )
    return (
        tot.crossJoin(F.broadcast(bottom))
        .crossJoin(F.broadcast(upto90))
        .selectExpr(
            "n",
            "m",
            "bottom40_mass",
            "m - upto90_mass AS top10_mass",
            "CAST((2000000 * (m - upto90_mass)"
            " + nullif(bottom40_mass, 0))"
            " DIV nullif(2 * bottom40_mass, 0) AS BIGINT)"
            " AS palma_micro",
        )
    )


ORACLE_PALMA_RATIO = f"""
WITH {_HIST_SQL},
bottom AS (
  SELECT cum_m - (cum_c - (4 * t.n) // 10) * v AS bottom40_mass
  FROM hist, tot t WHERE cum_c >= (4 * t.n) // 10
  ORDER BY v LIMIT 1),
upto90 AS (
  SELECT cum_m - (cum_c - (t.n - t.n // 10)) * v AS upto90_mass
  FROM hist, tot t WHERE cum_c >= t.n - t.n // 10
  ORDER BY v LIMIT 1)
SELECT CAST(t.n AS BIGINT) AS n, CAST(t.m AS BIGINT) AS m,
       CAST(b.bottom40_mass AS BIGINT) AS bottom40_mass,
       CAST(t.m - u.upto90_mass AS BIGINT) AS top10_mass,
       CAST(CAST(2000000 * (t.m - u.upto90_mass)
                 + nullif(b.bottom40_mass, 0) AS HUGEINT)
            // nullif(CAST(2 * b.bottom40_mass AS HUGEINT), 0)
            AS BIGINT) AS palma_micro
FROM tot t, bottom b, upto90 u
"""


INEQUALITY_QUERIES = {
    "lorenz_curve": q_lorenz_curve,
    "atkinson_index": q_atkinson_index,
    "bowley_skewness": q_bowley_skewness,
    "moors_kurtosis": q_moors_kurtosis,
    "palma_ratio": q_palma_ratio,
}

INEQUALITY_ORACLES = {
    "lorenz_curve": ORACLE_LORENZ_CURVE,
    "atkinson_index": ORACLE_ATKINSON_INDEX,
    "bowley_skewness": ORACLE_BOWLEY_SKEWNESS,
    "moors_kurtosis": ORACLE_MOORS_KURTOSIS,
    "palma_ratio": ORACLE_PALMA_RATIO,
}

_q.QUERIES.update(INEQUALITY_QUERIES)
_q.ORACLES.update(INEQUALITY_ORACLES)
