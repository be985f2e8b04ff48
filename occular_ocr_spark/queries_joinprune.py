"""Join-pruning / runtime-filter catalog, round 4 (wave 83): five
audits of the filters a distributed engine pushes from a filtered
dimension into the fact scan before paying for the join — min/max
range filters, Bloom runtime filters (Spark 3.3+
spark.sql.optimizer.runtime.bloomFilter), dynamic partition pruning,
and the semi-join reduction ledger.  Each measures, with exact
counts, how many fact rows the filter admits vs how many truly match
— the overscan a mis-sized filter costs at 100 TB.

Dim predicate under audit: customer.c_mktsegment = '{_SEG}' →
qualifying c_custkey set; fact side: orders probed on o_custkey.

* ``minmax_runtime_filter_audit`` — the cheapest runtime filter:
  fact rows inside [min, max] of the dim keys vs true semi-join
  matches; pass ratio and overscan micro.
* ``bloom_runtime_filter_audit`` — a {_BR_BITS}-bit / k={_BLOOM_K}
  Bloom of the dim keys (portable md5 hex-alphabet positions — the
  ``bloom_probe`` sketch applied as a JOIN filter), probed by every
  fact row: passed, matched, false-positive mass; no false negative
  is possible and the tests assert that.
* ``bloom_size_calibration`` — measured vs theoretical FP rate
  ((1−e^{{−kn/m}})^k, row-local IEEE micro-quantized) across the
  m ∈ {_BSC_BITS_GRID}-bit grid, FP measured over the DISTINCT
  non-member fact keys — how big the runtime filter must be before
  overscan stops paying for itself.
* ``dpp_partition_prune_audit`` — dynamic partition pruning at
  month(o_orderdate) grain: partitions (months) containing ≥1
  matching row vs all, rows scanned in kept partitions vs truly
  matching; prune and overscan micro.
* ``semijoin_reduction_ledger`` — per mktsegment: dim keys, fact
  rows the semi-join reduction would shuffle vs the full fact table —
  the per-predicate ledger of shuffle savings.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus a no-false-negative pin in tests/test_joinprune_wave.py.

Cross-engine float policy: counts and ratios are exact BIGINT
half-up micro; the one float (theoretical FP curve) is an identical
row-local IEEE expression on exact integers, micro-quantized with
floor(x·1e6+0.5).

Scale notes: every filter artifact is bounded — a 1-row min/max
aggregate, a ≤{_BR_BITS}//32-row bit_or sketch, an ≤#months partition
list — and joins into the fact scan as a broadcast; the true-match
side is one semi-join on the dim key (broadcast-sized dim).  The
member table is never shuffled against the fact table to BUILD any
filter — that is the point of carrying the sketch.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_SEG = "BUILDING"
_BLOOM_K = 3
_BR_BITS = 1024
_BSC_BITS_GRID = [256, 1024, 4096]


def _positions(col: str, m_bits: int, dialect: str) -> list:
    """k portable hash positions mod m for a BIGINT key column (the
    ``bloom_probe`` hex-alphabet idiom, 16-bit draw per function)."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"

    def hexv(i: int, j: int) -> str:
        return (
            f"(instr('0123456789abcdef', substr(md5("
            f"CAST({col} AS {strtype}) || ':j{i}'"
            f"), {j}, 1)) - 1)"
        )

    return [
        f"(((({hexv(i, 1)} * 16 + {hexv(i, 2)}) * 16 + {hexv(i, 3)})"
        f" * 16 + {hexv(i, 4)}) % {m_bits})"
        for i in range(_BLOOM_K)
    ]


# ---------------------------------------------------------------------------
# minmax_runtime_filter_audit
# ---------------------------------------------------------------------------


def q_minmax_runtime_filter_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[min, max] dim-key range filter vs true semi-join matches on
    the fact scan."""
    dim = (
        _t(spark, sf_dir, "customer")
        .where(f"c_mktsegment = '{_SEG}'")
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    rng = dim.agg(
        F.count("*").cast("long").alias("n_dim_keys"),
        F.min("k").alias("kmin"),
        F.max("k").alias("kmax"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k")
    )
    matches = o.join(dim, "k", "left_semi").agg(
        F.count("*").cast("long").alias("match_rows")
    )
    passed = o.crossJoin(F.broadcast(rng)).agg(
        F.count("*").cast("long").alias("fact_rows"),
        F.sum(F.expr("CASE WHEN k BETWEEN kmin AND kmax THEN 1L"
                     " ELSE 0L END")).cast("long").alias("passed_rows"),
        F.max("n_dim_keys").cast("long").alias("n_dim_keys"),
        F.max("kmin").cast("long").alias("kmin"),
        F.max("kmax").cast("long").alias("kmax"),
    )
    return passed.crossJoin(F.broadcast(matches)).selectExpr(
        "n_dim_keys",
        "kmin",
        "kmax",
        "fact_rows",
        "passed_rows",
        "match_rows",
        "CAST((2000000 * passed_rows + fact_rows) DIV (2 * fact_rows)"
        " AS BIGINT) AS pass_micro",
        "CASE WHEN passed_rows > 0 THEN CAST((2000000 * (passed_rows"
        " - match_rows) + passed_rows) DIV (2 * passed_rows) AS BIGINT)"
        " ELSE 0L END AS overscan_micro",
    )


ORACLE_MINMAX_RUNTIME_FILTER_AUDIT = f"""
WITH dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
  WHERE c_mktsegment = '{_SEG}'),
rng AS (
  SELECT CAST(count(*) AS BIGINT) AS n_dim_keys,
         CAST(min(k) AS BIGINT) AS kmin,
         CAST(max(k) AS BIGINT) AS kmax
  FROM dim),
o AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders),
matches AS (
  SELECT CAST(count(*) AS BIGINT) AS match_rows FROM o
  WHERE EXISTS (SELECT 1 FROM dim d WHERE d.k = o.k)),
passed AS (
  SELECT CAST(count(*) AS BIGINT) AS fact_rows,
         CAST(sum(CASE WHEN o.k BETWEEN r.kmin AND r.kmax THEN 1
              ELSE 0 END) AS BIGINT) AS passed_rows,
         CAST(max(r.n_dim_keys) AS BIGINT) AS n_dim_keys,
         CAST(max(r.kmin) AS BIGINT) AS kmin,
         CAST(max(r.kmax) AS BIGINT) AS kmax
  FROM o CROSS JOIN rng r)
SELECT p.n_dim_keys, p.kmin, p.kmax, p.fact_rows, p.passed_rows,
       m.match_rows,
       CAST((2000000 * p.passed_rows + p.fact_rows)
            // (2 * p.fact_rows) AS BIGINT) AS pass_micro,
       CASE WHEN p.passed_rows > 0 THEN
         CAST((2000000 * (p.passed_rows - m.match_rows)
              + p.passed_rows) // (2 * p.passed_rows) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS overscan_micro
FROM passed p CROSS JOIN matches m
"""


# ---------------------------------------------------------------------------
# bloom_runtime_filter_audit
# ---------------------------------------------------------------------------


def q_bloom_runtime_filter_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A 1024-bit Bloom of the dim keys probed by every fact row:
    passed vs matched vs false-positive mass."""
    dim = (
        _t(spark, sf_dir, "customer")
        .where(f"c_mktsegment = '{_SEG}'")
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    pos = "array(" + ", ".join(_positions("k", _BR_BITS, "spark")) + ")"
    bloom = (
        dim.select(F.explode(F.expr(pos)).alias("p"))
        .select(
            (F.col("p") / 32).cast("int").alias("word"),
            F.expr("CAST(shiftleft(1, p % 32) AS BIGINT)").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    # _spread before the per-row position explode (single local split
    # otherwise; no-op at scale — guide §2.5)
    o = _q._spread(
        _t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("long").alias("okey"),
            F.col("o_custkey").cast("long").alias("k"),
        )
    )
    probes = o.select(
        "okey", "k", F.explode(F.expr(pos)).alias("p")
    ).select(
        "okey",
        "k",
        (F.col("p") / 32).cast("int").alias("word"),
        F.expr("CAST(shiftleft(1, p % 32) AS BIGINT)").alias("mask"),
    )
    # persisted: the match semi-join and the pass rollup both read the
    # per-row verdicts — unpersisted each re-ran the probe explode +
    # bloom join + groupBy
    per_row = _q._persist_tracked(
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            "okey",
            "k",
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            )
            .cast("int")
            .alias("hit"),
        )
        .groupBy("okey", "k")
        .agg(F.min("hit").alias("pass_"))
    )
    matched = per_row.join(dim, "k", "left_semi").agg(
        F.count("*").cast("long").alias("match_rows")
    )
    agg = per_row.agg(
        F.count("*").cast("long").alias("fact_rows"),
        F.sum("pass_").cast("long").alias("passed_rows"),
    )
    ndim = dim.agg(F.count("*").cast("long").alias("n_dim_keys"))
    return (
        agg.crossJoin(F.broadcast(matched))
        .crossJoin(F.broadcast(ndim))
        .selectExpr(
            "n_dim_keys",
            f"CAST({_BR_BITS} AS BIGINT) AS m_bits",
            "fact_rows",
            "passed_rows",
            "match_rows",
            "passed_rows - match_rows AS fp_rows",
            "CAST((2000000 * passed_rows + fact_rows)"
            " DIV (2 * fact_rows) AS BIGINT) AS pass_micro",
            "CASE WHEN fact_rows - match_rows > 0 THEN"
            " CAST((2000000 * (passed_rows - match_rows)"
            " + (fact_rows - match_rows)) DIV (2 * (fact_rows"
            " - match_rows)) AS BIGINT) ELSE 0L END AS fp_micro",
        )
    )


def _oracle_bloom_runtime() -> str:
    pos = _positions("k", _BR_BITS, "duck")
    dim_pos = " UNION ALL ".join(
        f"SELECT k, ({p}) AS p FROM dim" for p in pos
    )
    fact_pos = " UNION ALL ".join(
        f"SELECT okey, k, ({p}) AS p FROM o" for p in pos
    )
    return f"""
WITH dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
  WHERE c_mktsegment = '{_SEG}'),
dpos AS ({dim_pos}),
bloom AS (
  SELECT CAST(p // 32 AS INT) AS word,
         bit_or(CAST((1 << (p % 32)) AS BIGINT)) AS bits
  FROM dpos GROUP BY 1),
o AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
             CAST(o_custkey AS BIGINT) AS k FROM orders),
fpos AS ({fact_pos}),
per_row AS (
  SELECT f.okey, f.k,
         min(CASE WHEN b.bits IS NOT NULL
               AND (b.bits & CAST((1 << (f.p % 32)) AS BIGINT))
                 = CAST((1 << (f.p % 32)) AS BIGINT)
             THEN 1 ELSE 0 END) AS pass_
  FROM fpos f LEFT JOIN bloom b ON b.word = CAST(f.p // 32 AS INT)
  GROUP BY f.okey, f.k),
matched AS (
  SELECT CAST(count(*) AS BIGINT) AS match_rows FROM per_row r
  WHERE EXISTS (SELECT 1 FROM dim d WHERE d.k = r.k)),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS fact_rows,
         CAST(sum(pass_) AS BIGINT) AS passed_rows
  FROM per_row),
ndim AS (SELECT CAST(count(*) AS BIGINT) AS n_dim_keys FROM dim)
SELECT n.n_dim_keys, CAST({_BR_BITS} AS BIGINT) AS m_bits,
       a.fact_rows, a.passed_rows, m.match_rows,
       a.passed_rows - m.match_rows AS fp_rows,
       CAST((2000000 * a.passed_rows + a.fact_rows)
            // (2 * a.fact_rows) AS BIGINT) AS pass_micro,
       CASE WHEN a.fact_rows - m.match_rows > 0 THEN
         CAST((2000000 * (a.passed_rows - m.match_rows)
              + (a.fact_rows - m.match_rows)) // (2 * (a.fact_rows
              - m.match_rows)) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS fp_micro
FROM agg a CROSS JOIN matched m CROSS JOIN ndim n
"""


ORACLE_BLOOM_RUNTIME_FILTER_AUDIT = _oracle_bloom_runtime()


# ---------------------------------------------------------------------------
# bloom_size_calibration
# ---------------------------------------------------------------------------


def _calibration_sql(dialect: str) -> str:
    """Measured vs theoretical FP per m, one UNION ALL leg per grid
    size (the grid is 3 constants — each leg reuses the same bounded
    dim/probe CTEs)."""
    legs = []
    for m_bits in _BSC_BITS_GRID:
        pos = _positions("k", m_bits, dialect)
        dim_pos = " UNION ALL ".join(
            f"SELECT k, ({p}) AS p FROM dim" for p in pos
        )
        probe_pos = " UNION ALL ".join(
            f"SELECT k, ({p}) AS p FROM nonmember" for p in pos
        )
        intdiv = "DIV" if dialect == "spark" else "//"
        legs.append(f"""
SELECT CAST({m_bits} AS BIGINT) AS m_bits,
       (SELECT CAST(count(*) AS BIGINT) FROM dim) AS n_member_keys,
       CAST(count(*) AS BIGINT) AS probe_keys,
       CAST(sum(pass_) AS BIGINT) AS fp_keys,
       CAST((2000000 * sum(pass_) + count(*)) {intdiv} (2 * count(*))
            AS BIGINT) AS fp_measured_micro,
       CAST(floor(power(1.0 - exp(-{_BLOOM_K}.0
            * (SELECT CAST(count(*) AS DOUBLE) FROM dim)
            / {m_bits}.0), {_BLOOM_K}.0) * 1e6 + 0.5) AS BIGINT)
         AS fp_theory_micro
FROM (
  SELECT f.k,
         min(CASE WHEN b.bits IS NOT NULL
               AND (b.bits & CAST(({{one}} << (f.p % 32)) AS BIGINT))
                 = CAST(({{one}} << (f.p % 32)) AS BIGINT)
             THEN 1 ELSE 0 END) AS pass_
  FROM ({probe_pos}) f
  LEFT JOIN (
    SELECT CAST(p {intdiv} 32 AS INT) AS word,
           bit_or(CAST(({{one}} << (p % 32)) AS BIGINT)) AS bits
    FROM ({dim_pos}) GROUP BY 1) b
    ON b.word = CAST(f.p {intdiv} 32 AS INT)
  GROUP BY f.k) t""")
    shift_one = "shiftleft(1, " if dialect == "spark" else "(1 << ("
    body = " UNION ALL ".join(legs)
    if dialect == "spark":
        body = body.replace("({one} << (f.p % 32))", "shiftleft(1, f.p % 32)")
        body = body.replace("({one} << (p % 32))", "shiftleft(1, p % 32)")
    else:
        body = body.replace("{one}", "1")
    return f"""
WITH dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
  WHERE c_mktsegment = '{_SEG}'),
fact_keys AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS k FROM orders),
nonmember AS (
  SELECT f.k FROM fact_keys f
  WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.k = f.k))
{body}
"""


def q_bloom_size_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs theoretical Bloom FP rate across the m-bit grid,
    on distinct non-member fact keys."""
    _q._register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_calibration_sql("spark"))


ORACLE_BLOOM_SIZE_CALIBRATION = _calibration_sql("duck")


# ---------------------------------------------------------------------------
# dpp_partition_prune_audit
# ---------------------------------------------------------------------------


def q_dpp_partition_prune_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition pruning at month grain: partitions kept vs
    all, rows scanned vs truly matching."""
    dim = (
        _t(spark, sf_dir, "customer")
        .where(f"c_mktsegment = '{_SEG}'")
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    o = _t(spark, sf_dir, "orders").selectExpr(
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS pmonth",
        "CAST(o_custkey AS BIGINT) AS k",
    )
    per_part = _q._persist_tracked(
        o.join(dim.selectExpr("k", "1L AS hit"), "k", "left")
        .groupBy("pmonth")
        .agg(
            F.count("*").cast("long").alias("p_rows"),
            F.sum(F.expr("coalesce(hit, 0L)")).cast("long").alias("p_match"),
        )
    )
    return per_part.agg(
        F.count("*").cast("long").alias("total_partitions"),
        F.sum(F.expr("CASE WHEN p_match > 0 THEN 1L ELSE 0L END"))
        .cast("long")
        .alias("partitions_kept"),
        F.sum("p_rows").cast("long").alias("rows_total"),
        F.sum(F.expr("CASE WHEN p_match > 0 THEN p_rows ELSE 0L END"))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("p_match").cast("long").alias("rows_matching"),
    ).selectExpr(
        "total_partitions",
        "partitions_kept",
        "rows_total",
        "rows_scanned",
        "rows_matching",
        "CAST((2000000 * (total_partitions - partitions_kept)"
        " + total_partitions) DIV (2 * total_partitions) AS BIGINT)"
        " AS prune_micro",
        "CASE WHEN rows_scanned > 0 THEN CAST((2000000 * (rows_scanned"
        " - rows_matching) + rows_scanned) DIV (2 * rows_scanned)"
        " AS BIGINT) ELSE 0L END AS overscan_micro",
    )


ORACLE_DPP_PARTITION_PRUNE_AUDIT = f"""
WITH dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
  WHERE c_mktsegment = '{_SEG}'),
o AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS pmonth,
         CAST(o_custkey AS BIGINT) AS k
  FROM orders),
per_part AS (
  SELECT o.pmonth,
         CAST(count(*) AS BIGINT) AS p_rows,
         CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM dim d
              WHERE d.k = o.k) THEN 1 ELSE 0 END) AS BIGINT) AS p_match
  FROM o GROUP BY o.pmonth),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS total_partitions,
         CAST(sum(CASE WHEN p_match > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS partitions_kept,
         CAST(sum(p_rows) AS BIGINT) AS rows_total,
         CAST(sum(CASE WHEN p_match > 0 THEN p_rows ELSE 0 END)
              AS BIGINT) AS rows_scanned,
         CAST(sum(p_match) AS BIGINT) AS rows_matching
  FROM per_part)
SELECT total_partitions, partitions_kept, rows_total, rows_scanned,
       rows_matching,
       CAST((2000000 * (total_partitions - partitions_kept)
            + total_partitions) // (2 * total_partitions) AS BIGINT)
         AS prune_micro,
       CASE WHEN rows_scanned > 0 THEN
         CAST((2000000 * (rows_scanned - rows_matching)
              + rows_scanned) // (2 * rows_scanned) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS overscan_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# semijoin_reduction_ledger
# ---------------------------------------------------------------------------


def q_semijoin_reduction_ledger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per mktsegment: fact rows the semi-join reduction would
    shuffle vs the full fact table — the shuffle-savings ledger."""
    segs = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_dim_keys"))
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k")
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"), "c_mktsegment"
    )
    per_seg = (
        o.join(cust, "k")
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("match_rows"))
    )
    tot = o.agg(F.count("*").cast("long").alias("fact_rows"))
    return (
        segs.join(per_seg, "c_mktsegment", "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "c_mktsegment",
            "n_dim_keys",
            "coalesce(match_rows, 0L) AS match_rows",
            "fact_rows",
            "CAST((2000000 * (fact_rows - coalesce(match_rows, 0L))"
            " + fact_rows) DIV (2 * fact_rows) AS BIGINT)"
            " AS reduction_micro",
        )
    )


ORACLE_SEMIJOIN_REDUCTION_LEDGER = """
WITH segs AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_dim_keys
  FROM customer GROUP BY c_mktsegment),
o AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders),
cust AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment
         FROM customer),
per_seg AS (
  SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS match_rows
  FROM o JOIN cust c ON c.k = o.k
  GROUP BY c.c_mktsegment),
tot AS (SELECT CAST(count(*) AS BIGINT) AS fact_rows FROM o)
SELECT s.c_mktsegment, s.n_dim_keys,
       coalesce(p.match_rows, 0) AS match_rows,
       t.fact_rows,
       CAST((2000000 * (t.fact_rows - coalesce(p.match_rows, 0))
            + t.fact_rows) // (2 * t.fact_rows) AS BIGINT)
         AS reduction_micro
FROM segs s LEFT JOIN per_seg p ON p.c_mktsegment = s.c_mktsegment
CROSS JOIN tot t
"""


JOINPRUNE_QUERIES = {
    "minmax_runtime_filter_audit": q_minmax_runtime_filter_audit,
    "bloom_runtime_filter_audit": q_bloom_runtime_filter_audit,
    "bloom_size_calibration": q_bloom_size_calibration,
    "dpp_partition_prune_audit": q_dpp_partition_prune_audit,
    "semijoin_reduction_ledger": q_semijoin_reduction_ledger,
}

JOINPRUNE_ORACLES = {
    "minmax_runtime_filter_audit": ORACLE_MINMAX_RUNTIME_FILTER_AUDIT,
    "bloom_runtime_filter_audit": ORACLE_BLOOM_RUNTIME_FILTER_AUDIT,
    "bloom_size_calibration": ORACLE_BLOOM_SIZE_CALIBRATION,
    "dpp_partition_prune_audit": ORACLE_DPP_PARTITION_PRUNE_AUDIT,
    "semijoin_reduction_ledger": ORACLE_SEMIJOIN_REDUCTION_LEDGER,
}

_q.QUERIES.update(JOINPRUNE_QUERIES)
_q.ORACLES.update(JOINPRUNE_ORACLES)
