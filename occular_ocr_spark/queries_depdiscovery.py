"""Dependency-discovery catalog, round 4 (wave 93): five data-
profiling operators from the TANE/Metanome lineage — functional
dependencies, approximate-FD g3 errors, inclusion dependencies (FK
discovery), key discovery, and an FD-transitivity certification —
the schema-inference pass a lakehouse runs before trusting a new
table, each with exact counts.

* ``fd_candidate_scan`` — every ordered pair (A→B) over the part
  attributes plus two construction-guaranteed derivations
  (brand_pfx = substr(p_brand,1,6), name_len = length(p_name), so
  the discovered lattice provably contains p_partkey→X, p_brand→
  brand_pfx, p_name→name_len): distinct LHS groups, groups violating
  the FD (>1 distinct RHS), and the holds flag — exact, from one
  (pair, a, b) partial-agg pass.
* ``afd_g3_error`` — the standard g3 approximate-FD error per pair:
  (N − Σ_groups max single-RHS count)/N in half-up micro — the
  minimum fraction of rows to delete for the FD to hold.
* ``ind_discovery_scan`` — candidate inclusion dependencies across
  tables (the real FK lattice {_IND_POS} plus deliberate negatives):
  distinct LHS values, values missing from the RHS, the holds flag —
  distinct-project + anti-join per candidate.
* ``key_discovery_audit`` — candidate keys: uniqueness ratio
  (distinct/rows, half-up micro) and the is_key flag for single
  columns across part/supplier/nation/region/orders and the
  composite (l_orderkey, l_linenumber).
* ``fd_transitivity_check`` — for every chain A→B→C among the
  HOLDING FDs from the pair scan: the A→C holds flag — Armstrong
  transitivity certified on live data (must be universally true; a
  FALSE would mean the pair scan itself is broken).

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_depdiscovery_wave.py.

Cross-engine float policy: pure exact BIGINT counts and half-up
micro ratios — no floating point in this wave.

Scale notes: the FD pass is one (pair, a, b) partial agg (12 pair
projections unioned over the pruned scan) reduced to per-LHS-group
rows before any global agg; INDs are distinct-project anti-joins on
the key columns; nothing materializes row-level data beyond the
grouped frames; no corpus-sized window, no driver loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_FD_COLS = [
    "p_partkey",
    "p_name",
    "p_brand",
    "p_type",
    "p_size",
    "brand_pfx",
    "name_len",
]
_IND_POS = [
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]
_IND_NEG = [
    ("part", "p_size", "nation", "n_nationkey"),
    ("lineitem", "l_linenumber", "region", "r_regionkey"),
]
_KEY_CANDS = [
    ("part", "p_partkey"),
    ("part", "p_name"),
    ("part", "p_brand"),
    ("supplier", "s_suppkey"),
    ("nation", "n_nationkey"),
    ("region", "r_regionkey"),
    ("orders", "o_orderkey"),
]


def _pairs_sql(strtype: str) -> str:
    legs = []
    for a, b in permutations(_FD_COLS, 2):
        legs.append(
            f"SELECT '{a}>{b}' AS pair, CAST({a} AS {strtype}) AS a,"
            f" CAST({b} AS {strtype}) AS b FROM base"
        )
    body = " UNION ALL ".join(legs)
    return f"""
base AS (
  SELECT p_partkey, p_name, p_brand, p_type, p_size,
         substr(p_brand, 1, 6) AS brand_pfx,
         length(p_name) AS name_len
  FROM part),
pairs AS ({body}),
ab AS (
  SELECT pair, a, b, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY pair, a, b),
per_a AS (
  SELECT pair, a,
         CAST(sum(n) AS BIGINT) AS rows_a,
         CAST(max(n) AS BIGINT) AS max_b,
         CAST(count(*) AS BIGINT) AS distinct_b
  FROM ab GROUP BY pair, a)
"""


# ---------------------------------------------------------------------------
# fd_candidate_scan
# ---------------------------------------------------------------------------


def _fd_sql(dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
WITH {_pairs_sql(strtype)}
SELECT pair,
       CAST(count(*) AS BIGINT) AS lhs_groups,
       CAST(sum(CASE WHEN distinct_b > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS violating_groups,
       CAST(sum(CASE WHEN distinct_b > 1 THEN 1 ELSE 0 END) = 0
            AS BOOLEAN) AS holds
FROM per_a GROUP BY pair
"""


def _pairs_df(spark: SparkSession, sf_dir: str):
    """(pair, a, b) stream for every ordered attribute pair, plus the
    per-(pair, a) group stats — the Spark twin of ``_pairs_sql``.

    The SQL form UNION ALLs 42 separate scans of ``part`` (one per
    pair, each inheriting the single-split fixture's 1-task scan and
    its own codegen segment); here ``part`` is scanned ONCE and the 42
    (pair, a, b) rows per input row are emitted map-side from one
    inline struct array (guide §2.4 — the oracle keeps the UNION text,
    the engines stay value-identical because explode emits exactly the
    union's rows).
    """
    from pyspark.sql import functions as F

    base = _q._spread(
        _q._t(spark, sf_dir, "part")
        .select(
            "p_partkey", "p_name", "p_brand", "p_type", "p_size",
            F.expr("substr(p_brand, 1, 6)").alias("brand_pfx"),
            F.length("p_name").alias("name_len"),
        )
    )
    pairs = base.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(f"{a}>{b}").alias("pair"),
                    F.col(a).cast("string").alias("a"),
                    F.col(b).cast("string").alias("b"),
                )
                for a, b in permutations(_FD_COLS, 2)
            ])
        ).alias("p")
    ).select("p.*")
    ab = pairs.groupBy("pair", "a", "b").agg(F.count("*").alias("n"))
    return ab.groupBy("pair", "a").agg(
        F.sum("n").alias("rows_a"),
        F.max("n").alias("max_b"),
        F.count("*").alias("distinct_b"),
    )


def q_fd_candidate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact FD check for every ordered attribute pair."""
    from pyspark.sql import functions as F

    return _pairs_df(spark, sf_dir).groupBy("pair").agg(
        F.count("*").cast("bigint").alias("lhs_groups"),
        F.sum(F.when(F.col("distinct_b") > 1, 1).otherwise(0))
        .cast("bigint").alias("violating_groups"),
        (F.sum(F.when(F.col("distinct_b") > 1, 1).otherwise(0)) == 0)
        .cast("boolean").alias("holds"),
    )


ORACLE_FD_CANDIDATE_SCAN = _fd_sql("duck")


# ---------------------------------------------------------------------------
# afd_g3_error
# ---------------------------------------------------------------------------


def _g3_sql(dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_pairs_sql(strtype)}
SELECT pair,
       CAST(sum(rows_a) AS BIGINT) AS n_rows,
       CAST(sum(rows_a) - sum(max_b) AS BIGINT) AS rows_to_delete,
       CAST((2000000 * (sum(rows_a) - sum(max_b)) + sum(rows_a))
            {intdiv} (2 * sum(rows_a)) AS BIGINT) AS g3_micro
FROM per_a GROUP BY pair
"""


def q_afd_g3_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3 approximate-FD error per pair, half-up micro."""
    from pyspark.sql import functions as F

    return _pairs_df(spark, sf_dir).groupBy("pair").agg(
        F.sum("rows_a").cast("bigint").alias("n_rows"),
        (F.sum("rows_a") - F.sum("max_b")).cast("bigint")
        .alias("rows_to_delete"),
        F.expr(
            "CAST((2000000 * (sum(rows_a) - sum(max_b)) + sum(rows_a))"
            " DIV (2 * sum(rows_a)) AS BIGINT)"
        ).alias("g3_micro"),
    )


ORACLE_AFD_G3_ERROR = _g3_sql("duck")


# ---------------------------------------------------------------------------
# ind_discovery_scan
# ---------------------------------------------------------------------------


def _ind_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    legs = []
    for lt, lc, rt, rc in _IND_POS + _IND_NEG:
        legs.append(f"""
SELECT '{lt}.{lc} ⊆ {rt}.{rc}' AS candidate,
       CAST(count(*) AS BIGINT) AS lhs_distinct,
       CAST(sum(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS missing_values,
       CAST(sum(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) = 0
            AS BOOLEAN) AS holds
FROM (SELECT DISTINCT CAST({lc} AS BIGINT) AS v FROM {lt}) l
LEFT JOIN (SELECT DISTINCT CAST({rc} AS BIGINT) AS v FROM {rt}) r
  ON r.v = l.v""")
    return " UNION ALL ".join(legs)


def q_ind_discovery_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency candidates: FK lattice + negatives."""
    _q._register_views(
        spark,
        sf_dir,
        ["lineitem", "part", "supplier", "orders", "customer", "nation",
         "region"],
    )
    return spark.sql(_ind_sql("spark"))


ORACLE_IND_DISCOVERY_SCAN = _ind_sql("duck")


# ---------------------------------------------------------------------------
# key_discovery_audit
# ---------------------------------------------------------------------------


def _key_sql(dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    intdiv = "DIV" if dialect == "spark" else "//"
    legs = []
    for t, c in _KEY_CANDS:
        legs.append(f"""
SELECT '{t}.{c}' AS candidate,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT CAST({c} AS {strtype})) AS BIGINT)
         AS n_distinct,
       CAST((2000000 * count(DISTINCT CAST({c} AS {strtype}))
            + count(*)) {intdiv} (2 * count(*)) AS BIGINT)
         AS uniqueness_micro,
       CAST(count(DISTINCT CAST({c} AS {strtype})) = count(*)
            AS BOOLEAN) AS is_key
FROM {t}""")
    legs.append(f"""
SELECT 'lineitem.(l_orderkey,l_linenumber)' AS candidate,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT CAST(l_orderkey AS {strtype}) || ':' ||
            CAST(l_linenumber AS {strtype})) AS BIGINT) AS n_distinct,
       CAST((2000000 * count(DISTINCT CAST(l_orderkey AS {strtype})
            || ':' || CAST(l_linenumber AS {strtype})) + count(*))
            {intdiv} (2 * count(*)) AS BIGINT) AS uniqueness_micro,
       CAST(count(DISTINCT CAST(l_orderkey AS {strtype}) || ':' ||
            CAST(l_linenumber AS {strtype})) = count(*) AS BOOLEAN)
         AS is_key
FROM lineitem""")
    return " UNION ALL ".join(legs)


def q_key_discovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness ratios + is_key flags for the candidate keys."""
    _q._register_views(
        spark,
        sf_dir,
        ["part", "supplier", "nation", "region", "orders", "lineitem"],
    )
    return spark.sql(_key_sql("spark"))


ORACLE_KEY_DISCOVERY_AUDIT = _key_sql("duck")


# ---------------------------------------------------------------------------
# fd_transitivity_check
# ---------------------------------------------------------------------------


def _trans_sql(dialect: str) -> str:
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
WITH {_pairs_sql(strtype)},
fds AS (
  SELECT pair,
         CAST(sum(CASE WHEN distinct_b > 1 THEN 1 ELSE 0 END) = 0
              AS BOOLEAN) AS holds
  FROM per_a GROUP BY pair),
held AS (
  SELECT {("split(pair, '>')[0]" if dialect == "spark"
           else "string_split(pair, '>')[1]")} AS lhs,
         {("split(pair, '>')[1]" if dialect == "spark"
           else "string_split(pair, '>')[2]")} AS rhs
  FROM fds WHERE holds),
chains AS (
  SELECT a.lhs AS col_a, a.rhs AS col_b, b.rhs AS col_c
  FROM held a JOIN held b ON b.lhs = a.rhs
  WHERE b.rhs <> a.lhs AND b.rhs <> a.rhs)
SELECT c.col_a, c.col_b, c.col_c,
       coalesce(f.holds, FALSE) AS a_to_c_holds
FROM chains c
LEFT JOIN fds f ON f.pair = c.col_a || '>' || c.col_c
"""


def q_fd_transitivity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Armstrong transitivity over the discovered FDs — must hold
    universally.

    Built on the shared one-scan ``_pairs_df`` kernel; ``fds`` is
    persisted because Spark inlines CTEs, so the SQL form re-ran the
    42-leg pairs pyramid once per reference (held a, held b, and the
    final left join).
    """
    fds = _q._persist_tracked(
        _pairs_df(spark, sf_dir).groupBy("pair").agg(
            (F.sum(F.when(F.col("distinct_b") > 1, 1).otherwise(0)) == 0)
            .alias("holds")
        )
    )
    held = fds.where("holds").select(
        F.expr("split(pair, '>')[0]").alias("lhs"),
        F.expr("split(pair, '>')[1]").alias("rhs"),
    )
    a, b = held.alias("a"), held.alias("b")
    chains = (
        a.join(b, F.col("b.lhs") == F.col("a.rhs"))
        .where(
            (F.col("b.rhs") != F.col("a.lhs"))
            & (F.col("b.rhs") != F.col("a.rhs"))
        )
        .select(
            F.col("a.lhs").alias("col_a"),
            F.col("a.rhs").alias("col_b"),
            F.col("b.rhs").alias("col_c"),
        )
    )
    return chains.join(
        fds,
        F.col("pair") == F.concat_ws(">", F.col("col_a"), F.col("col_c")),
        "left",
    ).select(
        "col_a",
        "col_b",
        "col_c",
        F.coalesce("holds", F.lit(False)).alias("a_to_c_holds"),
    )


ORACLE_FD_TRANSITIVITY_CHECK = _trans_sql("duck")


DEPDISCOVERY_QUERIES = {
    "fd_candidate_scan": q_fd_candidate_scan,
    "afd_g3_error": q_afd_g3_error,
    "ind_discovery_scan": q_ind_discovery_scan,
    "key_discovery_audit": q_key_discovery_audit,
    "fd_transitivity_check": q_fd_transitivity_check,
}

DEPDISCOVERY_ORACLES = {
    "fd_candidate_scan": ORACLE_FD_CANDIDATE_SCAN,
    "afd_g3_error": ORACLE_AFD_G3_ERROR,
    "ind_discovery_scan": ORACLE_IND_DISCOVERY_SCAN,
    "key_discovery_audit": ORACLE_KEY_DISCOVERY_AUDIT,
    "fd_transitivity_check": ORACLE_FD_TRANSITIVITY_CHECK,
}

_q.QUERIES.update(DEPDISCOVERY_QUERIES)
_q.ORACLES.update(DEPDISCOVERY_ORACLES)
