"""Supply-resilience catalog, round 4 (wave 107): five operators on
the part↔supplier bipartite graph (distinct lineitem edges) — the
supply-chain risk questions a procurement team asks: degree
profiles, single-source fragility, hub-failure impact, supplier
substitutability, and density — all exact counts.

* ``ps_graph_degree_profile`` — both degree distributions (how many
  suppliers per part, parts per supplier) as histograms with share
  micro.
* ``single_source_parts_report`` — parts with exactly one supplier:
  count, their revenue at risk, share of parts and of revenue micro
  — the fragility headline.
* ``hub_attack_robustness`` — remove the top-{_ATTACK_K} suppliers
  by part-degree (deterministic (degree DESC, key) TakeOrdered):
  parts stranded (no remaining supplier), revenue stranded — the
  targeted-failure impact.
* ``supplier_overlap_jaccard`` — the top-{_OVL_K} supplier pairs by
  shared-part Jaccard (exact rational micro, pairs enumerated via
  the shared-part join, |A∪B| = dA + dB − shared) — who can cover
  for whom.
* ``bipartite_density_report`` — parts, suppliers, edges, possible
  edges, density micro, exact mean degrees both sides.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_resilience_wave.py.

Cross-engine float policy: pure BIGINT counts and half-up micro
ratios — no floating point in this wave.

Scale notes: edges come from one DISTINCT projection of the fact
scan; degrees are partial aggs on each side; the overlap join keys
on the shared part (never all supplier pairs blindly — pairs appear
only where a shared part exists); the attack list is TakeOrdered.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_ATTACK_K = 5
_OVL_K = 15

_EDGES_SQL = """
edges AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
pdeg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY p),
sdeg AS (
  SELECT s, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY s)
"""


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    _q._register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# ps_graph_degree_profile
# ---------------------------------------------------------------------------


def _deg_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_EDGES_SQL},
ph AS (
  SELECT 'suppliers_per_part' AS side, d,
         CAST(count(*) AS BIGINT) AS n_nodes
  FROM pdeg GROUP BY d),
sh AS (
  SELECT 'parts_per_supplier' AS side, d,
         CAST(count(*) AS BIGINT) AS n_nodes
  FROM sdeg GROUP BY d),
u AS (SELECT * FROM ph UNION ALL SELECT * FROM sh)
SELECT side, d AS degree, n_nodes,
       CAST((2000000 * n_nodes + sum(n_nodes) OVER (PARTITION BY
            side)) {intdiv} (2 * sum(n_nodes) OVER (PARTITION BY
            side)) AS BIGINT) AS share_micro
FROM u
"""


def q_ps_graph_degree_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree histograms for both bipartite sides."""
    return _run(spark, sf_dir, _deg_sql("spark"))


ORACLE_PS_GRAPH_DEGREE_PROFILE = _deg_sql("duck")


# ---------------------------------------------------------------------------
# single_source_parts_report
# ---------------------------------------------------------------------------


def _single_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_EDGES_SQL},
rev AS (
  SELECT l_partkey AS p,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS r
  FROM lineitem GROUP BY l_partkey),
single AS (SELECT p FROM pdeg WHERE d = 1),
agg AS (
  SELECT CAST((SELECT count(*) FROM single) AS BIGINT)
           AS single_source_parts,
         CAST((SELECT count(*) FROM pdeg) AS BIGINT) AS total_parts,
         CAST((SELECT coalesce(sum(r.r), 0) FROM single g
               JOIN rev r ON r.p = g.p) AS BIGINT) AS revenue_at_risk,
         CAST((SELECT sum(r) FROM rev) AS BIGINT) AS total_revenue)
SELECT single_source_parts, total_parts, revenue_at_risk,
       total_revenue,
       CAST((2000000 * single_source_parts + total_parts)
            {intdiv} (2 * total_parts) AS BIGINT) AS part_share_micro,
       CAST((2000000 * revenue_at_risk + total_revenue)
            {intdiv} (2 * total_revenue) AS BIGINT)
         AS revenue_share_micro
FROM agg
"""


def q_single_source_parts_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-supplier parts and their revenue at risk."""
    return _run(spark, sf_dir, _single_sql("spark"))


ORACLE_SINGLE_SOURCE_PARTS_REPORT = _single_sql("duck")


# ---------------------------------------------------------------------------
# hub_attack_robustness
# ---------------------------------------------------------------------------


def _attack_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_EDGES_SQL},
rev AS (
  SELECT l_partkey AS p,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS r
  FROM lineitem GROUP BY l_partkey),
hubs AS (
  SELECT s FROM sdeg ORDER BY d DESC, s LIMIT {_ATTACK_K}),
surviving AS (
  SELECT e.p, CAST(count(*) AS BIGINT) AS d_left
  FROM edges e
  WHERE NOT EXISTS (SELECT 1 FROM hubs h WHERE h.s = e.s)
  GROUP BY e.p),
stranded AS (
  SELECT pd.p FROM pdeg pd
  WHERE NOT EXISTS (SELECT 1 FROM surviving v WHERE v.p = pd.p)),
agg AS (
  SELECT CAST({_ATTACK_K} AS BIGINT) AS suppliers_removed,
         CAST((SELECT count(*) FROM stranded) AS BIGINT)
           AS parts_stranded,
         CAST((SELECT count(*) FROM pdeg) AS BIGINT) AS total_parts,
         CAST((SELECT coalesce(sum(r.r), 0) FROM stranded g
               JOIN rev r ON r.p = g.p) AS BIGINT)
           AS revenue_stranded,
         CAST((SELECT sum(r) FROM rev) AS BIGINT) AS total_revenue)
SELECT suppliers_removed, parts_stranded, total_parts,
       revenue_stranded, total_revenue,
       CAST((2000000 * parts_stranded + total_parts)
            {intdiv} (2 * total_parts) AS BIGINT)
         AS stranded_share_micro
FROM agg
"""


def q_hub_attack_robustness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Remove the top-degree suppliers: stranded parts and revenue."""
    return _run(spark, sf_dir, _attack_sql("spark"))


ORACLE_HUB_ATTACK_ROBUSTNESS = _attack_sql("duck")


# ---------------------------------------------------------------------------
# supplier_overlap_jaccard
# ---------------------------------------------------------------------------


def _overlap_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_EDGES_SQL},
pairs AS (
  SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS shared
  FROM edges a JOIN edges b ON b.p = a.p AND b.s > a.s
  GROUP BY a.s, b.s),
scored AS (
  SELECT p.s1, p.s2, p.shared,
         d1.d AS deg1, d2.d AS deg2,
         CAST((2000000 * p.shared + (d1.d + d2.d - p.shared))
              {intdiv} (2 * (d1.d + d2.d - p.shared)) AS BIGINT)
           AS jaccard_micro
  FROM pairs p
  JOIN sdeg d1 ON d1.s = p.s1
  JOIN sdeg d2 ON d2.s = p.s2)
SELECT s1, s2, shared, deg1, deg2, jaccard_micro
FROM scored
ORDER BY jaccard_micro DESC, s1, s2
LIMIT {_OVL_K}
"""


def q_supplier_overlap_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top supplier pairs by shared-part Jaccard."""
    return _run(spark, sf_dir, _overlap_sql("spark"))


ORACLE_SUPPLIER_OVERLAP_JACCARD = _overlap_sql("duck")


# ---------------------------------------------------------------------------
# bipartite_density_report
# ---------------------------------------------------------------------------


def _density_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_EDGES_SQL},
agg AS (
  SELECT CAST((SELECT count(*) FROM pdeg) AS BIGINT) AS n_parts,
         CAST((SELECT count(*) FROM sdeg) AS BIGINT) AS n_suppliers,
         CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges)
SELECT n_parts, n_suppliers, n_edges,
       CAST(CAST(n_parts AS {wide}) * n_suppliers AS BIGINT)
         AS possible_edges,
       CAST((2000000 * CAST(n_edges AS {wide})
            + CAST(n_parts AS {wide}) * n_suppliers)
            {intdiv} (2 * CAST(n_parts AS {wide}) * n_suppliers)
            AS BIGINT) AS density_micro,
       CAST((2000000 * n_edges + n_parts) {intdiv} (2 * n_parts)
            AS BIGINT) AS mean_suppliers_per_part_micro,
       CAST((2000000 * n_edges + n_suppliers)
            {intdiv} (2 * n_suppliers) AS BIGINT)
         AS mean_parts_per_supplier_micro
FROM agg
"""


def q_bipartite_density_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Graph size, density, and mean degrees both sides."""
    return _run(spark, sf_dir, _density_sql("spark"))


ORACLE_BIPARTITE_DENSITY_REPORT = _density_sql("duck")


RESILIENCE_QUERIES = {
    "ps_graph_degree_profile": q_ps_graph_degree_profile,
    "single_source_parts_report": q_single_source_parts_report,
    "hub_attack_robustness": q_hub_attack_robustness,
    "supplier_overlap_jaccard": q_supplier_overlap_jaccard,
    "bipartite_density_report": q_bipartite_density_report,
}

RESILIENCE_ORACLES = {
    "ps_graph_degree_profile": ORACLE_PS_GRAPH_DEGREE_PROFILE,
    "single_source_parts_report": ORACLE_SINGLE_SOURCE_PARTS_REPORT,
    "hub_attack_robustness": ORACLE_HUB_ATTACK_ROBUSTNESS,
    "supplier_overlap_jaccard": ORACLE_SUPPLIER_OVERLAP_JACCARD,
    "bipartite_density_report": ORACLE_BIPARTITE_DENSITY_REPORT,
}

_q.QUERIES.update(RESILIENCE_QUERIES)
_q.ORACLES.update(RESILIENCE_ORACLES)
