"""Graph-analytics catalog, round 4 (wave 15): three operators the
corpus-graph side of a pretraining platform runs over the two graphs
the earlier waves already materialize —

* ``clustering_coefficient`` — per-node local clustering coefficient
  over the thresholded supplier co-order graph (the
  ``triangle_count`` graph): lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)).
  Triangle counts and degrees are exact integers; the only float is
  the final one-expression division, rounded to 6 on both engines.
* ``degree_assortativity`` — Newman's degree-assortativity r of the
  same graph: the Pearson correlation of endpoint degrees over the
  symmetrized edge list.  Every moment (S1 = Σx, S2 = Σx², S11 = Σxy)
  is an exact integer partial agg promoted to DECIMAL(38,0) before
  the cross products, so r is ONE IEEE expression on exact integers
  — no float accumulation order exists to diverge.
* ``bfs_distances`` — level-synchronous single-source BFS over the
  verified near-dup graph (the memoized ``dedup_minhash_verify``
  edge set shared with ``cc_largestar`` / ``label_propagation``):
  hop distance from the smallest doc_id appearing in any verified
  pair.  Spark iterates min-relaxation rounds with a checksum
  convergence test and a loud round cap (the ``cc_largestar``
  discipline); the oracle is DuckDB's level-synchronous recursive
  CTE bounded by the same cap — past the fixpoint extra rounds are
  idempotent, so a converged Spark result equals the capped oracle
  exactly.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the graph family
(``triangle_count`` queries_warehouse.py, ``pagerank_bipartite``
queries_scale.py, ``cc_largestar`` queries_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t
from .queries_warehouse import _TRI_MIN_W

# ---------------------------------------------------------------------------
# shared: the thresholded supplier co-order graph (triangle_count's graph)
# ---------------------------------------------------------------------------


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lo < hi supplier pairs co-occurring in >= _TRI_MIN_W orders —
    the exact edge construction of q_triangle_count
    (queries_warehouse.py:152), kept in one place so the three graph
    entries pin the SAME graph."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("lo"), F.col("b.l_suppkey").alias("hi")
        )
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= _TRI_MIN_W)
        .select("lo", "hi")
    )


_COORDER_EDGES_SQL = f"""
  SELECT a.l_suppkey AS lo, b.l_suppkey AS hi
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_W}"""


# ---------------------------------------------------------------------------
# clustering_coefficient
# ---------------------------------------------------------------------------


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the supplier
    co-order graph: lcc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1)),
    0 when deg < 2 — the local-density signal that separates
    community-embedded nodes from bridge nodes.

    Triangles use the same oriented two-join enumeration as
    ``triangle_count`` (each triangle materializes once under the
    lo < hi orientation, then explodes to its 3 corners); degrees are
    one partial agg over the symmetrized edge list.  Both inputs are
    exact BIGINTs, so the coefficient is a single IEEE division
    rounded to 6 — bit-exact on both engines.

    Scale: the wedge join is keyed on the middle node and the closure
    probe on (lo, hi) — both shuffle equi-joins, nothing broadcast or
    collected; degree is a bounded-key partial agg.  The _TRI_MIN_W
    sparsification carries over, so the wedge bound is the
    triangle_count one.  Output is |V| rows.
    """
    edges = _q._persist_tracked(_coorder_edges(spark, sf_dir))
    deg = (
        edges.select(F.col("lo").alias("supp_id"))
        .union(edges.select(F.col("hi").alias("supp_id")))
        .groupBy("supp_id")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.hi") == F.col("e2.lo"))
        .join(
            e3,
            (F.col("e1.lo") == F.col("e3.lo"))
            & (F.col("e2.hi") == F.col("e3.hi")),
        )
        .select(
            F.col("e1.lo").alias("na"),
            F.col("e1.hi").alias("nb"),
            F.col("e2.hi").alias("nc"),
        )
    )
    tri_per_node = (
        tri.select(F.explode(F.array("na", "nb", "nc")).alias("supp_id"))
        .groupBy("supp_id")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    out = (
        deg.join(tri_per_node, "supp_id", "left")
        .select(
            F.col("supp_id").cast("bigint").alias("supp_id"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
        )
        .withColumn(
            "lcc",
            F.when(
                F.col("degree") >= 2,
                F.round(
                    (F.lit(2) * F.col("n_triangles"))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out


ORACLE_CLUSTERING_COEFFICIENT = f"""
WITH edges AS ({_COORDER_EDGES_SQL}),
deg AS (
  SELECT supp_id, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT lo AS supp_id FROM edges
    UNION ALL SELECT hi FROM edges)
  GROUP BY supp_id),
tri AS (
  SELECT e1.lo AS na, e1.hi AS nb, e2.hi AS nc
  FROM edges e1
  JOIN edges e2 ON e1.hi = e2.lo
  JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
tpn AS (
  SELECT supp_id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT na AS supp_id FROM tri
    UNION ALL SELECT nb FROM tri
    UNION ALL SELECT nc FROM tri)
  GROUP BY supp_id)
SELECT CAST(d.supp_id AS BIGINT) AS supp_id,
       d.degree,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN round(CAST(2 * coalesce(t.n_triangles, 0) AS DOUBLE)
                       / (d.degree * (d.degree - 1)), 6)
            ELSE 0.0 END AS lcc
FROM deg d LEFT JOIN tpn t ON t.supp_id = d.supp_id
"""


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the supplier co-order graph:
    Pearson correlation of (deg(u), deg(v)) over the SYMMETRIZED edge
    list (each undirected edge contributes both orientations, the
    textbook 2m-sample definition, Newman 2002 eq. 4).

    Under symmetrization the two marginals are identical, so
    r = (M*S11 - S1²) / (M*S2 - S1²) with M = 2m, S1 = Σ deg(u),
    S2 = Σ deg(u)², S11 = Σ deg(u)·deg(v) — ALL exact integers.  The
    partial aggs run in BIGINT, the cross products are promoted to
    DECIMAL(38,0) (degree ≤ 10^6 and edges ≤ 10^12 would overflow
    int64 at corpus scale), and r is one IEEE division rounded to 6.

    Scale: one degree agg (bounded keys), two broadcast-sized joins to
    attach endpoint degrees, one global partial agg to a SINGLE row.
    No collect, no window, no float accumulation.
    """
    # persisted: sym feeds the degree agg and both endpoint joins, and
    # deg is read twice (du/dv) — unpersisted each reference re-ran the
    # lineitem co-order self-join
    edges = _q._persist_tracked(_coorder_edges(spark, sf_dir))
    sym = edges.select(
        F.col("lo").alias("u"), F.col("hi").alias("v")
    ).union(edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")))
    deg = _q._persist_tracked(
        sym.groupBy("u")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    du = deg.select(F.col("u").alias("u_"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("v_"), F.col("d").alias("dv"))
    samples = (
        sym.join(du, sym.u == du.u_)
        .join(dv, sym.v == dv.v_)
        .select("du", "dv")
    )
    mom = samples.agg(
        F.count("*").cast("decimal(38,0)").alias("m"),
        F.sum("du").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("du") * F.col("du")).cast("decimal(38,0)").alias("s2"),
        F.sum(F.col("du") * F.col("dv")).cast("decimal(38,0)").alias("s11"),
    )
    den = F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    num = F.col("m") * F.col("s11") - F.col("s1") * F.col("s1")
    return mom.select(
        (F.col("m") / F.lit(2)).cast("bigint").alias("n_edges"),
        # den = 0 iff the graph is degree-regular (zero variance): r is
        # undefined there; both engines pin the 0.0 convention
        F.when(den == 0, F.lit(0.0))
        .otherwise(F.round(num.cast("double") / den.cast("double"), 6))
        .alias("assortativity"),
    )


ORACLE_DEGREE_ASSORTATIVITY = f"""
WITH edges AS ({_COORDER_EDGES_SQL}),
sym AS (
  SELECT lo AS u, hi AS v FROM edges
  UNION ALL SELECT hi, lo FROM edges),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
samples AS (
  SELECT du.d AS du, dv.d AS dv
  FROM sym s JOIN deg du ON du.u = s.u JOIN deg dv ON dv.u = s.v),
mom AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS m,
         CAST(sum(du) AS DECIMAL(38,0)) AS s1,
         CAST(sum(du * du) AS DECIMAL(38,0)) AS s2,
         CAST(sum(du * dv) AS DECIMAL(38,0)) AS s11
  FROM samples)
SELECT CAST(m / 2 AS BIGINT) AS n_edges,
       CASE WHEN m * s2 - s1 * s1 = 0 THEN 0.0
            ELSE round(CAST(m * s11 - s1 * s1 AS DOUBLE)
                       / CAST(m * s2 - s1 * s1 AS DOUBLE), 6)
       END AS assortativity
FROM mom
"""


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------

_BFS_MAX_ROUNDS = 20  # >= graph diameter; loud failure past the cap


def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distances over the verified near-dup
    graph (the memoized ``dedup_minhash_verify`` pair set — the same
    materialized edge table ``cc_largestar`` and
    ``label_propagation`` consume), source = the smallest doc_id
    appearing in any verified pair.

    Each round is ONE join (frontier ⋈ edges) + a min-per-key partial
    agg against the running distance table — the level-synchronous
    Pregel shape.  Convergence is a (count, sum) checksum on the
    distance table; the round cap raises loudly (the cc_largestar
    discipline).  Min-relaxation is idempotent past the fixpoint, so
    the converged result equals the oracle's cap-bounded recursive
    CTE exactly.

    Scale: state = the reached node set (bounded by the component,
    a vanishing fraction of a 100 TB corpus under near-dup edges);
    each round shuffles on node id only.  localCheckpoint per round
    truncates the iterative lineage exactly like cc_largestar.
    """
    pairs = _q.q_dedup_minhash_verify(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    src_row = pairs.agg(
        F.least(F.min("doc_a"), F.min("doc_b")).alias("src")
    ).collect()[0]
    if src_row["src"] is None:  # no verified pairs at this SF: empty result
        return spark.createDataFrame([], "doc_id bigint, dist int")
    src = int(src_row["src"])

    dist = spark.createDataFrame(
        [(src, 0)], "doc_id bigint, dist int"
    ).localCheckpoint(eager=True)
    prev = (0, 0)
    converged = False
    for _ in range(_BFS_MAX_ROUNDS):
        relaxed = (
            dist.join(edges, dist.doc_id == edges.u)
            .select(F.col("v").alias("doc_id"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.union(relaxed)
            .groupBy("doc_id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        cur_row = dist.agg(
            F.count("*").alias("n"), F.sum("dist").alias("s")
        ).collect()[0]
        cur = (cur_row["n"], cur_row["s"])
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"bfs_distances: relaxation did not stabilize in "
            f"{_BFS_MAX_ROUNDS} rounds"
        )
    return dist.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("dist").cast("int").alias("dist"),
    )


# Level-synchronous recursive CTE: rows are (node, d) states, UNION
# (distinct) dedups per level, and d < cap bounds walk depth, so cycles
# contribute at most |V| * cap states.  min(d) per node = hop distance.
ORACLE_BFS_DISTANCES = f"""
WITH RECURSIVE pairs AS ({_q.ORACLE_DEDUP_MINHASH_VERIFY}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
src AS (SELECT least(min(u), min(v)) AS s FROM edges),
reach(node, d) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT e.v, r.d + 1
  FROM reach r JOIN edges e ON e.u = r.node
  WHERE r.d < {_BFS_MAX_ROUNDS})
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(d) AS INT) AS dist
FROM reach GROUP BY node
"""


GRAPH_QUERIES = {
    "clustering_coefficient": q_clustering_coefficient,
    "degree_assortativity": q_degree_assortativity,
    "bfs_distances": q_bfs_distances,
}

GRAPH_ORACLES = {
    "clustering_coefficient": ORACLE_CLUSTERING_COEFFICIENT,
    "degree_assortativity": ORACLE_DEGREE_ASSORTATIVITY,
    "bfs_distances": ORACLE_BFS_DISTANCES,
}

_q.QUERIES.update(GRAPH_QUERIES)
_q.ORACLES.update(GRAPH_ORACLES)
