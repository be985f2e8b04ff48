"""Embedding-quality catalog, round 4 (wave 99): five operators that
grade the embedding space itself — centroids, Fisher separability,
centroid geometry, k-NN label purity, and per-dimension variance —
the model-quality report a training pipeline runs before trusting a
new encoder.  All statistics run on GLOBALLY milli-quantized codes
code = ⌊x·1000 + 0.5⌋ (one IEEE multiply+floor, identical on both
engines — the corpus-statistics sibling of the per-vector SQ8 in
``embed_quantize_int8``), so every moment is an exact integer.

* ``embed_centroid_table`` — per (label, dim): count and the
  half-up-micro mean code — the 640-row centroid artifact.
* ``fisher_separability_audit`` — per dim: exact within-class and
  between-class scatter numerators (the one-way-ANOVA split of the
  quantized codes) and their ratio micro — which dimensions actually
  separate the classes.
* ``centroid_cosine_matrix`` — label-pair cosine of the micro-mean
  centroid vectors (exact integer dot products, one IEEE sqrt per
  side, fixed op order) — the class-geometry heatmap.
* ``label_knn_purity`` — for the {_KNN_PROBES} smallest vec_ids:
  the label purity of their top-{_KNN_K} neighbors by exact integer
  dot product (ties broken by vec_id; the probe itself excluded) —
  the classification quality of the raw space.  Ground-truth
  evaluator: per-probe partitions are corpus-sized by design (the
  ``ann_recall_eval`` doctrine); the production path is the IVF/LSH
  search entries.
* ``dim_variance_ranking`` — the 64 dimensions ranked by the exact
  corpus variance numerator n·Σx² − (Σx)² — the feature-selection
  order.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_embedqual_wave.py.

Cross-engine float policy: one IEEE multiply+floor per element for
quantization; all moments/dots exact BIGINT (codes ≤ ~10³, dots ≤
64·10⁶); cosines are IEEE sqrt on exact integers micro-quantized in
a fixed op order.

Scale notes: the explode is 64 rows per vector reduced by partial
agg to (label, dim) / dim frames; the centroid matrix is 10×10;
dots for purity are per-(probe, vector) single rows with a bounded
probe set.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_KNN_PROBES = 20
_KNN_K = 10


def _codes_sql(dialect: str) -> str:
    """(vec_id, label, dim, code) — milli-quantized elements."""
    if dialect == "spark":
        return """
codes AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(t.dim + 1 AS BIGINT) AS dim,
         CAST(floor(CAST(t.x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS code
  FROM embeddings
  LATERAL VIEW posexplode(embedding) t AS dim, x)
"""
    return """
codes AS (
  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
         CAST(t.dim AS BIGINT) AS dim,
         CAST(floor(CAST(e.embedding[t.dim] AS DOUBLE) * 1000 + 0.5)
              AS BIGINT) AS code
  FROM embeddings e,
       LATERAL (SELECT unnest(generate_series(1,
         len(e.embedding))) AS dim) t)
"""


# ---------------------------------------------------------------------------
# embed_centroid_table
# ---------------------------------------------------------------------------


def _centroid_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_codes_sql(dialect)}
SELECT label, dim,
       CAST(count(*) AS BIGINT) AS n,
       CASE WHEN sum(code) >= 0 THEN
         CAST((2000 * sum(code) + count(*)) {intdiv} (2 * count(*))
              AS BIGINT)
       ELSE -CAST((2000 * (-sum(code)) + count(*))
              {intdiv} (2 * count(*)) AS BIGINT) END AS mean_micro
FROM codes GROUP BY label, dim
"""


def q_embed_centroid_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (label, dim) centroid artifact in exact micro."""
    _q._register_views(spark, sf_dir, ["embeddings"])
    return spark.sql(_centroid_sql("spark"))


ORACLE_EMBED_CENTROID_TABLE = _centroid_sql("duck")


# ---------------------------------------------------------------------------
# fisher_separability_audit
# ---------------------------------------------------------------------------


def _fisher_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_codes_sql(dialect)},
lm AS (
  SELECT dim, label,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(code) AS BIGINT) AS s1,
         CAST(sum(code * code) AS BIGINT) AS s2
  FROM lm_src GROUP BY dim, label),
agg AS (
  SELECT dim,
         CAST(sum(n) AS BIGINT) AS n_all,
         CAST(sum(s1) AS BIGINT) AS s1_all,
         CAST(sum(s2) AS BIGINT) AS s2_all,
         -- per-class scatter term quantized to micro BEFORE summing
         -- (keeps the cross-class reduction an exact integer):
         CAST(sum((2000000 * (CAST(n AS {{wide}}) * s2
              - CAST(s1 AS {{wide}}) * s1) + n)
              {{intdiv}} (2 * n)) AS BIGINT) AS ssw_micro,
         CAST(count(*) AS BIGINT) AS n_labels
  FROM lm GROUP BY dim),
sc AS (
  SELECT dim, n_all, n_labels, ssw_micro,
         CAST((2000000 * (CAST(n_all AS {{wide}}) * s2_all
              - CAST(s1_all AS {{wide}}) * s1_all) + n_all)
              {{intdiv}} (2 * n_all) AS BIGINT) AS sst_micro
  FROM agg)
SELECT dim, n_all, n_labels, sst_micro, ssw_micro,
       CASE WHEN sst_micro > 0 THEN
         CASE WHEN sst_micro >= ssw_micro THEN
           CAST((2000000 * (sst_micro - ssw_micro) + sst_micro)
                {{intdiv}} (2 * sst_micro) AS BIGINT)
         ELSE -CAST((2000000 * (ssw_micro - sst_micro) + sst_micro)
                {{intdiv}} (2 * sst_micro) AS BIGINT) END
       ELSE CAST(0 AS BIGINT) END AS eta2_micro
FROM sc
""".format(wide=wide, intdiv=intdiv).replace("lm_src", "codes")


def q_fisher_separability_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dim class-separability (eta²-style) from exact scatter
    numerators."""
    _q._register_views(spark, sf_dir, ["embeddings"])
    return spark.sql(_fisher_sql("spark"))


ORACLE_FISHER_SEPARABILITY_AUDIT = _fisher_sql("duck")


# ---------------------------------------------------------------------------
# centroid_cosine_matrix
# ---------------------------------------------------------------------------


def _cosmat_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_codes_sql(dialect)},
cent AS (
  SELECT label, dim,
         CASE WHEN sum(code) >= 0 THEN
           CAST((2000 * sum(code) + count(*)) {intdiv} (2 * count(*))
                AS BIGINT)
         ELSE -CAST((2000 * (-sum(code)) + count(*))
                {intdiv} (2 * count(*)) AS BIGINT) END AS m
  FROM codes GROUP BY label, dim),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(sum(a.m * b.m) AS BIGINT) AS dot,
         CAST(sum(a.m * a.m) AS BIGINT) AS na2,
         CAST(sum(b.m * b.m) AS BIGINT) AS nb2
  FROM cent a JOIN cent b ON b.dim = a.dim AND b.label > a.label
  GROUP BY a.label, b.label)
SELECT label_a, label_b, dot,
       CASE WHEN dot >= 0 THEN
         CAST(floor(CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE))
              * sqrt(CAST(nb2 AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)
       ELSE -CAST(floor(-CAST(dot AS DOUBLE)
              / (sqrt(CAST(na2 AS DOUBLE))
              * sqrt(CAST(nb2 AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)
       END AS cosine_micro
FROM pairs
"""


def q_centroid_cosine_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Label-pair centroid cosines from exact integer dots."""
    _q._register_views(spark, sf_dir, ["embeddings"])
    return spark.sql(_cosmat_sql("spark"))


ORACLE_CENTROID_COSINE_MATRIX = _cosmat_sql("duck")


# ---------------------------------------------------------------------------
# label_knn_purity
# ---------------------------------------------------------------------------


def _knn_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_codes_sql(dialect)},
probes AS (
  SELECT vec_id, label FROM (
    SELECT DISTINCT vec_id, label FROM codes) t
  ORDER BY vec_id LIMIT {_KNN_PROBES}),
dots AS (
  SELECT p.vec_id AS probe_id, p.label AS probe_label,
         c.vec_id AS cand_id,
         max(c.label) AS cand_label,
         CAST(sum(pc.code * c.code) AS BIGINT) AS dot
  FROM probes p
  JOIN codes pc ON pc.vec_id = p.vec_id
  JOIN codes c ON c.dim = pc.dim AND c.vec_id <> p.vec_id
  GROUP BY p.vec_id, p.label, c.vec_id),
ranked AS (
  SELECT probe_id, probe_label, cand_label,
         row_number() OVER (PARTITION BY probe_id
           ORDER BY dot DESC, cand_id) AS rn
  FROM dots)
SELECT probe_id, probe_label,
       CAST(sum(CASE WHEN cand_label = probe_label THEN 1 ELSE 0
            END) AS BIGINT) AS same_label,
       CAST({_KNN_K} AS BIGINT) AS k,
       CAST((2000000 * sum(CASE WHEN cand_label = probe_label THEN 1
            ELSE 0 END) + {_KNN_K}) {intdiv} (2 * {_KNN_K})
            AS BIGINT) AS purity_micro
FROM ranked WHERE rn <= {_KNN_K}
GROUP BY probe_id, probe_label
"""


def q_label_knn_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K neighbor label purity for the bounded probe set.

    DataFrame twin of ``_knn_sql`` (oracle text unchanged): Spark
    inlines CTEs, so the SQL form re-built the milli-quantized code
    table once per reference (probes, probe-side codes, candidate
    side) AND its dot-product join exchanged the FULL candidate code
    table keyed by ``dim`` — a fixed-cardinality key whose partitions
    are data-scaled (the source-window disease, in join form).  Here
    the code table is persisted once and the probe-side codes — the
    BOUNDED side (≤ _KNN_PROBES × dim rows) — broadcast onto it, so
    the corpus-sized side never re-shuffles; the per-probe partial-agg
    groupBy and the rank-LIMITED top-K window (WindowGroupLimit) are
    the only exchanges.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    codes = _q._persist_tracked(
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.posexplode("embedding").alias("dim0", "x"),
        )
        .select(
            "vec_id",
            "label",
            (F.col("dim0") + 1).cast("bigint").alias("dim"),
            F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)")
            .alias("code"),
        )
    )
    probes = (
        codes.select("vec_id", "label").distinct()
        .orderBy("vec_id")
        .limit(_KNN_PROBES)
    )
    pc = (
        codes.join(
            F.broadcast(
                probes.select(
                    F.col("vec_id").alias("probe_id"),
                    F.col("label").alias("probe_label"),
                )
            ),
            F.col("vec_id") == F.col("probe_id"),
        )
        .select("probe_id", "probe_label", "dim",
                F.col("code").alias("pcode"))
    )
    dots = (
        codes.join(F.broadcast(pc), "dim")
        .where(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "probe_label", F.col("vec_id").alias("cand_id"))
        .agg(
            F.max("label").alias("cand_label"),
            F.sum(F.col("pcode") * F.col("code")).cast("bigint").alias("dot"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("dot").desc(), "cand_id")
    return (
        dots.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KNN_K)
        .groupBy("probe_id", "probe_label")
        .agg(
            F.sum(
                F.when(F.col("cand_label") == F.col("probe_label"), 1)
                .otherwise(0)
            ).cast("bigint").alias("same_label"),
            F.lit(_KNN_K).cast("bigint").alias("k"),
            F.expr(
                f"CAST((2000000 * sum(CASE WHEN cand_label = probe_label"
                f" THEN 1 ELSE 0 END) + {_KNN_K}) DIV (2 * {_KNN_K})"
                f" AS BIGINT)"
            ).alias("purity_micro"),
        )
        .select("probe_id", "probe_label", "same_label", "k", "purity_micro")
    )


ORACLE_LABEL_KNN_PURITY = _knn_sql("duck")


# ---------------------------------------------------------------------------
# dim_variance_ranking
# ---------------------------------------------------------------------------


def _dimvar_sql(dialect: str) -> str:
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
WITH {_codes_sql(dialect)},
mom AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(code) AS BIGINT) AS s1,
         CAST(sum(code * code) AS BIGINT) AS s2
  FROM codes GROUP BY dim)
SELECT dim, n,
       CAST(CAST(n AS {wide}) * s2 - CAST(s1 AS {wide}) * s1
            AS BIGINT) AS var_numerator,
       CAST(row_number() OVER (ORDER BY CAST(n AS {wide}) * s2
            - CAST(s1 AS {wide}) * s1 DESC, dim) AS BIGINT)
         AS variance_rank
FROM mom
"""


def q_dim_variance_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensions ranked by exact variance numerator."""
    _q._register_views(spark, sf_dir, ["embeddings"])
    return spark.sql(_dimvar_sql("spark"))


ORACLE_DIM_VARIANCE_RANKING = _dimvar_sql("duck")


EMBEDQUAL_QUERIES = {
    "embed_centroid_table": q_embed_centroid_table,
    "fisher_separability_audit": q_fisher_separability_audit,
    "centroid_cosine_matrix": q_centroid_cosine_matrix,
    "label_knn_purity": q_label_knn_purity,
    "dim_variance_ranking": q_dim_variance_ranking,
}

EMBEDQUAL_ORACLES = {
    "embed_centroid_table": ORACLE_EMBED_CENTROID_TABLE,
    "fisher_separability_audit": ORACLE_FISHER_SEPARABILITY_AUDIT,
    "centroid_cosine_matrix": ORACLE_CENTROID_COSINE_MATRIX,
    "label_knn_purity": ORACLE_LABEL_KNN_PURITY,
    "dim_variance_ranking": ORACLE_DIM_VARIANCE_RANKING,
}

_q.QUERIES.update(EMBEDQUAL_QUERIES)
_q.ORACLES.update(EMBEDQUAL_ORACLES)
