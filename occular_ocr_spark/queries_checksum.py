"""Integrity-checksum catalog, round 4 (wave 69): five operators that
replay the anti-entropy / replica-verification machinery a 100 TB
lake runs to prove two copies of a table are identical WITHOUT moving
the data — Merkle-style bucket digests with an additive (order-free)
sum combiner, so the whole scheme is one partial agg per table.

Row digest = the portable ``conv(md5(canonical_row)[0:8], 16, 10)``
BIGINT; canonical_row concatenates the row's INTEGER/STRING/DATE
fields with an ASCII unit separator (floats excluded by design — the
two engines format doubles differently, and a checksum must never
depend on a formatter).  The bucket combiner is SUM of row digests:
commutative, associative, and O(Δ)-maintainable.

* ``table_checksum_buckets`` — the {_N_BUCKETS}-leaf digest table of
  documents: per hash bucket, row count + digest sum (the Merkle
  leaves replicas exchange).
* ``replica_diff_checksums`` — a replica with ONE deterministically
  corrupted row (doc_id {_CORRUPT_ID}): per-bucket base vs replica
  sums and the differs flag — anti-entropy localizes the damage to
  exactly one bucket.
* ``merkle_tree_levels`` — the full 3-level tree (16 leaves → 4
  internal → root) as (level, idx, digest) rows; parents hash the
  ordered concatenation of child digests.
* ``row_digest_dupes`` — digest-collision / full-duplicate audit for
  documents and the lineitem key+dims projection: rows vs distinct
  digests vs rows sharing a digest.
* ``incremental_checksum_update`` — the O(Δ) maintenance identity:
  full recompute after mutating the doc_id % {_DELTA_MOD} == 0 slice
  equals old_sum - Σdigest(old Δ) + Σdigest(new Δ), verified
  bit-for-bit on both engines.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_checksum_wave.py.

Cross-engine float policy: none — digests, counts, and sums are
exact integers; digest strings are md5 hex.

Scale notes: every entry is map-side digest computation + one
partial-agg sum to #buckets rows; the Merkle internal levels operate
on the 16-row leaf frame; replica/delta variants re-scan with a
mutated projection (at 100 TB the replica sums arrive from the other
cluster — the entry certifies the combiner arithmetic).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_N_BUCKETS = 16
_CORRUPT_ID = 7
_DELTA_MOD = 97
_SEP = chr(31)


def _doc_row_spark(text_expr: str = "coalesce(text, '')") -> str:
    return (
        f"concat(CAST(doc_id AS STRING), '{_SEP}', {text_expr},"
        f" '{_SEP}', coalesce(lang, ''), '{_SEP}', coalesce(source, ''),"
        f" '{_SEP}', CAST(n_chars AS STRING))"
    )


def _doc_row_sql(text_expr: str = "coalesce(text, '')") -> str:
    return (
        f"CAST(doc_id AS VARCHAR) || '{_SEP}' || {text_expr} ||"
        f" '{_SEP}' || coalesce(lang, '') || '{_SEP}' ||"
        f" coalesce(source, '') || '{_SEP}' || CAST(n_chars AS VARCHAR)"
    )


def _dig_spark(row: str) -> str:
    return f"CAST(conv(substr(md5({row}), 1, 8), 16, 10) AS BIGINT)"


def _dig_sql(row: str) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5({row}), 1, 8) AS BIGINT) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# table_checksum_buckets
# ---------------------------------------------------------------------------


def q_table_checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle leaves of documents: per hash bucket, rows + additive
    digest sum.

    Scale: map-side digest + one partial agg to {_N_BUCKETS} rows.
    """
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            f"doc_id % {_N_BUCKETS} AS bucket",
            f"{_dig_spark(_doc_row_spark())} AS dig",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("dig").cast("long").alias("digest_sum"),
        )
    )


ORACLE_TABLE_CHECKSUM_BUCKETS = f"""
SELECT doc_id % {_N_BUCKETS} AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({_dig_sql(_doc_row_sql())}) AS BIGINT) AS digest_sum
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# replica_diff_checksums
# ---------------------------------------------------------------------------

_CORRUPT_SPARK = (
    f"CASE WHEN doc_id = {_CORRUPT_ID}"
    " THEN concat(coalesce(text, ''), '~corrupt')"
    " ELSE coalesce(text, '') END"
)
_CORRUPT_SQL = (
    f"CASE WHEN doc_id = {_CORRUPT_ID}"
    " THEN coalesce(text, '') || '~corrupt'"
    " ELSE coalesce(text, '') END"
)


def q_replica_diff_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy detection: base vs a replica whose doc
    {_CORRUPT_ID} is corrupted — per-bucket digest sums and the
    differs flag (exactly one bucket differs).

    Scale: two map-side digest passes + {_N_BUCKETS}-row join; in
    production the replica column arrives from the remote cluster.
    """
    d = _t(spark, sf_dir, "documents")
    base = (
        d.selectExpr(
            f"doc_id % {_N_BUCKETS} AS bucket",
            f"{_dig_spark(_doc_row_spark())} AS dig",
        )
        .groupBy("bucket")
        .agg(F.sum("dig").cast("long").alias("base_sum"))
    )
    rep = (
        d.selectExpr(
            f"doc_id % {_N_BUCKETS} AS bucket",
            f"{_dig_spark(_doc_row_spark(_CORRUPT_SPARK))} AS dig",
        )
        .groupBy("bucket")
        .agg(F.sum("dig").cast("long").alias("replica_sum"))
    )
    return base.join(rep, "bucket").selectExpr(
        "bucket",
        "base_sum",
        "replica_sum",
        "base_sum <> replica_sum AS differs",
    )


ORACLE_REPLICA_DIFF_CHECKSUMS = f"""
WITH base AS (
  SELECT doc_id % {_N_BUCKETS} AS bucket,
         CAST(sum({_dig_sql(_doc_row_sql())}) AS BIGINT) AS base_sum
  FROM documents GROUP BY 1),
rep AS (
  SELECT doc_id % {_N_BUCKETS} AS bucket,
         CAST(sum({_dig_sql(_doc_row_sql(_CORRUPT_SQL))}) AS BIGINT)
           AS replica_sum
  FROM documents GROUP BY 1)
SELECT b.bucket, b.base_sum, r.replica_sum,
       b.base_sum <> r.replica_sum AS differs
FROM base b JOIN rep r ON r.bucket = b.bucket
"""


# ---------------------------------------------------------------------------
# merkle_tree_levels
# ---------------------------------------------------------------------------


def q_merkle_tree_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-level Merkle tree: leaf digest = md5(sum:count); parent
    = md5 of ordered child-digest concatenation; root likewise.

    Scale: leaves are the partial-agg frame; internal levels reduce
    the 16-row frame — driver never sees row data.
    """
    leaves = _q._persist_tracked(
        q_table_checksum_buckets(spark, sf_dir).selectExpr(
            "CAST(bucket AS INT) AS idx",
            "md5(concat(CAST(digest_sum AS STRING), ':',"
            " CAST(n_rows AS STRING))) AS digest",
        )
    )
    mids = _q._persist_tracked(
        leaves.selectExpr("idx DIV 4 AS idx", "idx AS child_idx", "digest")
        .groupBy("idx")
        .agg(
            F.expr(
                "md5(array_join(transform(array_sort("
                "collect_list(struct(child_idx, digest))),"
                " s -> s.digest), ''))"
            ).alias("digest")
        )
        .selectExpr("CAST(idx AS INT) AS idx", "digest")
    )
    root = (
        mids.selectExpr("idx AS child_idx", "digest")
        .agg(
            F.expr(
                "md5(array_join(transform(array_sort("
                "collect_list(struct(child_idx, digest))),"
                " s -> s.digest), ''))"
            ).alias("digest")
        )
        .selectExpr("CAST(0 AS INT) AS idx", "digest")
    )
    return (
        leaves.selectExpr("2 AS level", "idx", "digest")
        .unionAll(mids.selectExpr("1 AS level", "idx", "digest"))
        .unionAll(root.selectExpr("0 AS level", "idx", "digest"))
    )


ORACLE_MERKLE_TREE_LEVELS = f"""
WITH leaves AS (
  SELECT CAST(bucket AS INT) AS idx,
         md5(CAST(digest_sum AS VARCHAR) || ':' ||
             CAST(n_rows AS VARCHAR)) AS digest
  FROM (
    SELECT doc_id % {_N_BUCKETS} AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({_dig_sql(_doc_row_sql())}) AS BIGINT) AS digest_sum
    FROM documents GROUP BY 1)),
mids AS (
  SELECT CAST(idx // 4 AS INT) AS idx,
         md5(string_agg(digest, '' ORDER BY idx)) AS digest
  FROM leaves GROUP BY idx // 4),
root AS (
  SELECT CAST(0 AS INT) AS idx,
         md5(string_agg(digest, '' ORDER BY idx)) AS digest
  FROM mids)
SELECT 2 AS level, idx, digest FROM leaves
UNION ALL SELECT 1 AS level, idx, digest FROM mids
UNION ALL SELECT 0 AS level, idx, digest FROM root
"""


# ---------------------------------------------------------------------------
# row_digest_dupes
# ---------------------------------------------------------------------------

_LI_ROW_SPARK = (
    f"concat(CAST(l_orderkey AS STRING), '{_SEP}',"
    f" CAST(l_partkey AS STRING), '{_SEP}',"
    f" CAST(l_suppkey AS STRING), '{_SEP}',"
    f" CAST(l_linenumber AS STRING), '{_SEP}',"
    f" l_returnflag, '{_SEP}', l_linestatus, '{_SEP}',"
    f" CAST(l_shipdate AS STRING))"
)
_LI_ROW_SQL = (
    f"CAST(l_orderkey AS VARCHAR) || '{_SEP}' ||"
    f" CAST(l_partkey AS VARCHAR) || '{_SEP}' ||"
    f" CAST(l_suppkey AS VARCHAR) || '{_SEP}' ||"
    f" CAST(l_linenumber AS VARCHAR) || '{_SEP}' ||"
    f" l_returnflag || '{_SEP}' || l_linestatus || '{_SEP}' ||"
    f" CAST(l_shipdate AS VARCHAR)"
)


def q_row_digest_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest-collision / duplicate-row audit: rows, distinct
    digests, rows sharing a digest — for documents and the lineitem
    key+dims projection (floats excluded from the canonical row by
    the module contract).

    Scale: one NDV partial agg per table over the map-side digest.
    """
    # _spread before the per-row digest (CPU-heavy map work above a
    # single-split scan locally; no-op at scale — guide §2.5)
    doc = (
        _q._spread(_t(spark, sf_dir, "documents"))
        .selectExpr(f"{_dig_spark(_doc_row_spark())} AS dig")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("dig").cast("long").alias("ndv_digest"),
        )
        .selectExpr(
            "'documents' AS tbl",
            "n_rows",
            "ndv_digest",
            "n_rows - ndv_digest AS dup_digest_rows",
        )
    )
    li = (
        _q._spread(_t(spark, sf_dir, "lineitem"))
        .selectExpr(f"{_dig_spark(_LI_ROW_SPARK)} AS dig")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("dig").cast("long").alias("ndv_digest"),
        )
        .selectExpr(
            "'lineitem' AS tbl",
            "n_rows",
            "ndv_digest",
            "n_rows - ndv_digest AS dup_digest_rows",
        )
    )
    return doc.unionAll(li)


ORACLE_ROW_DIGEST_DUPES = f"""
SELECT 'documents' AS tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {_dig_sql(_doc_row_sql())}) AS BIGINT)
         AS ndv_digest,
       CAST(count(*) - count(DISTINCT {_dig_sql(_doc_row_sql())})
            AS BIGINT) AS dup_digest_rows
FROM documents
UNION ALL
SELECT 'lineitem' AS tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {_dig_sql(_LI_ROW_SQL)}) AS BIGINT)
         AS ndv_digest,
       CAST(count(*) - count(DISTINCT {_dig_sql(_LI_ROW_SQL)}) AS BIGINT)
         AS dup_digest_rows
FROM lineitem
"""


# ---------------------------------------------------------------------------
# incremental_checksum_update
# ---------------------------------------------------------------------------

_V2_SPARK = "concat(coalesce(text, ''), '+v2')"
_V2_SQL = "coalesce(text, '') || '+v2'"


def q_incremental_checksum_update(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """O(Δ) maintenance identity: after mutating the doc_id %
    {_DELTA_MOD} == 0 slice, full recompute == old - Σdigest(oldΔ) +
    Σdigest(newΔ).  The additive combiner makes checksum upkeep
    proportional to the change set, not the table.

    Scale: three map-side digest aggs (full old, Δ old, Δ new) + one
    full recompute for the verification — production keeps only the
    Δ passes.
    """
    d = _t(spark, sf_dir, "documents")
    old_full = d.selectExpr(
        f"{_dig_spark(_doc_row_spark())} AS dig"
    ).agg(F.sum("dig").cast("long").alias("old_sum"))
    delta = d.where(f"doc_id % {_DELTA_MOD} = 0")
    d_old = delta.selectExpr(
        f"{_dig_spark(_doc_row_spark())} AS dig"
    ).agg(
        F.count("*").cast("long").alias("delta_rows"),
        F.sum("dig").cast("long").alias("delta_old_sum"),
    )
    d_new = delta.selectExpr(
        f"{_dig_spark(_doc_row_spark(_V2_SPARK))} AS dig"
    ).agg(F.sum("dig").cast("long").alias("delta_new_sum"))
    new_text = (
        f"CASE WHEN doc_id % {_DELTA_MOD} = 0 THEN {_V2_SPARK}"
        " ELSE coalesce(text, '') END"
    )
    new_full = d.selectExpr(
        f"{_dig_spark(_doc_row_spark(new_text))} AS dig"
    ).agg(F.sum("dig").cast("long").alias("recomputed_sum"))
    return (
        old_full.crossJoin(d_old)
        .crossJoin(d_new)
        .crossJoin(new_full)
        .selectExpr(
            "old_sum",
            "delta_rows",
            "delta_old_sum",
            "delta_new_sum",
            "recomputed_sum",
            "old_sum - delta_old_sum + delta_new_sum AS incremental_sum",
            "old_sum - delta_old_sum + delta_new_sum = recomputed_sum"
            " AS matches",
        )
    )


ORACLE_INCREMENTAL_CHECKSUM_UPDATE = f"""
WITH old_full AS (
  SELECT CAST(sum({_dig_sql(_doc_row_sql())}) AS BIGINT) AS old_sum
  FROM documents),
d_old AS (
  SELECT CAST(count(*) AS BIGINT) AS delta_rows,
         CAST(sum({_dig_sql(_doc_row_sql())}) AS BIGINT) AS delta_old_sum
  FROM documents WHERE doc_id % {_DELTA_MOD} = 0),
d_new AS (
  SELECT CAST(sum({_dig_sql(_doc_row_sql(_V2_SQL))}) AS BIGINT)
    AS delta_new_sum
  FROM documents WHERE doc_id % {_DELTA_MOD} = 0),
new_full AS (
  SELECT CAST(sum({_dig_sql(_doc_row_sql(
      f"CASE WHEN doc_id % {_DELTA_MOD} = 0 THEN " + _V2_SQL
      + " ELSE coalesce(text, '') END"))}) AS BIGINT) AS recomputed_sum
  FROM documents)
SELECT o.old_sum, a.delta_rows, a.delta_old_sum, b.delta_new_sum,
       n.recomputed_sum,
       o.old_sum - a.delta_old_sum + b.delta_new_sum AS incremental_sum,
       o.old_sum - a.delta_old_sum + b.delta_new_sum = n.recomputed_sum
         AS matches
FROM old_full o CROSS JOIN d_old a CROSS JOIN d_new b CROSS JOIN new_full n
"""


CHECKSUM_QUERIES = {
    "table_checksum_buckets": q_table_checksum_buckets,
    "replica_diff_checksums": q_replica_diff_checksums,
    "merkle_tree_levels": q_merkle_tree_levels,
    "row_digest_dupes": q_row_digest_dupes,
    "incremental_checksum_update": q_incremental_checksum_update,
}

CHECKSUM_ORACLES = {
    "table_checksum_buckets": ORACLE_TABLE_CHECKSUM_BUCKETS,
    "replica_diff_checksums": ORACLE_REPLICA_DIFF_CHECKSUMS,
    "merkle_tree_levels": ORACLE_MERKLE_TREE_LEVELS,
    "row_digest_dupes": ORACLE_ROW_DIGEST_DUPES,
    "incremental_checksum_update": ORACLE_INCREMENTAL_CHECKSUM_UPDATE,
}

_q.QUERIES.update(CHECKSUM_QUERIES)
_q.ORACLES.update(CHECKSUM_ORACLES)
