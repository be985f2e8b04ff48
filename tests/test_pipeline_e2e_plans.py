"""Physical-plan assertions for the composed pipeline's stage
transforms (round 5): the 100 TB-critical properties — the eval
shingle set broadcasts into the decontamination probe (never a
corpus-side shuffle of unmatched shingles), the exact-dedup keep set
joins without a global sort, the packing prefix sum never runs an
unpartitioned window over doc rows, and the robust-scale _dist
compressed table aggregates with map-side partials."""

import contextlib
import io
import re

from pyspark.sql import functions as F

from occular_ocr_spark import pipeline_e2e as P
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_robustscale_dist import _compressed
from occular_ocr_spark.queries import release_persists

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.MULTILINE))


def _docs(spark):
    return _t(spark, SF_DIR, "documents").select("doc_id", "text")


def test_decontaminate_bench_side_broadcasts(spark):
    docs = _docs(spark)
    bench = (
        P._shingles_of(docs.where(F.col("doc_id") < 10)).select("sh").distinct()
    )
    probe = P._shingles_of(docs).join(F.broadcast(bench), "sh")
    p = plan_of(probe)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # corpus shingles never shuffle for the probe


def test_exact_dedup_no_global_sort(spark):
    d = _docs(spark)
    keep = d.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    out = d.join(keep.select("doc_id"), "doc_id")
    p = plan_of(out)
    # hash-shuffle join is fine; a global Sort over doc rows is not
    assert n_nodes(p, "HashAggregate") >= 2  # partial + final min per digest
    assert "rangepartitioning" not in p


def test_pack_prefix_windows_are_partitioned(spark):
    """The two-level prefix sum: the per-doc window partitions by
    (split, blk) and the block window by split — NO window runs with an
    empty partition spec over row-scaled data."""
    from pyspark.sql import Window

    d = (
        _docs(spark)
        .withColumn("split", F.lit("train"))
        .withColumn("n_tok", F.size(F.split("text", " ")).cast("bigint"))
        .withColumn("blk", F.floor(F.col("doc_id") / 64).cast("bigint"))
    )
    wd = (
        Window.partitionBy("split", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = plan_of(d.withColumn("in_blk", F.coalesce(F.sum("n_tok").over(wd), F.lit(0))))
    assert "partitionBy" not in p  # formatted plans spell specs differently
    assert re.search(r"Window.*split.*blk", p, re.DOTALL)
    # the win spec must name partition columns (an empty spec renders
    # as 'Window [..], [..ASC..]' with no partition list)
    assert "windowspartitionby" not in p.lower()


def test_dist_compressed_table_partial_agg(spark):
    p = plan_of(_compressed(spark, SF_DIR))
    release_persists()
    # groupBy(lang, x) count: map-side partial + final
    assert n_nodes(p, "HashAggregate") == 2
    assert "partial_count" in p


def test_stage_digest_is_mapside(spark):
    """The manifest digest aggregate collapses to one row via partial
    aggregation — no shuffle of row data to the driver."""
    d = _docs(spark)
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(P._digest_col(["doc_id", "text"])), F.lit(0)).alias("dig"),
    )
    p = plan_of(agg)
    assert n_nodes(p, "HashAggregate") == 2
    assert "partial_count" in p and "partial_sum" in p
    assert "SinglePartition" in p  # the exchange moves 1 partial row, not row data
