"""Runtime-filter evidence: Spark's injected bloom-filter semi-join
reduction — the optimizer-level lever that prunes fact-side rows
BEFORE the shuffle when a join's dim side carries a selective
predicate.  At 100 TB this is the difference between shuffling the
full fact table and shuffling the ~1% that can possibly match.

The thresholds are tuned down because the fixture is tiny; at real
scale the defaults (10 MB creation side / 10 GB application side)
admit exactly the dim-filtered join shapes the catalog uses.
"""

import contextlib
import io


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_filter_injected_on_selective_dim_join(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force the shuffled-join path: broadcast joins get their own
        # (stronger) dynamic pruning, which would mask the bloom filter
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = "/root/testdata/sf0.001"
        o = spark.read.parquet(f"{sf}/orders.parquet")
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        sel = o.where(o.o_orderstatus == "F").select("o_orderkey")
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).select(
            "l_orderkey", "l_quantity"
        )
        p = plan_of(joined)
        assert "bloom_filter" in p or "BloomFilter" in p or "might_contain" in p, p
        # and it still answers correctly
        n = joined.count()
        expected = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .where(o.o_orderstatus == "F")
            .count()
        )
        assert n == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_compaction_to_target_file_count(spark, tmp_path):
    """Small-file management: a fragmented write (many tiny tasks) is
    compacted to a bounded file count with `maxRecordsPerFile` +
    repartition — the maintenance pass that keeps a 100 TB table's
    file count (and thus its scan-planning time) sane."""
    sf = "/root/testdata/sf0.001"
    frag = str(tmp_path / "fragmented")
    compact = str(tmp_path / "compacted")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    o.repartition(64).write.mode("overwrite").parquet(frag)
    n_frag = len([f for f in __import__("os").listdir(frag) if f.endswith(".parquet")])
    assert n_frag >= 32  # genuinely fragmented

    (
        spark.read.parquet(frag)
        .repartition(2)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1000)
        .parquet(compact)
    )
    files = [f for f in __import__("os").listdir(compact) if f.endswith(".parquet")]
    # 1500 rows / 2 partitions, each split at 1000 records -> exactly 2 or 3
    assert 2 <= len(files) <= 4, files
    assert spark.read.parquet(compact).count() == o.count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Additive schema evolution: v2 files carry a new column; a
    mergeSchema read unions the schemas and null-backfills v1 rows —
    the contract that lets an extractor-version bump add lineage
    columns without rewriting history."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "evolving")
    d = spark.read.parquet(f"{sf}/documents.parquet")
    d.where(d.doc_id < 250).select("doc_id", "text").write.mode("overwrite").parquet(
        out
    )
    (
        d.where(d.doc_id >= 250)
        .select("doc_id", "text", F.lit(2).alias("extractor_version"))
        .write.mode("append")
        .parquet(out)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "extractor_version" in merged.columns
    assert merged.count() == d.count()
    v1 = merged.where(merged.doc_id < 250)
    assert v1.where(v1.extractor_version.isNull()).count() == v1.count()
    v2 = merged.where(merged.doc_id >= 250)
    assert v2.where(v2.extractor_version == 2).count() == v2.count()
