"""Bucketed-table co-located joins: pre-bucketing both sides of a
recurring join key eliminates the join's exchanges entirely — the
100 TB pattern for fact tables joined repeatedly on the same key
(extraction output keyed by conv_id joined to per-conversation
metadata, orders to customers, ...).  The shuffle is paid ONCE at
write time and amortized across every subsequent join."""

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # bucketed tables need a managed-table warehouse
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_b")
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_b")
    )
    ob = spark.table("orders_b")
    cb = spark.table("customer_b")
    joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: both sides scan their buckets directly — zero
    # Exchange nodes anywhere in the join plan (broadcast disabled
    # above so the test exercises the bucketed shuffle elision, not a
    # small-table broadcast)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # and the result is still correct
    n_inner = joined.count()
    expected = o.join(c, o.o_custkey == c.c_custkey).count()
    assert n_inner == expected
