"""Unit tests for the round-4 driver-side caches and scoped-conf
guards — tiny machinery whose failure modes are silent (stale handles,
leaked conf), so each is pinned explicitly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def test_table_cache_returns_same_handle_and_separates_sf_dirs(spark):
    from occular_ocr_spark import queries as q

    a1 = q._t(spark, SF, "documents")
    a2 = q._t(spark, SF, "documents")
    assert a1 is a2  # memoized handle, no footer re-read
    b = q._t(spark, SF2, "documents")
    assert b is not a1  # keyed by sf_dir — no cross-SF collision
    # and the handles read the right data
    assert a1.count() == 500
    assert a1.select("doc_id").distinct().count() == 500


def test_table_cache_rebuilds_for_a_different_session_object(spark):
    from occular_ocr_spark import queries as q

    df = q._t(spark, SF, "region")
    key = (SF, "region")
    sess, cached = q._TABLE_CACHE[key]
    assert sess is spark and cached is df
    # simulate a stale entry owned by a dead session: any non-identical
    # owner forces a rebuild instead of reusing a foreign-JVM handle
    q._TABLE_CACHE[key] = (object(), df)
    fresh = q._t(spark, SF, "region")
    assert q._TABLE_CACHE[key][0] is spark
    assert fresh.count() == df.count()


def test_expr_cache_reuses_column_within_context(spark):
    from occular_ocr_spark.job import _EXPR_CACHE, _plain_blocks_expr, _plain_safe_predicate

    c1 = _plain_blocks_expr()
    c2 = _plain_blocks_expr()
    assert c1 is c2
    p1 = _plain_safe_predicate()
    assert _plain_safe_predicate() is p1
    # the cache is keyed by the live SparkContext: poisoning the owner
    # forces a rebuild (the restart-safety path)
    ent = _EXPR_CACHE["plain_blocks_expr"]
    _EXPR_CACHE["plain_blocks_expr"] = (object(), ent[1])
    c3 = _plain_blocks_expr()
    assert c3 is not c1
    _EXPR_CACHE["plain_blocks_expr"] = ent  # restore for other tests


def test_stream_state_width_sets_and_restores_conf(spark):
    from occular_ocr_spark.queries_ext import (
        _STREAM_STATE_PARTITIONS,
        _stream_state_width,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    assert before != str(_STREAM_STATE_PARTITIONS)  # the guard must matter
    with _stream_state_width(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            _STREAM_STATE_PARTITIONS
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_state_width_restores_on_exception(spark):
    from occular_ocr_spark.queries_ext import _stream_state_width

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with _stream_state_width(spark):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_extract_entry_uses_aqe_managed_exchange_not_pinned(spark):
    """The flagship entry must keep the column-only salted exchange
    (repartition_salted num_partitions=0) — a pinned width would both
    regress the bench and be wrong on a sized cluster."""
    from occular_ocr_spark.queries import QUERIES

    df = QUERIES["extract_transcripts"](spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan
    # no explicit numPartitions rides the repartition node
    assert "RepartitionByExpression [conv_id" in plan
