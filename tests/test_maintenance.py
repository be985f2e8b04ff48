"""Wave-7 maintenance catalog semantics tests (C4 line dedup,
compaction bin-packing, shard interleave).  Gate-level value-hash
equality vs DuckDB is covered by scripts/check_queries.py; these pin
the algorithmic invariants independently, plus the plan shapes that
make each op viable at manifest/corpus scale."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_maintenance import (
    _CP_TARGET_BYTES,
    _LD_K,
    _LD_MAX_FREQ,
    q_compaction_plan,
    q_line_dedup,
    q_shard_interleave,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def test_line_dedup_keeps_every_doc_and_counts(spark):
    docs = {r["doc_id"]: r["text"] for r in _t(spark, SF, "documents").collect()}
    out = {r["doc_id"]: r for r in q_line_dedup(spark, SF).collect()}
    assert set(out) == set(docs)  # C4 keeps gutted docs (empty text)
    for doc_id, r in out.items():
        n_words = len(docs[doc_id].split(" "))
        assert r["n_total"] == math.ceil(n_words / _LD_K)
        assert 0 <= r["n_removed"] <= r["n_total"]


def test_line_dedup_removes_something_and_untouched_docs_roundtrip(spark):
    rows = q_line_dedup(spark, SF).collect()
    assert sum(r["n_removed"] for r in rows) > 0  # threshold is live
    docs = {r["doc_id"]: r["text"] for r in _t(spark, SF, "documents").collect()}
    untouched = [r for r in rows if r["n_removed"] == 0]
    assert untouched  # and most docs survive intact
    for r in untouched[:20]:
        # chunk-join of space-joined word windows reconstructs the text
        assert r["clean_text"] == docs[r["doc_id"]]


def test_line_dedup_hot_chunks_gone_from_output(spark):
    # recompute the blocklist independently and assert no kept text
    # contains a hot chunk at a chunk boundary
    d = _t(spark, SF, "documents")
    arr = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(arr) / _LD_K).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(F.slice(arr, i * _LD_K + 1, _LD_K), " "),
    )
    base = d.select(F.explode(chunks).alias("chunk"))
    hot = {
        r["chunk"]
        for r in base.groupBy("chunk")
        .count()
        .where(F.col("count") > _LD_MAX_FREQ)
        .collect()
    }
    assert hot
    out = q_line_dedup(spark, SF)
    for r in out.collect():
        kept_chunks = set()
        words = r["clean_text"].split(" ") if r["clean_text"] else []
        for i in range(0, len(words), _LD_K):
            kept_chunks.add(" ".join(words[i : i + _LD_K]))
        # NOTE: after removal the chunk grid shifts, so only fully
        # intact docs give an exact grid; for them no hot chunk remains
        if r["n_removed"] == 0:
            assert not (kept_chunks & hot)


def test_line_dedup_plan_partial_agg_no_cartesian(spark):
    from tests.test_plans import n_nodes, plan_of

    p = plan_of(q_line_dedup(spark, SF))
    assert n_nodes(p, "CartesianProduct") == 0
    # frequency pass is a partial agg (map-side combine before the
    # exchange): HashAggregate pairs, plus an ObjectHashAggregate pair
    # for the collect_list reassembly
    assert n_nodes(p, "HashAggregate") >= 2
    assert "Generate" in p  # posexplode, not a python UDF


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------


def test_compaction_plan_bins_sequential_greedy(spark):
    rows = q_compaction_plan(spark, SF).collect()
    assert rows
    by_part: dict = {}
    for r in rows:
        by_part.setdefault(r["part_day"], []).append(r)
    multi = 0
    for part, files in by_part.items():
        files.sort(key=lambda r: r["file_key"])
        cum = 0
        for r in files:
            assert r["bin_id"] == cum // _CP_TARGET_BYTES
            assert r["bytes"] > 0 and r["n_rows"] > 0
            cum += r["bytes"]
        if files[-1]["bin_id"] > 0:
            multi += 1
    assert multi > 0  # the target is live: some partitions need >1 bin


def test_compaction_plan_is_manifest_sized(spark):
    # one row per (day, event_type) file — not per event
    e = _t(spark, SF, "events")
    n_files = e.select(F.to_date("ts"), "event_type").distinct().count()
    assert q_compaction_plan(spark, SF).count() == n_files


def test_compaction_plan_no_global_sort(spark):
    from tests.test_plans import plan_of

    p = plan_of(q_compaction_plan(spark, SF))
    # window sort is within hash-partitioned part_day groups
    assert "hashpartitioning(part_day" in p
    assert "rangepartitioning" not in p  # a global sort would show this


# ---------------------------------------------------------------------------
# shard_interleave
# ---------------------------------------------------------------------------


def test_shard_interleave_positions_are_a_bijection(spark):
    rows = q_shard_interleave(spark, SF).collect()
    pos = [r["train_pos"] for r in rows]
    assert len(pos) == len(set(pos)) == _t(spark, SF, "documents").count()


def test_shard_interleave_round_robins_sources(spark):
    rows = sorted(q_shard_interleave(spark, SF).collect(), key=lambda r: r["train_pos"])
    n_sources = len({r["source"] for r in rows})
    # within any full window of n_sources consecutive positions, no
    # source repeats while every source still has documents left
    first = rows[: n_sources]
    assert len({r["source"] for r in first}) == n_sources
    # per-source stride is exactly n_sources
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["train_pos"])
    for src, ps in by_src.items():
        ps.sort()
        assert all(b - a == n_sources for a, b in zip(ps, ps[1:]))


def test_shard_interleave_no_global_sort(spark):
    from tests.test_plans import n_nodes, plan_of

    p = plan_of(q_shard_interleave(spark, SF))
    # level-2 window partitioned by (source, bucket) — still source-keyed
    assert "hashpartitioning(source" in p
    assert "rangepartitioning" not in p
    # corpus scalars (n_sources, and since r6 the max-doc_id bucket
    # width feeding the two-level rank) ride 1-row broadcast
    # nested-loop joins — never a shuffle
    assert n_nodes(p, "BroadcastNestedLoopJoin") >= 1
    assert "SortMergeJoin" not in p
