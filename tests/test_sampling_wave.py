"""Semantics tests for the wave-22 entries: weighted_sample_es
(Efraimidis–Spirakis weighted sampling) and weekday_seasonality
(day-of-week volume index).  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math

from occular_ocr_spark import queries as Q  # noqa: F401  (registration)
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_round4 import q_weekday_seasonality
from occular_ocr_spark.queries_training import _WES_K, q_weighted_sample_es

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_weighted_sample_matches_naive(spark):
    docs = {
        r["doc_id"]: max(r["n_chars"], 1)
        for r in _t(spark, SF, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    keyed = []
    for d, w in docs.items():
        h = int(hashlib.md5(f"{d}:es".encode()).hexdigest()[:4], 16)
        u = (h + 0.5) / 65536.0
        keyed.append((math.floor(math.log(u) / w * 1e12), -d, d, w))
    keyed.sort(reverse=True)
    want = [(d, w) for _, _, d, w in keyed[:_WES_K]]
    got = sorted(
        q_weighted_sample_es(spark, SF).collect(), key=lambda r: r["rank"]
    )
    assert len(got) == _WES_K
    assert [(r["doc_id"], r["w"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, _WES_K + 1))


def test_weighted_sample_prefers_heavy_docs(spark):
    all_w = [
        max(r["n_chars"], 1)
        for r in _t(spark, SF, "documents").select("n_chars").collect()
    ]
    sample_w = [r["w"] for r in q_weighted_sample_es(spark, SF).collect()]
    # weight-proportional sampling pushes the sample mean weight above
    # the population mean (strict on any non-degenerate fixture)
    assert sum(sample_w) / len(sample_w) > sum(all_w) / len(all_w)


def test_weighted_sample_plan_take_ordered(spark):
    p = _plan_of(q_weighted_sample_es(spark, SF))
    assert "TakeOrderedAndProject" in p  # never a global sort


def test_weekday_seasonality_matches_naive(spark):
    days = collections.Counter()
    for r in _t(spark, SF, "events").select("ts").collect():
        # python weekday(): 0=Mon..6=Sun; entry uses 0=Sun..6=Sat
        days[(r["ts"].weekday() + 1) % 7] += 1
    tot = sum(days.values())
    got = {r["weekday"]: r for r in q_weekday_seasonality(spark, SF).collect()}
    assert set(got) == set(days)
    for wd, n in days.items():
        assert got[wd]["n_events"] == n
        assert abs(got[wd]["volume_index"] - 7 * n / tot) <= 1e-6
    # indices average to ~1 over a full week
    if len(days) == 7:
        mean_idx = sum(r["volume_index"] for r in got.values()) / 7
        assert abs(mean_idx - 1.0) <= 1e-5
