"""Semantics tests for the wave-26 data-selection entries: DSIR
importance weights, shingle novelty, MAD daily anomalies, adjacent-turn
runs, and the shard skew report.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math

from pyspark.sql import functions as F

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_selection import (
    _SHARDS,
    q_adjacent_turn_runs,
    q_daily_anomaly_mad,
    q_dsir_weights,
    q_ngram_novelty,
    q_shard_skew_report,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "source")
        .collect()
    )


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


def test_dsir_weights_matches_naive(spark):
    rows = _docs(spark)
    tgt = min(r["source"] for r in rows)
    c_raw, c_tgt = collections.Counter(), collections.Counter()
    for r in rows:
        toks = r["text"].split(" ")
        c_raw.update(toks)
        if r["source"] == tgt:
            c_tgt.update(toks)
    n_raw, n_tgt, v = sum(c_raw.values()), sum(c_tgt.values()), len(c_raw)
    got = {r["doc_id"]: r for r in q_dsir_weights(spark, SF).collect()}
    assert set(got) == {r["doc_id"] for r in rows}
    for r in rows:
        toks = r["text"].split(" ")
        want = round(
            sum(
                math.log(c_tgt[t] + 1)
                - math.log(n_tgt + v)
                - math.log(c_raw[t] + 1)
                + math.log(n_raw + v)
                for t in toks
            ),
            6,
        )
        assert got[r["doc_id"]]["n_tokens"] == len(toks)
        assert abs(got[r["doc_id"]]["log_weight"] - want) <= 1e-5


def test_dsir_weights_target_docs_score_higher_on_average(spark):
    rows = _docs(spark)
    tgt = min(r["source"] for r in rows)
    srcs = {r["doc_id"]: r["source"] for r in rows}
    ws = [(srcs[r["doc_id"]] == tgt, r["log_weight"] / max(r["n_tokens"], 1))
          for r in q_dsir_weights(spark, SF).collect()]
    in_t = [w for is_t, w in ws if is_t]
    out_t = [w for is_t, w in ws if not is_t]
    assert in_t and out_t
    # the target's own documents must look more target-like on average
    assert sum(in_t) / len(in_t) > sum(out_t) / len(out_t)


def test_dsir_weights_plan_broadcast_scoring(spark):
    p = _plan_of(q_dsir_weights(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # vocab + totals broadcast back


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def _shingle_set(text):
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    }


def test_ngram_novelty_matches_naive(spark):
    rows = sorted(_docs(spark), key=lambda r: r["doc_id"])
    first = {}
    per_doc = {}
    for r in rows:
        shs = _shingle_set(r["text"])
        if not shs:
            continue
        per_doc[r["doc_id"]] = shs
        for sh in shs:
            first.setdefault(sh, r["doc_id"])
    got = {r["doc_id"]: r for r in q_ngram_novelty(spark, SF).collect()}
    assert set(got) == set(per_doc)
    for doc, shs in per_doc.items():
        novel = sum(1 for sh in shs if first[sh] == doc)
        assert got[doc]["n_shingles"] == len(shs)
        assert got[doc]["n_novel"] == novel
        assert abs(got[doc]["novelty"] - round(novel / len(shs), 6)) <= 5e-7


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    rows = q_ngram_novelty(spark, SF).collect()
    lowest = min(r["doc_id"] for r in rows)
    row = next(r for r in rows if r["doc_id"] == lowest)
    assert row["novelty"] == 1.0  # nothing precedes the smallest doc_id


def test_ngram_novelty_plan_partial_agg(spark):
    p = _plan_of(q_ngram_novelty(spark, SF))
    assert "partial" in p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# daily_anomaly_mad
# ---------------------------------------------------------------------------


def _median(xs):
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2


def test_daily_anomaly_mad_matches_naive(spark):
    daily = collections.Counter()
    for r in Q._t(spark, SF, "events").select(F.to_date("ts").alias("d")).collect():
        daily[r["d"]] += 1
    med = _median(daily.values())
    mad = _median([abs(n - med) for n in daily.values()])
    got = {r["day"]: r for r in q_daily_anomaly_mad(spark, SF).collect()}
    assert set(got) == set(daily)
    for day, n in daily.items():
        r = got[day]
        assert r["n_events"] == n
        assert r["dev2"] == abs(2 * n - int(2 * med))
        assert r["is_anomaly"] == (abs(n - med) > 3 * mad)


def test_daily_anomaly_mad_flag_is_integer_exact(spark):
    # the flag must be computable from dev2 alone given the integer
    # mad4 — no float appears in the output schema
    df = q_daily_anomaly_mad(spark, SF)
    types = dict(df.dtypes)
    assert types["dev2"] == "bigint"
    assert types["is_anomaly"] == "boolean"


def test_daily_anomaly_mad_plan_no_cartesian_beyond_stat_rows(spark):
    # the two stats are 1-row broadcasts; no join keys anywhere else
    p = _plan_of(q_daily_anomaly_mad(spark, SF))
    assert "SortMergeJoin" not in p


# ---------------------------------------------------------------------------
# adjacent_turn_runs
# ---------------------------------------------------------------------------


def test_adjacent_turn_runs_matches_naive(spark):
    per_conv = collections.defaultdict(list)
    for r in _docs(spark):
        per_conv[r["doc_id"] // 10].append(
            (r["doc_id"] % 10, hashlib.md5((r["text"] or "").encode()).hexdigest())
        )
    got = {r["conv"]: r for r in q_adjacent_turn_runs(spark, SF).collect()}
    assert set(got) == set(per_conv)
    for conv, turns in per_conv.items():
        turns.sort()
        runs, cur = [], 1
        for i in range(1, len(turns)):
            # consecutive turn indices with identical fingerprints
            if turns[i][1] == turns[i - 1][1] and turns[i][0] == turns[i - 1][0] + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        r = got[conv]
        assert r["n_turns"] == len(turns)
        assert r["max_run"] == max(runs)
        assert r["n_runs_ge2"] == sum(1 for m in runs if m >= 2)
        assert r["n_adjacent_dups"] == sum(m - 1 for m in runs)


def test_adjacent_turn_runs_windows_are_conv_partitioned(spark):
    p = _plan_of(q_adjacent_turn_runs(spark, SF))
    assert "CartesianProduct" not in p
    for line in p.splitlines():
        if "Window" in line and "partition" in line.lower():
            assert "PartitionSpec: []" not in line


# ---------------------------------------------------------------------------
# shard_skew_report
# ---------------------------------------------------------------------------


def _h16(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)


def test_shard_skew_matches_naive(spark):
    per = collections.defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        s = _h16(r["doc_id"]) % _SHARDS
        per[s][0] += 1
        per[s][1] += len(r["text"].split(" "))
    total = sum(v[1] for v in per.values())
    got = {r["shard"]: r for r in q_shard_skew_report(spark, SF).collect()}
    assert set(got) == set(per)
    for s, (nd, nt) in per.items():
        r = got[s]
        assert r["n_docs"] == nd
        assert r["n_tokens"] == nt
        assert abs(r["token_skew"] - round((nt * _SHARDS - total) / total, 6)) <= 5e-7


def test_shard_skew_hash_layout_is_balanced(spark):
    # portable-hash sharding should be near-uniform on the fixture
    rows = q_shard_skew_report(spark, SF).collect()
    assert len(rows) <= _SHARDS
    assert all(abs(r["token_skew"]) < 1.0 for r in rows)


def test_shard_skew_plan_single_partial_agg(spark):
    p = _plan_of(q_shard_skew_report(spark, SF))
    assert "partial" in p
    assert "SortMergeJoin" not in p
